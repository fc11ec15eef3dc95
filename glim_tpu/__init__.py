"""glim_tpu — TPU-native LiDAR(-IMU) SLAM framework.

A from-scratch re-design of the capabilities of koide3/glim (reference:
/root/reference) for TPU hardware: JAX/XLA compute, Pallas kernels for hot ops,
batched Gauss-Newton in place of incremental sparse factorization, and a
host-thread pipeline (preprocess -> odometry -> sub-mapping -> global mapping)
mirroring the reference's architecture contract (module APIs, config schema,
callback slots, dump format).
"""

__version__ = "0.1.0"

from glim_tpu.utils.config import Config, GlobalConfig  # noqa: F401
from glim_tpu.utils.callbacks import CallbackSlot  # noqa: F401
