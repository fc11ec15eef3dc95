"""glim_tpu — TPU-native LiDAR(-IMU) SLAM framework.

A from-scratch re-design of the capabilities of koide3/glim (reference:
/root/reference) for TPU hardware: JAX/XLA compute, Pallas kernels for hot ops,
batched Gauss-Newton in place of incremental sparse factorization, and a
host-thread pipeline (preprocess -> odometry -> sub-mapping -> global mapping)
mirroring the reference's architecture contract (module APIs, config schema,
callback slots, dump format).
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry code cannot tolerate bf16 matmul inputs (TPU default): kNN
# distance expansions and SE(3) chains lose ~3 decimal digits. "highest"
# keeps f32 effective precision on the MXU; the FLOP headroom vs this
# workload is enormous, accuracy is not negotiable.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: TPU (re)compiles are expensive — especially
# through remote-compile tunnels — and this workload reuses a small set of
# static shapes, so cache hits are the common case.
import os as _os

_platform_tag = _os.environ.get("JAX_PLATFORMS", "default").split(",")[0] or "default"
# CPU (test) runs skip the on-disk cache: in environments with a remote
# compile service the cached CPU AOT results may target the service's
# machine features, not the local host.
if _platform_tag != "cpu":
    _cache_dir = _os.environ.get("GLIM_TPU_COMPILE_CACHE",
                                 _os.path.expanduser(f"~/.cache/glim_tpu_xla_{_platform_tag}"))
    if _cache_dir:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from glim_tpu.utils.config import Config, GlobalConfig  # noqa: F401
from glim_tpu.utils.callbacks import CallbackSlot  # noqa: F401
