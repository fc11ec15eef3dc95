from glim_tpu.odometry.callbacks import OdometryEstimationCallbacks, InsertionCallbacks  # noqa: F401
from glim_tpu.odometry.estimation_base import OdometryEstimationBase  # noqa: F401
