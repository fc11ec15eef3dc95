from glim_tpu.preprocess.cloud_preprocessor import CloudPreprocessor  # noqa: F401
from glim_tpu.preprocess.callbacks import PreprocessCallbacks  # noqa: F401
