from glim_tpu.mapping.callbacks import SubMappingCallbacks, GlobalMappingCallbacks  # noqa: F401
from glim_tpu.mapping.sub_mapping_base import SubMappingBase  # noqa: F401
from glim_tpu.mapping.global_mapping_base import GlobalMappingBase  # noqa: F401
