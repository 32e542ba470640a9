from ducosy_tpu.infer.engine import DualGeneratorEngine  # noqa: F401
from ducosy_tpu.infer.postprocess import postprocess_ct_volume  # noqa: F401
from ducosy_tpu.infer.synthesis import composite_slice  # noqa: F401
