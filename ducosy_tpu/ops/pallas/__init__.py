from ducosy_tpu.ops.pallas.instance_norm import (  # noqa: F401
    instance_norm_pallas,
    pallas_available,
)
