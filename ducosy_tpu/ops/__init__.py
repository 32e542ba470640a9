from ducosy_tpu.ops import filters, hu, resize  # noqa: F401
