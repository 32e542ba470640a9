from ducosy_tpu.eval import metrics  # noqa: F401
