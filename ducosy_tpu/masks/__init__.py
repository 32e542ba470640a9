from ducosy_tpu.masks.anatomy import generate_anatomical_masks  # noqa: F401
