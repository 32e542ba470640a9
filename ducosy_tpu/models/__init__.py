from ducosy_tpu.models.discriminator import Discriminator  # noqa: F401
from ducosy_tpu.models.generator import Generator  # noqa: F401
