from maskcyclegan_vc_tpu.models.discriminator import Discriminator
from maskcyclegan_vc_tpu.models.generator import Generator

__all__ = ["Generator", "Discriminator"]
