"""Model zoo: 2D/3D U-Net segmentation and pix2pix-style GAN enhancement."""

from sequitr_tpu.models import unet  # noqa: F401
from sequitr_tpu.models import gan  # noqa: F401
from sequitr_tpu.models import convert  # noqa: F401
from sequitr_tpu.models import zoo  # noqa: F401
from sequitr_tpu.models.unet import UNetConfig  # noqa: F401
from sequitr_tpu.models.gan import GANConfig  # noqa: F401
