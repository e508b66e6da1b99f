from .unet import UNet
from .aux_path import AuxPath, memory_update
from .pacing import PacingPseudoModel
