from .unet import LatentUNet
from .blocks import SinusoidalTimeEmbedding
