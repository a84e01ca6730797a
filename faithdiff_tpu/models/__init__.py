from .adapters import (ConditionEmbedding, InformationTransformer,
                       ResidualAttentionBlock)
from .bsrnet import RRDBNet, deg_remove
from .clip_text import CLIPTextTower, SDXLTextEncoder
from .unet import UNet2DConditionModel
from .vae import (AutoencoderKL, Decoder, DenoiseEncoder, Encoder,
                  sample_from_moments, tiled_apply)

__all__ = [
    "ConditionEmbedding", "InformationTransformer", "ResidualAttentionBlock",
    "RRDBNet", "deg_remove", "CLIPTextTower", "SDXLTextEncoder",
    "UNet2DConditionModel", "AutoencoderKL", "Decoder", "DenoiseEncoder",
    "Encoder", "sample_from_moments", "tiled_apply",
]
