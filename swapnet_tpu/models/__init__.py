from swapnet_tpu.models.discriminators import (
    NLayerDiscriminator,
    PixelDiscriminator,
    define_D,
)
from swapnet_tpu.models.texture import TextureModule
from swapnet_tpu.models.unet import UnetGenerator, define_G
from swapnet_tpu.models.vgg import VGG16Features, load_torch_vgg16_features
from swapnet_tpu.models.warp import WarpModule

__all__ = [
    "WarpModule",
    "TextureModule",
    "UnetGenerator",
    "define_G",
    "define_D",
    "NLayerDiscriminator",
    "PixelDiscriminator",
    "VGG16Features",
    "load_torch_vgg16_features",
]
