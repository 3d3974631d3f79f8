from swapnet_tpu.training.state import GANTrainState
from swapnet_tpu.training.warp_system import WarpSystem
from swapnet_tpu.training.texture_system import TextureSystem

__all__ = ["GANTrainState", "WarpSystem", "TextureSystem"]
