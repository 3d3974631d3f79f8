from swapnet_tpu.losses.gan import GANLossConfig, gan_loss, gradient_penalty
from swapnet_tpu.losses.perceptual import PerceptualLossConfig, perceptual_loss

__all__ = [
    "GANLossConfig",
    "gan_loss",
    "gradient_penalty",
    "PerceptualLossConfig",
    "perceptual_loss",
]
