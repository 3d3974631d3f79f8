"""Pix2PixSystem — the reference's experimental debug model
(reference models/pix2pix_model.py): cloth seg + 36 zero channels ->
unet_128 -> texture, with GAN + L1 (lambda 100) and a conditional D on
cat(input, image).  Registered as --model pix2pix.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from swapnet_tpu.losses import GANLossConfig
from swapnet_tpu.models.discriminators import define_D
from swapnet_tpu.models.unet import UnetGenerator
from swapnet_tpu.training.base_gan_system import BaseGANSystem
from swapnet_tpu.training.optimizers import OptimizerConfig


class Pix2PixSystem(BaseGANSystem):
    def __init__(
        self,
        texture_channels: int = 3,
        cloth_channels: int = 19,
        lambda_l1: float = 100.0,
        norm: str = "instance",
        discriminator: str = "basic",
        n_layers_D: int = 3,
        init_type: str = "kaiming",
        init_gain: float = 0.02,
        dtype: Any = jnp.float32,
        gan_cfg: GANLossConfig = GANLossConfig(gan_mode="vanilla"),
        g_opt: OptimizerConfig = OptimizerConfig(lr=1e-4),
        d_opt: OptimizerConfig = OptimizerConfig(lr=4e-4, weight_decay=0.01),
        is_train: bool = True,
    ):
        generator = UnetGenerator(
            output_nc=texture_channels, num_downs=7, norm_type=norm,
            use_dropout=True, init_type=init_type, init_gain=init_gain, dtype=dtype,
        )
        D = None
        if is_train:
            D = define_D(discriminator, 64, n_layers_D, norm, init_type, init_gain, dtype)
        super().__init__(generator, D, gan_cfg, g_opt, d_opt, lambda_gan=1.0)
        self.lambda_l1 = lambda_l1
        self.cloth_channels = cloth_channels

    def _real_a(self, batch):
        cloths = batch["cloths"]
        zeros = jnp.zeros(cloths.shape[:3] + (36,), cloths.dtype)
        # reference concatenates (zeros, cloths) on channels
        return jnp.concatenate([zeros, cloths], axis=-1)

    def init_generator(self, rngs, batch):
        return dict(self.G.init(rngs, self._real_a(batch), True))

    def generator_forward(self, g_params, g_extra, batch, rng, train):
        variables = {"params": g_params, **(g_extra or {})}
        mutable = list(g_extra.keys()) if g_extra else []
        if mutable:
            fakes, new_extra = self.G.apply(
                variables, self._real_a(batch), train,
                rngs={"dropout": rng}, mutable=mutable,
            )
            return fakes, dict(new_extra)
        fakes = self.G.apply(variables, self._real_a(batch), train, rngs={"dropout": rng})
        return fakes, {}

    def d_condition(self, batch, img):
        return jnp.concatenate([self._real_a(batch).astype(img.dtype), img], axis=-1)

    def targets(self, batch):
        return batch["target_textures"]

    def extra_g_losses(self, fakes, batch, rng, frozen=None) -> Dict[str, jax.Array]:
        l1 = jnp.mean(
            jnp.abs(fakes.astype(jnp.float32) - batch["target_textures"].astype(jnp.float32))
        )
        return {"loss_G_l1": l1 * self.lambda_l1}
