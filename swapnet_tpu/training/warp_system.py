"""WarpSystem — stage-1 training system (reference models/warp_model.py).

Two modes (reference --warp_mode):
  * "gan": CE(fakes, argmax(targets)) * lambda_ce  +  adversarial loss,
           with a discriminator conditioned on the body segmentation
           (cat(bodys, cloth), reference warp_model.py:109-139).
  * "ce":  cross entropy only — no discriminator at all
           (reference warp_model.py:68-76).  This is the minimum
           end-to-end training slice.

Batch dict (names match the reference dataset contract):
  bodys         (B, H, W, body_ch)   normalized RGB body seg
  input_cloths  (B, H, W, cloth_ch)  augmented one-hot cloth seg
  target_cloths (B, H, W, cloth_ch)  one-hot target
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from swapnet_tpu.losses import GANLossConfig
from swapnet_tpu.losses.extra import softmax_cross_entropy_bounded_onehot
from swapnet_tpu.models.discriminators import define_D
from swapnet_tpu.models.warp import WarpModule
from swapnet_tpu.training.base_gan_system import BaseGANSystem
from swapnet_tpu.training.optimizers import OptimizerConfig


class WarpSystem(BaseGANSystem):
    def __init__(
        self,
        body_channels: int = 3,
        cloth_channels: int = 19,
        warp_mode: str = "gan",
        lambda_ce: float = 100.0,
        discriminator: str = "basic",
        n_layers_D: int = 3,
        quantize_D: bool = False,
        norm: str = "instance",
        init_type: str = "kaiming",
        init_gain: float = 0.02,
        dtype: Any = jnp.float32,
        gan_cfg: GANLossConfig = GANLossConfig(),
        g_opt: OptimizerConfig = OptimizerConfig(lr=1e-4),
        d_opt: OptimizerConfig = OptimizerConfig(lr=4e-4, weight_decay=0.01),
        lambda_gan: float = 1.0,
        lambda_discriminator: float = 1.0,
        lambda_gp: float = 10.0,
        wgan_clamp: bool = True,
        # space-to-depth head (layers._HeadS2D); default per the
        # interleaved A/B warp_head_s2d_ab.json (+16% both modes)
        head_impl: str = "s2d",
    ):
        generator = WarpModule(
            body_channels=body_channels,
            cloth_channels=cloth_channels,
            init_type=init_type,
            init_gain=init_gain,
            dtype=dtype,
            head_impl=head_impl,
        )
        D = None
        if warp_mode == "gan":
            # conditional D: cloth + body channels (warp_model.py:92-97)
            D = define_D(
                discriminator, 64, n_layers_D, norm, init_type, init_gain,
                dtype, quantize=quantize_D,
            )
        super().__init__(
            generator, D, gan_cfg, g_opt, d_opt,
            lambda_gan, lambda_discriminator, lambda_gp, wgan_clamp,
        )
        self.warp_mode = warp_mode
        self.lambda_ce = lambda_ce

    # ---- hooks -----------------------------------------------------------

    def init_generator(self, rngs, batch):
        return dict(
            self.G.init(rngs, batch["bodys"], batch["input_cloths"], True)
        )

    def generator_forward(self, g_params, g_extra, batch, rng, train):
        variables = {"params": g_params, **(g_extra or {})}
        fakes = self.G.apply(
            variables, batch["bodys"], batch["input_cloths"], train,
            rngs={"dropout": rng},
        )
        return fakes, g_extra or {}

    def d_condition(self, batch, img):
        return jnp.concatenate([batch["bodys"].astype(img.dtype), img], axis=-1)

    def targets(self, batch):
        return batch["target_cloths"]

    def extra_g_losses(self, fakes, batch, rng, frozen=None) -> Dict[str, jax.Array]:
        # torch CrossEntropyLoss over the channel dim vs argmax targets
        # (warp_model.py:146-149); fakes are post-tanh, treated as logits —
        # bounded, so the dot-form CE (no max-subtraction, no argmax, no
        # lane-dim reduces) is exact.  See losses/extra.py for the TPU
        # layout rationale.
        ce = softmax_cross_entropy_bounded_onehot(
            fakes, batch["target_cloths"]
        )
        return {"loss_G_ce": ce * self.lambda_ce}
