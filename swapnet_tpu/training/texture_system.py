"""TextureSystem — stage-2 training system (reference models/texture_model.py).

Generator: TextureModule (ROI pooling + pix2pix U-Net) or plain unet_128.
Discriminator conditioned on the cloth segmentation: cat(cloths, fakes)
(reference texture_model.py:127-155).

G loss = GAN + L1 * lambda_l1 + VGG content * lambda_content
       + style * lambda_style  (reference texture_model.py:157-180).

Divergence note: the reference computes the texture-stage gradient penalty
on *unconditioned* (targets, fakes) (texture_model.py:148-153), which would
crash its own conditional D on a channel mismatch — i.e. texture+GP is
unusable upstream.  Here GP uses the conditioned pairs, consistent with
the warp stage.

Batch dict (names match the reference dataset contract):
  input_textures (B, H, W, 3)   normalized input RGB (randomly flipped)
  rois           (B, 12, 4)     [x1, y1, x2, y2] per body part
  cloths         (B, H, W, 19)  one-hot cloth seg
  target_textures(B, H, W, 3)   normalized target RGB
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from swapnet_tpu.losses import (
    GANLossConfig,
    PerceptualLossConfig,
    perceptual_loss,
)
from swapnet_tpu.models.discriminators import define_D
from swapnet_tpu.models.texture import TextureModule
from swapnet_tpu.models.unet import UnetGenerator
from swapnet_tpu.models.vgg import VGG16Features
from swapnet_tpu.training.base_gan_system import BaseGANSystem
from swapnet_tpu.training.optimizers import OptimizerConfig


class TextureSystem(BaseGANSystem):
    def __init__(
        self,
        texture_channels: int = 3,
        cloth_channels: int = 19,
        num_roi: int = 12,
        img_size: int = 128,
        netG: str = "swapnet",  # swapnet | unet_128
        norm: str = "instance",
        lambda_l1: float = 10.0,
        lambda_content: float = 20.0,
        lambda_style: float = 1e-8,
        vgg_variables=None,  # ported VGG16 weights; random-init if None
        discriminator: str = "basic",
        n_layers_D: int = 3,
        quantize_D: bool = False,
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
        is_train: bool = True,
        # True = reference-parity style loss (grams of the raw images,
        # reference modules/losses/perceptual.py:61-63 — the behavior the
        # reference actually ships).  False = standard Gatys feature grams;
        # better style gradients but NOT parity, and the big-tap grams pin
        # the VGG tap layouts spatial-minor, costing layout copies around
        # every VGG conv (trace_report.json round 4).
        compat_image_gram: bool = True,
        compat_eps_outside: bool = False,
        remat_perceptual: bool = False,
        # VGG conv dispatch (models/vgg.py:_Conv3x3Relu).  Default "xla":
        # the round-5 interleaved A/B (benchmarks/vgg_pallas_ab.json)
        # measured the Pallas im2col kernel at -22.7% on the full train
        # step (879 vs 1138 img/s) despite its better per-conv arithmetic
        # — the custom-call boundaries break XLA's cross-conv fusion and
        # force layout materialization at every kernel edge.  "auto"
        # (pallas where the shape fits VMEM on a single-device TPU)
        # remains available as the measured-loser arm.
        vgg_conv_impl: str = "xla",
        # outermost UNet up-conv impl (models/layers.ConvTranspose):
        # "s2d" emits the four output-parity classes from one 3x3 conv
        # + depth-to-space — 4x the MXU lanes at output_nc=3.
        # NOTE: measured -2.1% on the texture step (up0_s2d_ab.json);
        # default stays "auto".
        up0_impl: str = "auto",
        # split-form outermost down conv (models/unet._SplitL0Conv):
        # skips materializing the 128^2 36-channel ROI-encoding upsample.
        # Default per benchmarks/fuse_l0_ab.json (+6.2%, loss parity).
        fuse_l0: bool = True,
        # VGG max-pool backward form (ops/pooling.py): "stack" | "pad"
        pool_bwd: str = "stack",
        # D conv dispatch: "s2d_in" width-packs the lane-sparse stride-2
        # conv inputs (models/layers.Conv)
        d_conv_impl: str = "auto",
        # run VGG block 1 width-packed (models/vgg.py:VGG16Features.
        # block1_s2d): full 128-lane MXU tiles for the 64-channel convs.
        # Default per the interleaved A/B benchmarks/vgg_s2d_ab.json:
        # +4.5% (1186 -> 1239 img/s), loss parity to 1e-6.
        vgg_block1_s2d: bool = True,
    ):
        if netG == "swapnet":
            generator = TextureModule(
                texture_channels=texture_channels,
                cloth_channels=cloth_channels,
                num_roi=num_roi,
                img_size=img_size,
                norm_type=norm,
                init_type=init_type,
                init_gain=init_gain,
                dtype=dtype,
                up0_impl=up0_impl,
                fuse_l0=fuse_l0,
            )
        elif netG == "unet_128":
            generator = UnetGenerator(
                output_nc=texture_channels, num_downs=7, norm_type="batch",
                use_dropout=True, init_type=init_type, init_gain=init_gain,
                dtype=dtype,
            )
        else:
            raise ValueError(f"Cannot find implementation for {netG}")

        D = None
        if is_train:
            D = define_D(
                discriminator, 64, n_layers_D, norm, init_type, init_gain,
                dtype, quantize=quantize_D, conv_impl=d_conv_impl,
            )
        super().__init__(
            generator, D, gan_cfg, g_opt, d_opt,
            lambda_gan, lambda_discriminator, lambda_gp, wgan_clamp,
        )
        self.netG = netG
        self.lambda_l1 = lambda_l1
        self.lambda_content = lambda_content
        self.lambda_style = lambda_style
        self.use_perceptual = is_train and (lambda_content != 0 or lambda_style != 0)
        if self.use_perceptual:
            self.vgg = VGG16Features(
                dtype=dtype, conv_impl=vgg_conv_impl, pool_bwd=pool_bwd,
                block1_s2d=vgg_block1_s2d)
            if vgg_variables is None:
                vgg_variables = self.vgg.init(
                    jax.random.key(7), jnp.zeros((1, img_size, img_size, 3))
                )
            # frozen: carried in state.frozen (traced arg), NOT a closure —
            # closure constants blow up remote-compile request sizes
            self._vgg_variables = vgg_variables
        if vgg_block1_s2d and lambda_style != 0 and not compat_image_gram:
            raise ValueError(
                "vgg_block1_s2d supports the image-gram style loss only "
                "(feature grams need unpacked taps)")
        self.perc_cfg = PerceptualLossConfig(
            use_style=lambda_style != 0,
            compat_image_gram=compat_image_gram,
            compat_eps_outside=compat_eps_outside,
            tap1_s2d=vgg_block1_s2d,
        )
        # Rematerialize the perceptual block in the backward.  MEASURED
        # NEGATIVE (round 3, benchmarks/remat_perceptual_ab.json): remat
        # LOSES ~11% at 128^2 batch 8 (~11.2 vs ~10.1 ms/step) — the
        # recompute's own HBM writes exceed the residual savings, same
        # outcome as the round-2 generator remat (ROADMAP.md).  Kept only
        # as a memory lever for configs that don't fit HBM otherwise.
        self.remat_perceptual = remat_perceptual

    def frozen_variables(self):
        return {"vgg": self._vgg_variables} if self.use_perceptual else None

    # ---- hooks -----------------------------------------------------------

    def _g_args(self, batch):
        if self.netG == "swapnet":
            return (batch["input_textures"], batch["rois"], batch["cloths"])
        return (batch["input_textures"],)

    def init_generator(self, rngs, batch):
        return dict(self.G.init(rngs, *self._g_args(batch), True))

    def generator_forward(self, g_params, g_extra, batch, rng, train):
        variables = {"params": g_params, **(g_extra or {})}
        mutable = list(g_extra.keys()) if g_extra else []
        if mutable:
            fakes, new_extra = self.G.apply(
                variables, *self._g_args(batch), train,
                rngs={"dropout": rng}, mutable=mutable,
            )
            return fakes, dict(new_extra)
        fakes = self.G.apply(
            variables, *self._g_args(batch), train, rngs={"dropout": rng}
        )
        return fakes, {}

    def d_condition(self, batch, img):
        return jnp.concatenate([batch["cloths"].astype(img.dtype), img], axis=-1)

    def targets(self, batch):
        return batch["target_textures"]

    def extra_g_losses(self, fakes, batch, rng, frozen=None) -> Dict[str, jax.Array]:
        targets = batch["target_textures"]
        out = {}
        if self.lambda_l1:
            l1 = jnp.mean(jnp.abs(fakes.astype(jnp.float32) - targets.astype(jnp.float32)))
            out["loss_G_l1"] = l1 * self.lambda_l1
        if self.use_perceptual:
            vgg_vars = frozen["vgg"] if frozen is not None else self._vgg_variables

            def perc(fakes_, targets_, vgg_vars_):
                vgg_apply = lambda x: self.vgg.apply(vgg_vars_, x)
                return perceptual_loss(vgg_apply, fakes_, targets_, self.perc_cfg)

            if self.remat_perceptual:
                # saves only (fakes, targets, vgg params) fwd->bwd; VGG
                # activations + grams recompute in the backward (see the
                # remat_perceptual note in __init__)
                perc = jax.checkpoint(perc)
            content, style = perc(fakes, targets, vgg_vars)
            if self.lambda_content:
                out["loss_G_content"] = content * self.lambda_content
            if self.lambda_style:
                out["loss_G_style"] = style * self.lambda_style
        return out
