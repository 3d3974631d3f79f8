"""Discriminators (NHWC Flax) — parity with reference modules/discriminators.py.

  * NLayerDiscriminator — 70x70 PatchGAN (Conv4s2 stack, ndf=64, n_layers=3)
  * PixelDiscriminator  — 1x1 PatchGAN
  * define_D            — string factory ("basic" | "n_layers" | "pixel")

Outputs are logit maps (no sigmoid); the GAN loss handles the rest.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from swapnet_tpu.models.layers import Conv, Norm, leaky_relu


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (reference modules/discriminators.py:91-136)."""

    ndf: int = 64
    n_layers: int = 3
    norm_type: str = "instance"
    init_type: str = "kaiming"
    init_gain: float = 0.02
    dtype: Any = jnp.float32
    quantize: bool = False  # int8 convs + STE grads (--quantize_D)
    # "s2d_in": width-pack the inputs of the stride-2 convs whose input
    # channels half-fill the MXU tile (layers.Conv impl="s2d_in";
    # identical math and param tree)
    conv_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        use_bias = self.norm_type == "instance"
        kw = dict(init_type=self.init_type, init_gain=self.init_gain,
                  dtype=self.dtype, quantize=self.quantize,
                  impl=self.conv_impl)
        x = x.astype(self.dtype)

        x = Conv(self.ndf, 4, 2, 1, use_bias=True, **kw)(x)
        x = leaky_relu(x, 0.2)

        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            x = Conv(self.ndf * nf_mult, 4, 2, 1, use_bias=use_bias, **kw)(x)
            x = Norm(self.norm_type, self.init_gain, self.dtype)(x, train)
            x = leaky_relu(x, 0.2)

        nf_mult = min(2 ** self.n_layers, 8)
        x = Conv(self.ndf * nf_mult, 4, 1, 1, use_bias=use_bias, **kw)(x)
        x = Norm(self.norm_type, self.init_gain, self.dtype)(x, train)
        x = leaky_relu(x, 0.2)

        return Conv(1, 4, 1, 1, use_bias=True, **kw)(x)


class PixelDiscriminator(nn.Module):
    """1x1 PatchGAN (reference modules/discriminators.py:139-168)."""

    ndf: int = 64
    norm_type: str = "instance"
    init_type: str = "kaiming"
    init_gain: float = 0.02
    dtype: Any = jnp.float32
    quantize: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        use_bias = self.norm_type == "instance"
        kw = dict(init_type=self.init_type, init_gain=self.init_gain,
                  dtype=self.dtype, quantize=self.quantize)
        x = x.astype(self.dtype)
        x = Conv(self.ndf, 1, 1, 0, use_bias=True, **kw)(x)
        x = leaky_relu(x, 0.2)
        x = Conv(self.ndf * 2, 1, 1, 0, use_bias=use_bias, **kw)(x)
        x = Norm(self.norm_type, self.init_gain, self.dtype)(x, train)
        x = leaky_relu(x, 0.2)
        return Conv(1, 1, 1, 0, use_bias=use_bias, **kw)(x)


class FullImageDiscriminator(nn.Module):
    """Legacy full-image discriminator with a linear head (reference
    modules/discriminators.py:11-43; unused by the default configs but
    part of the public surface).  Conv3s2 stack + dropout + batch-norm,
    flatten, single logit."""

    in_channels: int = 3
    img_size: int = 512
    init_type: str = "kaiming"
    init_gain: float = 0.02
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        kw = dict(init_type=self.init_type, init_gain=self.init_gain, dtype=self.dtype)
        x = x.astype(self.dtype)
        for i, ch in enumerate((16, 32, 64, 128)):
            x = Conv(ch, 3, 2, 1, use_bias=True, **kw)(x)
            x = leaky_relu(x, 0.2)
            x = nn.Dropout(0.25, deterministic=not train)(x)
            if i > 0:
                x = Norm("batch", self.init_gain, self.dtype)(x, train)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(
            1, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(self.init_gain),
        )(x)


def define_D(
    netD: str = "basic",
    ndf: int = 64,
    n_layers_D: int = 3,
    norm: str = "instance",
    init_type: str = "kaiming",
    init_gain: float = 0.02,
    dtype: Any = jnp.float32,
    quantize: bool = False,
    conv_impl: str = "auto",
) -> nn.Module:
    """String factory matching reference define_D (discriminators.py:45-88).
    ``quantize`` routes the convs through the int8 MXU path with
    straight-through grads (TPU-native --quantize_D, ops/quant.py);
    ``conv_impl="s2d_in"`` width-packs the lane-sparse stride-2 conv
    inputs (NLayerDiscriminator.conv_impl)."""
    common = dict(
        ndf=ndf, norm_type=norm, init_type=init_type, init_gain=init_gain,
        dtype=dtype, quantize=quantize,
    )
    if netD == "basic":
        return NLayerDiscriminator(n_layers=3, conv_impl=conv_impl, **common)
    if netD == "n_layers":
        return NLayerDiscriminator(
            n_layers=n_layers_D, conv_impl=conv_impl, **common)
    if netD == "pixel":
        return PixelDiscriminator(**common)
    raise NotImplementedError(f"Discriminator model name [{netD}] is not recognized")
