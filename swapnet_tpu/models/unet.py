"""pix2pix U-Net generator (NHWC Flax), iterative form.

The reference builds this recursively from nested UnetSkipConnectionBlocks
(reference: modules/pix2pix_modules.py:113-262).  We unroll it into one
module with explicit down/up loops — identical math, but a flat param tree
that's friendlier to port, shard, and inspect.

Level layout for num_downs=n, ngf=64 (L0 = outermost):
  down  L0: conv(input->ngf)                      (no relu, no norm)
        L1: lrelu, conv(ngf->2ngf), norm
        L2: lrelu, conv(2ngf->4ngf), norm
        L3: lrelu, conv(4ngf->8ngf), norm
        L4..L(n-2): lrelu, conv(8ngf->8ngf), norm  ("intermediate")
        L(n-1): lrelu, conv(8ngf->8ngf)            (innermost, no norm)
  up    mirrors down; each non-outermost level concatenates its up output
        with its own down *input*: cat([x_i, up_i]) on channels.
        Dropout(0.5) on intermediate levels when use_dropout.
        Outermost up: relu, convT(2ngf->output_nc, bias), tanh.

conv bias follows the reference rule: use_bias iff norm is InstanceNorm
(outermost upconv always has bias).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from swapnet_tpu.models.layers import (
    Conv, ConvTranspose, Norm, leaky_relu, make_initializer)


def _merge_up2_taps(w: jax.Array, axis: int) -> jax.Array:
    """Collapse one spatial axis of a k=4/s=2/p=1 kernel applied to a
    2x-nearest-upsampled input into its 3-tap stride-1 equivalent.

    At output row i the s2 window reads up2 rows {2i-1..2i+2}, i.e.
    x rows (i-1, i, i, i+1): taps (w0; w1+w2; w3) at offsets (-1, 0, +1)
    — the same merge as layers.head_s2d_kernel's pr=1 row.  Linear in w.
    """
    w0, w1, w2, w3 = jnp.split(w, 4, axis=axis)
    return jnp.concatenate([w0, w1 + w2, w3], axis=axis)


class _SplitL0Conv(nn.Module):
    """The UNet's outermost down conv (k4 s2 p1) over a conceptual input
    cat([up2_nearest(lowres), x]) — computed WITHOUT materializing the
    upsample: conv4s2p1 over x plus a 3x3/s1/p1 conv over lowres with
    merged taps (_merge_up2_taps per axis), summed.  Math-identical
    (tested in tests/test_layers.py); declares the SAME param tree as
    Conv over the concatenated input (kernel [4,4,C_low+C_x,O]) so
    checkpoints are interchangeable."""

    features: int
    c_low: int
    use_bias: bool = False
    init_type: str = "kaiming"
    init_gain: float = 0.02
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lowres: jax.Array, x: jax.Array) -> jax.Array:
        c_total = self.c_low + x.shape[-1]
        kernel = self.param(
            "kernel",
            make_initializer(self.init_type, self.init_gain),
            (4, 4, c_total, self.features),
            jnp.float32,
        )
        k_low = _merge_up2_taps(
            _merge_up2_taps(kernel[:, :, : self.c_low], 0), 1
        ).astype(self.dtype)  # [3,3,C_low,O]
        y = jax.lax.conv_general_dilated(
            lowres.astype(self.dtype), k_low,
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype,
        ) + jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel[:, :, self.c_low :].astype(self.dtype),
            window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class UnetGenerator(nn.Module):
    output_nc: int = 3
    num_downs: int = 7
    ngf: int = 64
    norm_type: str = "batch"
    use_dropout: bool = False
    init_type: str = "kaiming"
    init_gain: float = 0.02
    dtype: Any = jnp.float32
    # impl for the outermost up-conv only (output_nc lanes, e.g. 3/128 on
    # the texture RGB head): "s2d" emits the four output-parity classes
    # from one 3x3 conv + depth-to-space (layers.convt_s2d_kernel)
    up0_impl: str = "auto"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = True,
        lowres: jax.Array | None = None,
    ) -> jax.Array:
        """When ``lowres`` (B, H/2, W/2, C_low) is given, the conceptual
        input is cat([up2_nearest(lowres), x]) but the upsample is never
        materialized: the outermost down conv runs in split form
        (_SplitL0Conv) directly on (lowres, x).  Identical math and param
        tree; skips the (B, H, W, C_low) broadcast in the forward and the
        matching reduce in the backward."""
        n = self.num_downs
        assert n >= 5, "UnetGenerator needs num_downs >= 5"
        ngf = self.ngf
        use_bias = self.norm_type == "instance"
        kw = dict(init_type=self.init_type, init_gain=self.init_gain, dtype=self.dtype)

        def down_ch(i):
            return ngf * min(2 ** i, 8) if i < 4 else ngf * 8

        def up_ch(i):
            return self.output_nc if i == 0 else down_ch(i - 1)

        h = x.astype(self.dtype)
        inputs = []
        for i in range(n):
            inputs.append(h)  # inputs[0] is never concatenated (outermost)
            if i > 0:
                h = leaky_relu(h, 0.2)
            if i == 0 and lowres is not None:
                h = _SplitL0Conv(
                    down_ch(0), lowres.shape[-1], use_bias=use_bias,
                    name="down_0", **kw,
                )(lowres, h)
                continue
            h = Conv(down_ch(i), 4, 2, 1, use_bias=use_bias, name=f"down_{i}", **kw)(h)
            if 0 < i < n - 1:
                h = Norm(self.norm_type, self.init_gain, self.dtype, name=f"down_norm_{i}")(
                    h, train
                )

        u = h
        for i in reversed(range(n)):
            u = jax.nn.relu(u)
            outermost = i == 0
            u = ConvTranspose(
                up_ch(i), 4, 2, 1,
                use_bias=True if outermost else use_bias,
                impl=self.up0_impl if outermost else "auto",
                name=f"up_{i}", **kw,
            )(u)
            if not outermost:
                u = Norm(self.norm_type, self.init_gain, self.dtype, name=f"up_norm_{i}")(
                    u, train
                )
                if self.use_dropout and 4 <= i <= n - 2:
                    u = nn.Dropout(0.5, deterministic=not train)(u)
                u = jnp.concatenate([inputs[i], u], axis=-1)
        return jnp.tanh(u)


def define_G(
    output_nc: int,
    netG: str,
    ngf: int = 64,
    norm: str = "batch",
    use_dropout: bool = False,
    init_type: str = "normal",
    init_gain: float = 0.02,
    dtype: Any = jnp.float32,
) -> nn.Module:
    """String factory matching reference define_G (pix2pix_modules.py:10-64).

    input_nc is inferred at init time from the input (Flax lazy shapes).
    """
    common = dict(
        output_nc=output_nc, ngf=ngf, norm_type=norm, use_dropout=use_dropout,
        init_type=init_type, init_gain=init_gain, dtype=dtype,
    )
    if netG == "unet_128":
        return UnetGenerator(num_downs=7, **common)
    if netG == "unet_256":
        return UnetGenerator(num_downs=8, **common)
    if netG in ("resnet_9blocks", "resnet_6blocks"):
        raise NotImplementedError(netG)
    raise NotImplementedError(f"Generator model name [{netG}] is not recognized")
