"""WarpModule — stage-1 dual-encoder U-Net (NHWC, Flax).

Deforms a source garment segmentation to match a target body pose.
Architecture parity with reference modules/swapnet_modules.py:22-151:

  body encoder : 4 x UNetDown  (body_ch -> 64 -> 128 -> 256 -> 512)
  cloth encoder: 6 x UNetDown  (cloth_ch -> ... -> 1024)
                 + 2 x UNetUp without skips (-> 1024 -> 512)
  bottleneck   : concat(body_d4, cloth_u2) = 1024ch -> 4 x ResidualBlock
  decoder      : 3 x DualUNetUp with skips from BOTH encoders
  head         : Upsample2x -> ZeroPad(1,0,1,0) -> Conv4 -> Tanh -> cloth_ch

At 128x128 the bottleneck sits at 8x8x1024 and the deepest cloth feature
at 2x2x1024; all shapes are static so XLA compiles one fused program.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from swapnet_tpu.models.layers import (
    DualUNetUp,
    ResidualBlock,
    UNetDown,
    UNetUp,
    UpsamplePadConvTanh,
)


class WarpModule(nn.Module):
    body_channels: int = 3
    cloth_channels: int = 19
    dropout: float = 0.5
    init_type: str = "kaiming"
    init_gain: float = 0.02
    dtype: Any = jnp.float32
    # "s2d" computes the identical head as one space-to-depth conv
    # (4x the MXU lane occupancy at 19 output channels; layers._HeadS2D).
    # Default per the interleaved A/B benchmarks/warp_head_s2d_ab.json:
    # +16.5% (gan) / +16.3% (ce) over the literal upsample+conv, loss
    # parity to 1e-4, interchangeable param tree.
    head_impl: str = "s2d"

    @nn.compact
    def __call__(self, body: jax.Array, cloth: jax.Array, train: bool = True) -> jax.Array:
        """body: (B,H,W,body_ch), cloth: (B,H,W,cloth_ch) -> (B,H,W,cloth_ch) logits->tanh."""
        if min(body.shape[1], body.shape[2]) < 64:
            # the 6-level cloth encoder halves spatial dims six times; below
            # 64 the deepest feature map is empty (the reference's torch convs
            # error the same way, just less legibly)
            raise ValueError(
                f"WarpModule needs height/width >= 64, got {body.shape[1:3]}"
            )
        kw = dict(init_type=self.init_type, init_gain=self.init_gain, dtype=self.dtype)
        down = lambda ch, **over: UNetDown(ch, **{**kw, **over})
        body = body.astype(self.dtype)
        cloth = cloth.astype(self.dtype)

        # Body pre-encoding
        body_d1 = down(64, normalize=False)(body, train)
        body_d2 = down(128)(body_d1, train)
        body_d3 = down(256)(body_d2, train)
        body_d4 = down(512, dropout=self.dropout)(body_d3, train)

        # Cloth pre-encoding
        cloth_d1 = down(64, normalize=False)(cloth, train)
        cloth_d2 = down(128)(cloth_d1, train)
        cloth_d3 = down(256)(cloth_d2, train)
        cloth_d4 = down(512)(cloth_d3, train)
        cloth_d5 = down(1024, dropout=self.dropout)(cloth_d4, train)
        cloth_d6 = down(1024, normalize=False, dropout=self.dropout)(cloth_d5, train)
        cloth_u1 = UNetUp(1024, **kw)(cloth_d6, None, train)
        cloth_u2 = UNetUp(512, **kw)(cloth_u1, None, train)

        # Combine & resblocks
        x = jnp.concatenate([body_d4, cloth_u2], axis=-1)
        for _ in range(4):
            x = ResidualBlock(dropout=self.dropout, **kw)(x, train)

        # Dual decoding with skips from both encoders
        x = DualUNetUp(256, **kw)(x, body_d3, cloth_d3, train)
        x = DualUNetUp(128, **kw)(x, body_d2, cloth_d2, train)
        x = DualUNetUp(64, **kw)(x, body_d1, cloth_d1, train)

        return UpsamplePadConvTanh(
            self.cloth_channels, impl=self.head_impl, **kw)(x)
