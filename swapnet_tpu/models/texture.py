"""TextureModule — stage-2 texture renderer (NHWC, Flax).

Renders a photorealistic image from a (warped) cloth segmentation plus
ROI-pooled texture features.  Parity with reference
modules/swapnet_modules.py:154-260:

  1. ROI-Align 12 body ROIs from the input texture to (128,128)
     — here a batched MXU matmul op (swapnet_tpu.ops.roi_align) instead of
     torchvision's CUDA kernel; the (B*R, 5) reshape_rois dance
     (reference :209-229) disappears because batch stays an explicit axis.
  2. Regroup pooled ROIs into channels: (B,R,h,w,C) -> (B,h,w,R*C)
     (roi-major then RGB, matching the reference's view()).
  3. UNetDown(36 -> 36) encode, nearest-upsample back to input H x W.
  4. Concat cloth segmentation (36 + 19 = 55 channels).
  5. pix2pix UnetGenerator with num_downs = log2(img_size) -> RGB.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from swapnet_tpu.models.layers import UNetDown, resize_nearest
from swapnet_tpu.models.unet import UnetGenerator
from swapnet_tpu.ops import roi_align


class TextureModule(nn.Module):
    texture_channels: int = 3
    cloth_channels: int = 19
    num_roi: int = 12
    norm_type: str = "batch"
    dropout: float = 0.5
    img_size: int = 128
    roi_size: int = 128
    init_type: str = "kaiming"
    init_gain: float = 0.02
    dtype: Any = jnp.float32
    # outermost UNet up-conv impl (see layers.ConvTranspose / unet.py)
    up0_impl: str = "auto"
    # True: skip materializing the (B,H,W,36) nearest-upsample of the
    # ROI encoding — the UNet's outermost down conv runs in split form
    # directly on (encoded@64^2, cloth@128^2) (unet._SplitL0Conv).
    # Identical math and param tree.  Default per the interleaved A/B
    # benchmarks/fuse_l0_ab.json: +6.2% (1119 -> 1189 img/s), loss parity.
    fuse_l0: bool = True

    @nn.compact
    def __call__(
        self,
        input_tex: jax.Array,  # (B, H, W, texture_channels)
        rois: jax.Array,  # (B, num_roi, 4) [x1, y1, x2, y2]
        cloth: jax.Array,  # (B, H, W, cloth_channels)
        train: bool = True,
    ) -> jax.Array:
        B, H, W, C = input_tex.shape
        kw = dict(init_type=self.init_type, init_gain=self.init_gain, dtype=self.dtype)

        pooled = roi_align(
            input_tex,
            rois,
            output_size=(self.roi_size, self.roi_size),
            spatial_scale=1.0,
            sampling_ratio=1,
            dtype=self.dtype,
        )  # (B, R, roi, roi, C)
        # channels <- (roi index, then color), matching the reference's
        # (B*R, C, h, w).view(B, R*C, h, w)
        pooled = jnp.transpose(pooled, (0, 2, 3, 1, 4)).reshape(
            B, self.roi_size, self.roi_size, self.num_roi * C
        )

        encoded = UNetDown(self.num_roi * C, **kw)(pooled, train)

        # fast int log2 of img_size (reference uses math.frexp)
        num_downs = self.img_size.bit_length() - 1
        gen = UnetGenerator(
            output_nc=self.texture_channels,
            num_downs=num_downs,
            norm_type=self.norm_type,
            use_dropout=self.dropout is not None and self.dropout > 0,
            up0_impl=self.up0_impl,
            **kw,
        )
        # any even upsample factor f splits as up2(up_{f/2}): the 2x half
        # merges into the split L0 conv, so only the (H/2)^2 intermediate
        # is ever materialized (at 512^2 that is 1/4 of the bytes and the
        # L0 conv runs at 256^2 instead of 512^2).  Gate (interleaved
        # measurements; identical math either way, so train/eval may take
        # different paths): factor 2 needs no extra resize and wins in
        # BOTH directions (fwd-only 0.591 -> 0.468 ms at 128^2; train
        # +6.2%, fuse_l0_ab.json); factor > 2 pays a materialized
        # half-res resize that only the backward savings amortize
        # (512^2: train +5.8%, fwd-only 1.51 -> 1.70 ms) — so large
        # factors split only when training.
        eh = encoded.shape[1]
        if (self.fuse_l0 and H % eh == 0 and (H // eh) % 2 == 0
                and (train or H == 2 * eh)):
            lowres = (encoded if eh * 2 == H
                      else resize_nearest(encoded, H // 2, W // 2))
            return gen(cloth.astype(encoded.dtype), train, lowres=lowres)
        upsampled = resize_nearest(encoded, H, W)
        tex_with_cloth = jnp.concatenate(
            [upsampled, cloth.astype(upsampled.dtype)], axis=-1
        )
        return gen(tex_with_cloth, train)
