"""ROI-Align as separable bilinear-interpolation matmuls on the MXU.

TPU-native replacement for torchvision's C++/CUDA ``roi_align`` used by the
reference TextureModule (reference: modules/swapnet_modules.py:14,166-168,
234 with output_size=(128,128), spatial_scale=1, sampling_ratio=1).

Instead of per-sample gathers (slow on TPU), we exploit that ROI-Align's
sample grid is *separable*: the y-coordinate of sample (i, j) depends only
on i and the x-coordinate only on j.  Bilinear sampling therefore factors
into two dense interpolation matrices

    pooled[i, j] = sum_{r, c} Wy[i, r] * img[r, c] * Wx[j, c]
                 = (Wy @ img @ Wx^T)[i, j]

computed per (batch, roi) as batched matmuls that XLA tiles straight onto
the 128x128 systolic array.  The averaging over ``sampling_ratio`` samples
per bin also factors per-axis, so any static sampling_ratio >= 1 is exact.
Gradients are the transposed matmuls — no custom VJP needed.

Numerics match torchvision's `aligned=False` convention:
  * sample positions  start + (i + (s + 0.5)/sr) * bin_size
  * samples with pos < -1 or pos > input_size contribute 0
  * positions are clamped to [0, size-1] with the edge rule
    (low == size-1 -> both corners collapse onto the last pixel).

Our API takes ROIs as (B, R, 4) [x1, y1, x2, y2] — the batch index column
of torchvision's (N, 5) layout (reference ``reshape_rois``,
swapnet_modules.py:209-229) is unnecessary because the batch dimension is
kept explicit.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _axis_weights(
    start: jax.Array,  # (...,) roi start coordinate along this axis
    bin_size: jax.Array,  # (...,) bin size along this axis
    out_size: int,
    in_size: int,
    sampling_ratio: int,
) -> jax.Array:
    """Dense (out_size, in_size) bilinear weight matrix for one axis.

    Broadcasts over leading dims of `start`/`bin_size`.
    """
    i = jnp.arange(out_size, dtype=jnp.float32)  # output bin index
    s = (jnp.arange(sampling_ratio, dtype=jnp.float32) + 0.5) / sampling_ratio
    # pos[..., i, s]: sample coordinate
    pos = start[..., None, None] + (i[:, None] + s[None, :]) * bin_size[..., None, None]

    valid = (pos >= -1.0) & (pos <= in_size)
    pos = jnp.clip(pos, 0.0, None)
    low = jnp.floor(pos)
    at_edge = low >= in_size - 1
    low = jnp.where(at_edge, in_size - 1.0, low)
    frac = jnp.where(at_edge, 0.0, pos - low)
    high = jnp.where(at_edge, low, low + 1.0)

    cols = jnp.arange(in_size, dtype=jnp.float32)
    w = (cols == low[..., None]) * (1.0 - frac[..., None]) + (
        cols == high[..., None]
    ) * frac[..., None]
    w = w * valid[..., None]
    # average the per-bin samples: (..., out, sr, in) -> (..., out, in)
    return jnp.sum(w, axis=-2) / sampling_ratio


def roi_align(
    features: jax.Array,  # (B, H, W, C) NHWC
    rois: jax.Array,  # (B, R, 4) [x1, y1, x2, y2]
    output_size: Tuple[int, int] = (128, 128),
    spatial_scale: float = 1.0,
    sampling_ratio: int = 1,
    dtype=None,
    implementation: str = "auto",  # auto | pallas | xla
) -> jax.Array:
    """ROI-Align. Returns (B, R, out_h, out_w, C).

    implementation="auto" uses the Pallas kernel
    (ops/pallas_kernels.roi_align_pallas, ~1.4x faster, exact-equal
    output) on TPU when sampling_ratio == 1, the XLA einsum path
    otherwise.  Both differentiate (the Pallas kernel via a custom VJP
    whose backward is the transposed einsum).
    """
    if sampling_ratio < 1:
        raise ValueError(
            "adaptive sampling_ratio (0) is data-dependent and unsupported "
            "under jit; the reference uses sampling_ratio=1"
        )
    if implementation == "pallas" and sampling_ratio != 1:
        raise ValueError(
            "the Pallas kernel implements sampling_ratio=1 only (the "
            "reference config); use implementation='xla' for other ratios"
        )
    use_pallas = implementation == "pallas" or (
        implementation == "auto"
        and sampling_ratio == 1
        and jax.default_backend() == "tpu"
    )
    if use_pallas:
        f = features if dtype is None else features.astype(dtype)
        return _roi_align_pallas_diff(
            f, rois, output_size, spatial_scale, f.shape, str(f.dtype)
        )
    return _roi_align_xla(
        features, rois, output_size, spatial_scale, sampling_ratio, dtype
    )


def _roi_align_xla(
    features, rois, output_size, spatial_scale, sampling_ratio, dtype=None
) -> jax.Array:
    B, H, W, C = features.shape
    out_h, out_w = output_size
    out_dtype = dtype if dtype is not None else features.dtype

    # no gradient w.r.t. ROI coordinates — matches torchvision and keeps
    # the XLA and Pallas paths' differentiation semantics identical
    rois = jax.lax.stop_gradient(rois).astype(jnp.float32) * spatial_scale
    x1, y1, x2, y2 = (rois[..., k] for k in range(4))
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)

    wy = _axis_weights(y1, roi_h / out_h, out_h, H, sampling_ratio)  # (B,R,out_h,H)
    wx = _axis_weights(x1, roi_w / out_w, out_w, W, sampling_ratio)  # (B,R,out_w,W)

    if dtype is not None:
        wy, wx, features = wy.astype(dtype), wx.astype(dtype), features.astype(dtype)

    # Two batched matmuls on the MXU; XLA fuses the intermediate.
    tmp = jnp.einsum("brih,bhwc->briwc", wy, features)
    out = jnp.einsum("briwc,brjw->brijc", tmp, wx)
    # keep output dtype identical across the XLA and Pallas paths
    return out.astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _roi_align_pallas_diff(features, rois, output_size, spatial_scale,
                           feature_shape, feature_dtype):
    from swapnet_tpu.ops.pallas_kernels import roi_align_pallas

    return roi_align_pallas(features, rois, output_size, spatial_scale)


def _roi_align_pallas_fwd(features, rois, output_size, spatial_scale,
                          feature_shape, feature_dtype):
    out = _roi_align_pallas_diff(
        features, rois, output_size, spatial_scale, feature_shape, feature_dtype
    )
    return out, rois


def _roi_align_pallas_bwd(output_size, spatial_scale, feature_shape,
                          feature_dtype, rois, g):
    """d/d(features) of Wy @ img @ Wx^T is Wy^T @ g @ Wx — the transposed
    interpolation matmuls (ROIs get no gradient, matching torchvision)."""
    B, H, W, C = feature_shape
    fdtype = feature_dtype
    out_h, out_w = output_size
    rois32 = rois.astype(jnp.float32) * spatial_scale
    x1, y1, x2, y2 = (rois32[..., k] for k in range(4))
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    wy = _axis_weights(y1, roi_h / out_h, out_h, H, 1)
    wx = _axis_weights(x1, roi_w / out_w, out_w, W, 1)
    g32 = g.astype(jnp.float32)
    tmp = jnp.einsum("brijc,brjw->briwc", g32, wx)
    dfeat = jnp.einsum("brih,briwc->bhwc", wy, tmp)
    return dfeat.astype(fdtype), None


_roi_align_pallas_diff.defvjp(_roi_align_pallas_fwd, _roi_align_pallas_bwd)


def roi_align_reference(
    features: np.ndarray,  # (B, H, W, C)
    rois: np.ndarray,  # (B, R, 4)
    output_size: Tuple[int, int] = (128, 128),
    spatial_scale: float = 1.0,
    sampling_ratio: int = 1,
) -> np.ndarray:
    """Slow numpy ROI-Align following torchvision's CUDA algorithm verbatim
    (gather + 4-corner bilinear).  Used only to validate the matmul kernel.
    """
    B, H, W, C = features.shape
    R = rois.shape[1]
    out_h, out_w = output_size
    out = np.zeros((B, R, out_h, out_w, C), dtype=np.float64)

    def interp(img, y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return np.zeros(C)
        y, x = max(y, 0.0), max(x, 0.0)
        y_low, x_low = int(y), int(x)
        if y_low >= H - 1:
            y_high = y_low = H - 1
            y = float(y_low)
        else:
            y_high = y_low + 1
        if x_low >= W - 1:
            x_high = x_low = W - 1
            x = float(x_low)
        else:
            x_high = x_low + 1
        ly, lx = y - y_low, x - x_low
        hy, hx = 1.0 - ly, 1.0 - lx
        return (
            hy * hx * img[y_low, x_low]
            + hy * lx * img[y_low, x_high]
            + ly * hx * img[y_high, x_low]
            + ly * lx * img[y_high, x_high]
        )

    for b in range(B):
        for r in range(R):
            x1, y1, x2, y2 = rois[b, r] * spatial_scale
            roi_w = max(x2 - x1, 1.0)
            roi_h = max(y2 - y1, 1.0)
            bin_w = roi_w / out_w
            bin_h = roi_h / out_h
            for i in range(out_h):
                for j in range(out_w):
                    acc = np.zeros(C)
                    for sy in range(sampling_ratio):
                        for sx in range(sampling_ratio):
                            y = y1 + (i + (sy + 0.5) / sampling_ratio) * bin_h
                            x = x1 + (j + (sx + 0.5) / sampling_ratio) * bin_w
                            acc += interp(features[b], y, x)
                    out[b, r, i, j] = acc / (sampling_ratio * sampling_ratio)
    return out.astype(features.dtype)
