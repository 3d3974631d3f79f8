"""Pallas TPU kernels for the framework's hot ops.

1. ``roi_align_pallas`` — the separable-matmul ROI-Align (see
   ops/roi_align.py for the math) as an explicit Mosaic kernel: one grid
   step per (batch, roi), interpolation weight matrices built in VMEM from
   scalar-prefetched ROI coords, two MXU dots per step.  Keeps the whole
   pooled tile in VMEM instead of round-tripping the einsum intermediate
   through HBM.

(A fused InstanceNorm+LeakyReLU Pallas kernel lived here through round 2
and measured SLOWER than XLA's own fusion at every UNetDown shape —
0.77-0.93x once instance_norm switched to single-pass E[x^2]-E[x]^2
stats, which lets XLA fuse both reductions into one read.  Deleted;
negative result recorded in ROADMAP.md so it isn't re-attempted.)

The kernel has a jnp fallback and is validated against it in tests
(Pallas interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _axis_weights_in_kernel(start, bin_size, out_size: int, in_size: int,
                            transposed: bool = False):
    """Bilinear weights for sampling_ratio=1 from scalar start/bin_size.
    Returns (out_size, in_size), or (in_size, out_size) when transposed —
    built directly with swapped iota dims so no in-register transpose is
    needed (Mosaic relayouts are expensive).  Integer iota only."""
    shape = (in_size, out_size) if transposed else (out_size, in_size)
    out_dim = 1 if transposed else 0
    i = jax.lax.broadcasted_iota(jnp.int32, shape, out_dim).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1 - out_dim).astype(jnp.float32)
    pos = start + (i + 0.5) * bin_size  # sample coordinate per output index
    valid = (pos >= -1.0) & (pos <= in_size)
    pos = jnp.maximum(pos, 0.0)
    low = jnp.floor(pos)
    at_edge = low >= in_size - 1
    low = jnp.where(at_edge, in_size - 1.0, low)
    frac = jnp.where(at_edge, 0.0, pos - low)
    high = jnp.where(at_edge, low, low + 1.0)
    w = (cols == low) * (1.0 - frac) + (cols == high) * frac
    return jnp.where(valid, w, 0.0)


def _roi_align_kernel(out_h, out_w, spatial_scale, rois_ref, img_ref, out_ref):
    # img_ref block (1, C, H, W): channels-first so each img_ref[0, c] is a
    # lane-aligned (H, W) slab feeding clean 2D MXU dots.
    b = pl.program_id(0)
    r = pl.program_id(1)
    C, H, W = img_ref.shape[1], img_ref.shape[2], img_ref.shape[3]

    x1 = rois_ref[b, r, 0] * spatial_scale
    y1 = rois_ref[b, r, 1] * spatial_scale
    x2 = rois_ref[b, r, 2] * spatial_scale
    y2 = rois_ref[b, r, 3] * spatial_scale
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)

    wy = _axis_weights_in_kernel(y1, roi_h / out_h, out_h, H)  # (out_h, H)
    wxT = _axis_weights_in_kernel(
        x1, roi_w / out_w, out_w, W, transposed=True
    )  # (W, out_w)

    for c in range(C):  # static unroll; C is tiny (3 for RGB)
        img = img_ref[0, c].astype(jnp.float32)  # (H, W)
        tmp = jnp.dot(wy, img, preferred_element_type=jnp.float32)  # (out_h, W)
        out_ref[0, 0, c] = jnp.dot(
            tmp, wxT, preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)


def roi_align_pallas(
    features: jax.Array,  # (B, H, W, C)
    rois: jax.Array,  # (B, R, 4)
    output_size: Tuple[int, int] = (128, 128),
    spatial_scale: float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """Pallas ROI-Align (sampling_ratio=1). Returns (B, R, out_h, out_w, C)."""
    B, H, W, C = features.shape
    R = rois.shape[1]
    out_h, out_w = output_size

    feats_cf = jnp.transpose(features, (0, 3, 1, 2))  # (B, C, H, W)
    kernel = functools.partial(_roi_align_kernel, out_h, out_w, spatial_scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, R),
        in_specs=[
            pl.BlockSpec((1, C, H, W), lambda b, r, rois: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, C, out_h, out_w), lambda b, r, rois: (b, r, 0, 0, 0)
        ),
    )
    out_cf = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, R, C, out_h, out_w), features.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * R * C * (out_h * H * W + out_h * out_w * W),
            bytes_accessed=B * H * W * C * 4 + B * R * out_h * out_w * C * 4,
            transcendentals=0,
        ),
    )(rois.astype(jnp.float32), feats_cf)
    return jnp.transpose(out_cf, (0, 1, 3, 4, 2))


