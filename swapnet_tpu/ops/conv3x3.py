"""Pallas 3x3/stride-1/pad-1 NHWC conv (+bias+ReLU) for the frozen VGG.

Why this exists (round 4 step accounting, benchmarks/step_accounting.json):
at the texture 128^2 batch-8 train step, XLA's conv emitter runs the VGG
block-1 cluster (64-channel 3x3 convs at 128^2 plus their input-gradient
convs) at 7-43% of the HBM byte floor — ~1.56 ms of a 7.0 ms step.  The
shapes are the problem: C_in = 64 fills half the MXU contraction and
C_out = 64 half its output lanes, and the emitter adds spatial-window
bookkeeping on top.  This kernel reformulates the conv as ONE im2col
matmul per 8-row chunk — [8*W, 9*C_in] @ [9*C_in, C_out] with f32
accumulation — so the contraction dim is 9*64 = 576 (4.5 full MXU tiles)
instead of 64; bias and ReLU are applied to the accumulator tile in VMEM,
so the only HBM traffic is one read of x and one write of the activation.

Used by the perceptual loss's frozen VGG16 extractor (the TPU-native
analog of the torchvision VGG16 the reference trains against,
reference modules/losses/perceptual.py:26-42).  The custom VJP computes
the input gradient with the SAME Pallas kernel (3x3 stride-1 pad-1
input-grad == conv with spatially flipped, in/out-transposed weights,
masked by the saved activation for the ReLU); the weight/bias gradients
are plain XLA expressions that dead-code eliminate in the frozen-VGG
path where nothing consumes them.

Scope: stride 1, padding 1, 3x3 kernels, H % 8 == 0.  The pallas path is
gated by a VMEM budget (the whole padded image is staged per batch
element — see `pallas_vmem_ok`); callers fall back to `impl="xla"`
outside it.  Numerics match flax.linen.Conv at the same dtype: the
matmul accumulates f32, rounds to the compute dtype, then adds bias in
the compute dtype (nn.Conv's promote-then-add order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_R = 8  # output rows per grid step: one f32 sublane tile, M = 8*W per matmul


def _xla_conv(x, w):
    """Reference XLA formulation (identical math, emitter-scheduled)."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def _kernel(x_ref, w_ref, b_ref, o_ref, *, W, C, N, relu):
    """One (batch, row-chunk) program: im2col matmul over a padded image.

    x_ref: [1, H+2, W+2, C] padded input image (whole, revisited per chunk)
    w_ref: [9*C, N] tap-major flattened weights
    b_ref: [1, N] bias (zeros when the caller has none)
    o_ref: [1, _R, W, N] output chunk
    """
    chunk = pl.program_id(1)
    r0 = chunk * _R
    # Three sublane-shifted row slabs (dx = 0,1,2); row (dy) picks are then
    # free major-dim slices of these.
    slabs = [x_ref[0, pl.ds(r0, _R + 2), pl.ds(dx, W), :] for dx in range(3)]
    cols = []
    for dy in range(3):
        for dx in range(3):
            tap = slabs[dx][dy:dy + _R]  # [R, W, C]
            cols.append(tap.reshape(_R * W, C))
    col = jnp.concatenate(cols, axis=-1)  # [R*W, 9C]
    acc = jnp.dot(col, w_ref[:], preferred_element_type=jnp.float32)
    y = acc.astype(o_ref.dtype) + b_ref[0, :].astype(o_ref.dtype)
    if relu:
        y = jnp.maximum(y, jnp.zeros((), o_ref.dtype))
    o_ref[0] = y.reshape(_R, W, N)


def _pallas_conv(x, w, b, relu, *, interpret=False):
    """Conv3x3(stride 1, pad 1) + bias + optional ReLU; output x.dtype."""
    B, H, W, C = x.shape
    kh, kw, ci, N = w.shape
    assert (kh, kw, ci) == (3, 3, C), (w.shape, x.shape)
    assert H % _R == 0, f"H={H} must be a multiple of {_R}"
    assert W % _R == 0, f"W={W} must be a multiple of {_R}"
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # tap-major [9C, N]: rows tap*C..tap*C+C hold W[dy, dx] for tap = dy*3+dx
    w_mat = w.reshape(9 * C, N).astype(x.dtype)
    b_mat = b.reshape(1, N).astype(x.dtype)
    grid = (B, H // _R)
    return pl.pallas_call(
        functools.partial(_kernel, W=W, C=C, N=N, relu=relu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H + 2, W + 2, C), lambda b_, c: (b_, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C, N), lambda b_, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda b_, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _R, W, N), lambda b_, c: (b_, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, N), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * C * N,
            bytes_accessed=(x_pad.size + w_mat.size + B * H * W * N)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x_pad, w_mat, b_mat)


def shape_ok(shape) -> bool:
    """Shapes the kernel supports: H and W multiples of the 8-row chunk."""
    _, H, W, _ = shape
    return H % _R == 0 and W % _R == 0


def pallas_vmem_ok(shape, dtype, features=None) -> bool:
    """True when the padded per-image block + im2col + resident weight block
    + double-buffered output chunk fit the VMEM budget (~12 MB of the
    16 MB/core; the input block and output chunk are double-buffered by
    the pipeline).
    """
    _, H, W, C = shape
    if H % _R != 0 or W % _R != 0:
        return False
    N = C if features is None else features
    itemsize = jnp.dtype(dtype).itemsize
    lanes = max(128, -(-C // 128) * 128)
    n_lanes = max(128, -(-N // 128) * 128)
    sub_tile = 8 * 4 // itemsize  # (8,128) f32 / (16,128) bf16 sublane tile
    sublanes = -(-(W + 2) // sub_tile) * sub_tile
    x_block = (H + 2) * sublanes * lanes * itemsize
    col = _R * W * max(128, -(-9 * C // 128) * 128) * itemsize
    w_block = 9 * C * n_lanes * itemsize  # resident [9C, N] weight matrix
    o_chunk = _R * W * n_lanes * itemsize
    # 14 MB of the 16 MB/core: the block-1 shape (8,128,128,64) bf16 — the
    # shape the kernel was built for and measured on — totals 12.9 MB by
    # this estimate and compiles + runs on the chip (vgg_pallas_ab.json).
    total = 2 * x_block + 2 * col + w_block + 2 * o_chunk
    return total < 14 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv3x3_bias_act(x, w, b, relu: bool = False, impl: str = "xla",
                     interpret: bool = False):
    """3x3 stride-1 pad-1 NHWC conv + bias + optional ReLU, in x.dtype.

    impl: "pallas" (the im2col kernel) or "xla" (conv_general_dilated).
    interpret: run the pallas kernel in interpreter mode (CPU tests).
    The VJP computes dx with the same impl; dw/db are XLA expressions that
    DCE away when w, b are frozen (the perceptual-loss case).
    """
    return _forward(x, w, b, relu, impl, interpret)


def _forward(x, w, b, relu, impl, interpret):
    if impl == "pallas":
        return _pallas_conv(x, w, b, relu, interpret=interpret)
    y = _xla_conv(x, w).astype(x.dtype) + b.astype(x.dtype)
    return jax.nn.relu(y) if relu else y


def _fwd(x, w, b, relu, impl, interpret):
    y = _forward(x, w, b, relu, impl, interpret)
    return y, (x, w, y)


def _bwd(relu, impl, interpret, res, g):
    x, w, y = res
    g = g.astype(x.dtype)
    if relu:
        g = jnp.where(y > 0, g, jnp.zeros((), g.dtype))
    # input grad: full correlation == conv with flipped, in/out-swapped taps
    w_t = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)  # [3,3,N,C]
    zb = jnp.zeros((x.shape[-1],), x.dtype)
    dx = _forward(g, w_t.astype(x.dtype), zb, False, impl, interpret)
    # weight/bias grads: dead (and removed by XLA) when the VGG is frozen.
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dw = jax.lax.conv_general_dilated(
        x_pad.transpose(3, 1, 2, 0),  # C_in as batch, B as features
        g.transpose(1, 2, 0, 3),      # H,W spatial, B in, N out
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).transpose(1, 2, 0, 3).astype(w.dtype)  # [3,3,C,N]
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(w.dtype)
    return dx.astype(x.dtype), dw, db


conv3x3_bias_act.defvjp(_fwd, _bwd)
