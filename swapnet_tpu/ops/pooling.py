"""Layout-preserving 2x2/stride-2 max pooling for NHWC feature maps.

Why not ``flax.linen.max_pool`` (lax.reduce_window): on TPU, XLA's layout
assignment gives reduce-window a *spatial-minor* layout preference while
the surrounding 3x3 convs want channel-minor, so every VGG pool in the
perceptual loss forced a pair of full-tensor layout copies around it plus
a select-and-scatter in the backward.  Trace-measured at the texture
128^2 batch-8 train step (benchmarks/trace_report.json, round 3):
0.46 ms reduce-window + 0.24 ms select-and-scatter + the bulk of 1.6 ms
of ``copy``/``copy-done`` layout flips — all non-compulsory.

This implementation is four strided slices + elementwise max: no op with
a divergent layout preference, so XLA keeps the conv layout end-to-end
and fuses the pool into the neighboring elementwise work.

The backward matches torch ``MaxPool2d`` / XLA select-and-scatter
semantics exactly: the gradient routes to the FIRST maximal element in
row-major window order ((0,0) > (0,1) > (1,0) > (1,1)).  ``jnp.maximum``'s
default VJP would split ties evenly — post-ReLU feature maps are full of
exact-zero ties, so that difference is visible in training trajectories;
the custom VJP keeps parity with the reference
(/root/reference/modules/losses/perceptual.py:26-42 pools via torchvision
VGG16's MaxPool2d).

NaN caveat: with NaNs in the window, torch propagates NaN and routes the
gradient to the NaN; here comparisons are all-false and the gradient
routes to the last window element.  Training guards against non-finites
upstream (utils/checks.py), so this is acceptable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _slices(x):
    a = x[:, ::2, ::2]
    b = x[:, ::2, 1::2]
    c = x[:, 1::2, ::2]
    d = x[:, 1::2, 1::2]
    return a, b, c, d


def _forward(x):
    a, b, c, d = _slices(x)
    return jnp.maximum(jnp.maximum(a, b), jnp.maximum(c, d))


def _fwd(x):
    m = _forward(x)
    return m, (x, m)


def _window_grads(res, g):
    """First-maximal routing masks applied to g: one (B,H/2,W/2,C) grad
    per window position, row-major tie order (torch MaxPool2d parity)."""
    x, m = res
    a, b, c, d = _slices(x)
    ea = a == m
    eb = (b == m) & ~ea
    ec = (c == m) & ~ea & ~eb
    ed = ~(ea | eb | ec)
    zero = jnp.zeros((), g.dtype)
    return (jnp.where(ea, g, zero), jnp.where(eb, g, zero),
            jnp.where(ec, g, zero), jnp.where(ed, g, zero))


@jax.custom_vjp
def _max_pool_2x2_stack(x: jax.Array) -> jax.Array:
    return _forward(x)


def _bwd_stack(res, g):
    ga, gb, gc, gd = _window_grads(res, g)
    B, H2, W2, C = ga.shape
    # interleave columns then rows; C stays minormost throughout
    r0 = jnp.stack([ga, gb], axis=3).reshape(B, H2, 2 * W2, C)  # even rows
    r1 = jnp.stack([gc, gd], axis=3).reshape(B, H2, 2 * W2, C)  # odd rows
    out = jnp.stack([r0, r1], axis=2).reshape(B, 2 * H2, 2 * W2, C)
    return (out,)


_max_pool_2x2_stack.defvjp(_fwd, _bwd_stack)


@jax.custom_vjp
def _max_pool_2x2_pad(x: jax.Array) -> jax.Array:
    return _forward(x)


def _bwd_pad(res, g):
    """Scatter via four interior-padded adds instead of stack+reshape
    interleaves: every intermediate stays 4-D with C minormost, so XLA
    never materializes the 5-D [.,.,2,.,C] stack layouts that showed up
    as ~0.17 ms of layout copies in step_accounting.json (the
    %copy.509/510/511 cluster)."""
    ga, gb, gc, gd = _window_grads(res, g)
    zero = jnp.zeros((), g.dtype)

    def put(t, row_off, col_off):
        return jax.lax.pad(t, zero, (
            (0, 0, 0),
            (row_off, 1 - row_off, 1),
            (col_off, 1 - col_off, 1),
            (0, 0, 0),
        ))

    return (put(ga, 0, 0) + put(gb, 0, 1) + put(gc, 1, 0) + put(gd, 1, 1),)


_max_pool_2x2_pad.defvjp(_fwd, _bwd_pad)


def max_pool_2x2(x: jax.Array, bwd_impl: str = "stack") -> jax.Array:
    """NHWC 2x2 max pool, stride 2, no padding. H and W must be even.

    ``bwd_impl`` selects the backward formulation (identical values):
    "stack" (interleave via stack+reshape) or "pad" (interior-padded
    adds; see _bwd_pad).
    """
    if bwd_impl == "pad":
        return _max_pool_2x2_pad(x)
    return _max_pool_2x2_stack(x)
