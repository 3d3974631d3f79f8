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


@jax.custom_vjp
def _max_pool_2x2_gather(x: jax.Array) -> jax.Array:
    return _forward(x)


def _up2(t):
    """Nearest 2x upsample as broadcast+reshape (layout-friendly; XLA
    fuses it like models/layers.resize_nearest's broadcasts)."""
    B, H2, W2, C = t.shape
    t = jnp.broadcast_to(t[:, :, None, :, None, :], (B, H2, 2, W2, 2, C))
    return t.reshape(B, 2 * H2, 2 * W2, C)


def _bwd_gather(res, g):
    """Gather form: g_x[i,j] = up2(g)[i,j] routed by first-maximal masks
    computed at FULL resolution — pure elementwise work over broadcast
    upsamples, no stack+reshape interleave (the "stack" form's ~0.17 ms
    of 5-D layout copies) and no materialized interior pads (the "pad"
    form's -24.5%, pool_bwd_ab.json).  Position (i, j) with window class
    k receives the gradient iff x[i,j] == m[i//2,j//2] and no earlier
    class (row-major order) attains the max — identical routing to the
    stack form, ties included."""
    x, m = res
    a, b, c, _ = _slices(x)
    um, ug = _up2(m), _up2(g)
    na = _up2(a) != um
    nb = _up2(b) != um
    nc = _up2(c) != um
    _, H, W, _ = x.shape
    pr = jax.lax.broadcasted_iota(jnp.int32, (1, H, 1, 1), 1) % 2
    pc = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W, 1), 2) % 2
    is_a = (pr == 0) & (pc == 0)
    is_b = (pr == 0) & (pc == 1)
    is_c = (pr == 1) & (pc == 0)
    pred_ok = jnp.where(
        is_a, True,
        jnp.where(is_b, na,
                  jnp.where(is_c, na & nb, na & nb & nc)))
    zero = jnp.zeros((), g.dtype)
    return (jnp.where((x == um) & pred_ok, ug, zero),)


_max_pool_2x2_gather.defvjp(_fwd, _bwd_gather)


def _s2d_slices(x):
    """Window slices of a width-packed map [B, H, W/2, 2C] (phase-major
    channel packing: channel p*C+c holds true column 2w'+p).  Window
    order (row, col-phase) = torch's row-major (0,0),(0,1),(1,0),(1,1)."""
    C = x.shape[-1] // 2
    a = x[:, ::2, :, :C]
    b = x[:, ::2, :, C:]
    c = x[:, 1::2, :, :C]
    d = x[:, 1::2, :, C:]
    return a, b, c, d


@jax.custom_vjp
def max_pool_2x2_s2d(x: jax.Array) -> jax.Array:
    """2x2/stride-2 max pool consuming a width-packed (s2d) map
    [B, H, W/2, 2C] and emitting the standard [B, H/2, W/2, C] layout —
    the pool is where the VGG block-1 s2d pipeline re-enters normal
    space.  First-maximal routing identical to max_pool_2x2 (the column
    pair of each window lives in the channel phase halves)."""
    a, b, c, d = _s2d_slices(x)
    return jnp.maximum(jnp.maximum(a, b), jnp.maximum(c, d))


def _s2d_fwd(x):
    a, b, c, d = _s2d_slices(x)
    m = jnp.maximum(jnp.maximum(a, b), jnp.maximum(c, d))
    return m, (x, m)


def _s2d_bwd(res, g):
    x, m = res
    a, b, c, d = _s2d_slices(x)
    ea = a == m
    eb = (b == m) & ~ea
    ec = (c == m) & ~ea & ~eb
    ed = ~(ea | eb | ec)
    zero = jnp.zeros((), g.dtype)
    even = jnp.concatenate(
        [jnp.where(ea, g, zero), jnp.where(eb, g, zero)], axis=-1)
    odd = jnp.concatenate(
        [jnp.where(ec, g, zero), jnp.where(ed, g, zero)], axis=-1)
    B, H2, W2, C2 = even.shape
    out = jnp.stack([even, odd], axis=2).reshape(B, 2 * H2, W2, C2)
    return (out,)


max_pool_2x2_s2d.defvjp(_s2d_fwd, _s2d_bwd)


def max_pool_2x2(x: jax.Array, bwd_impl: str = "stack") -> jax.Array:
    """NHWC 2x2 max pool, stride 2, no padding. H and W must be even.

    ``bwd_impl`` selects the backward formulation (identical values and
    routing): "stack" (interleave via stack+reshape), "pad"
    (interior-padded adds; -24.5%, see _bwd_pad), or "gather" (full-res
    elementwise routing; see _bwd_gather).
    """
    if bwd_impl == "pad":
        return _max_pool_2x2_pad(x)
    if bwd_impl == "gather":
        return _max_pool_2x2_gather(x)
    return _max_pool_2x2_stack(x)
