"""Int8 quantized convolution for discriminator passes (TPU-native).

The v5e/v5p MXU executes int8 matmuls at 2x the bf16 rate; the
discriminator is the natural target because its output only drives a
scalar GAN loss (tolerant of 8-bit noise) while the generator's pixels
are the product.  No reference counterpart (the torch reference is
fp32-only); this is a green-field TPU performance feature behind
``--quantize_D``.

Scheme: symmetric int8 fake-free quantization — the conv itself runs on
int8 operands accumulating into int32 (XLA lowers this to the MXU's int8
path), then rescales:

  x_q  = round(x / s_x)   with s_x  = amax_{per-sample}(|x|) / 127
  w_q  = round(w / s_w)   with s_w  = amax_{per-out-channel}(|w|) / 127
  y    = (x_q ⊛ w_q) * s_x * s_w

Backward: straight-through estimator — gradients are those of the
unquantized conv (standard QAT practice), computed in the caller's
dtype.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_DN = ("NHWC", "HWIO", "NHWC")


def _quantize_sym(t: jax.Array, axes: Tuple[int, ...]):
    """Symmetric int8 quantization; scale over ``axes`` (kept as 1-dims)."""
    amax = jnp.max(jnp.abs(t), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(t / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _conv_f32(x, kernel, strides, padding, dtype):
    return jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype),
        window_strides=strides, padding=padding,
        dimension_numbers=_DN, preferred_element_type=dtype,
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv2d_int8_ste(x: jax.Array, kernel: jax.Array, strides, padding):
    """Int8 conv forward, straight-through (unquantized-conv) backward.

    x: (B, H, W, Cin); kernel: (kh, kw, Cin, Cout) — any float dtype.
    strides/padding: static tuples as for lax.conv_general_dilated.
    Returns the conv output in x.dtype.
    """
    out, _ = _conv2d_int8_fwd(x, kernel, strides, padding)
    return out


def _conv2d_int8_fwd(x, kernel, strides, padding):
    xf = x.astype(jnp.float32)
    kf = kernel.astype(jnp.float32)
    qx, sx = _quantize_sym(xf, axes=(1, 2, 3))   # per-sample
    qw, sw = _quantize_sym(kf, axes=(0, 1, 2))   # per-output-channel
    y32 = jax.lax.conv_general_dilated(
        qx, qw, window_strides=strides, padding=padding,
        dimension_numbers=_DN, preferred_element_type=jnp.int32,
    )
    # sx: (B,1,1,1), sw: (1,1,1,Cout) — rescale broadcasts over both
    y = y32.astype(jnp.float32) * (sx * sw.reshape(1, 1, 1, -1))
    return y.astype(x.dtype), (x, kernel)


def _conv2d_int8_bwd(strides, padding, res, g):
    x, kernel = res
    dtype = jnp.promote_types(x.dtype, jnp.bfloat16)  # bf16 or wider grads
    _, vjp = jax.vjp(
        lambda x_, k_: _conv_f32(x_, k_, strides, padding, dtype), x, kernel
    )
    dx, dk = vjp(g.astype(dtype))
    return dx.astype(x.dtype), dk.astype(kernel.dtype)


conv2d_int8_ste.defvjp(_conv2d_int8_fwd, _conv2d_int8_bwd)
