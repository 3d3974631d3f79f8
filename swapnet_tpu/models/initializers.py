"""Weight initializers matching the reference's init families.

The reference initializes every Conv/Linear weight with one of
normal / xavier / kaiming / orthogonal and zeroes biases
(reference: modules/__init__.py:7-45).  BatchNorm scale ~ N(1, gain),
bias = 0.

We keep torch's fan conventions so ported checkpoints and freshly
initialized networks share variance statistics:
  * conv weight (O, I, kh, kw):           fan_in = I*kh*kw, fan_out = O*kh*kw
  * conv-transpose weight (I, O, kh, kw): fan_in = O*kh*kw, fan_out = I*kh*kw
Conv kernels are stored HWIO (kh, kw, I, O) and ConvTranspose kernels
HWOI (kh, kw, O, I — see layers.ConvTranspose for the layout rationale).
In BOTH layouts torch's fan_in sits at shape[-2] and fan_out at shape[-1]
(torch's transposed fan_in is the OUTPUT channel count), so the fan math
is layout-uniform; ``transposed`` is kept in the API for documentation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _fans(shape, transposed: bool):
    # HWIO: shape[-2]=I -> fan_in.  HWOI (transposed): shape[-2]=O, which is
    # exactly torch's ConvTranspose2d fan_in (size(1)*rf of (I,O,kh,kw)).
    del transposed  # fan positions are layout-uniform; see module docstring
    *spatial, a, b = shape
    rf = int(np.prod(spatial)) if spatial else 1
    return a * rf, b * rf


def normal_init(gain: float = 0.02):
    def init(key, shape, dtype=jnp.float32):
        return gain * jax.random.normal(key, shape, dtype)

    return init


def xavier_normal_init(gain: float = 0.02, transposed: bool = False):
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fans(shape, transposed)
        std = gain * np.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape, dtype)

    return init


def kaiming_normal_init(transposed: bool = False):
    """kaiming_normal_(a=0, mode='fan_in', nonlinearity='leaky_relu')."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, _ = _fans(shape, transposed)
        std = np.sqrt(2.0) / np.sqrt(fan_in)
        return std * jax.random.normal(key, shape, dtype)

    return init


def orthogonal_init(gain: float = 0.02):
    def init(key, shape, dtype=jnp.float32):
        # torch flattens trailing dims: (rows, cols) = (shape[0], prod(rest))
        # for an HWIO kernel we orthogonalize over (out, everything-else) to
        # match torch's (O, I*kh*kw) flattening, then transpose back.
        flat_out = shape[-1]
        flat_in = int(np.prod(shape[:-1]))
        q = jax.nn.initializers.orthogonal(scale=gain)(
            key, (flat_out, flat_in), dtype
        )
        return q.T.reshape(shape)

    return init


def make_initializer(init_type: str, init_gain: float = 0.02, transposed: bool = False):
    if init_type == "normal":
        return normal_init(init_gain)
    if init_type == "xavier":
        return xavier_normal_init(init_gain, transposed)
    if init_type == "kaiming":
        return kaiming_normal_init(transposed)
    if init_type == "orthogonal":
        return orthogonal_init(init_gain)
    raise NotImplementedError(f"initialization method [{init_type}] is not implemented")
