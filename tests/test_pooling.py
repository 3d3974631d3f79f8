"""max_pool_2x2 (ops/pooling.py): forward and VJP parity.

The custom VJP must match BOTH torch MaxPool2d and lax.reduce_window's
select-and-scatter backward (first maximal element in row-major window
order gets the whole gradient) — post-ReLU feature maps are full of
exact-zero ties, so even tie-breaking is observable in training.
Reference pools via torchvision VGG16's MaxPool2d
(/root/reference/modules/losses/perceptual.py:26-42).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from swapnet_tpu.ops.pooling import max_pool_2x2


def _tied_input(rng, shape):
    """Random floats quantized to few levels so 2x2 windows tie often —
    exercises the tie-breaking path, like post-ReLU zeros do."""
    x = rng.randn(*shape).astype(np.float32)
    x = np.round(x * 2) / 2  # many exact ties incl. zeros
    return np.maximum(x, 0.0)  # ReLU-like: ~half exact zeros


def test_forward_matches_reduce_window():
    rng = np.random.RandomState(0)
    x = _tied_input(rng, (2, 8, 8, 5))
    got = max_pool_2x2(jnp.asarray(x))
    want = nn.max_pool(jnp.asarray(x), (2, 2), strides=(2, 2))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_vjp_matches_torch_maxpool():
    rng = np.random.RandomState(1)
    x = _tied_input(rng, (3, 16, 16, 4))
    g = rng.randn(3, 8, 8, 4).astype(np.float32)

    _, vjp = jax.vjp(max_pool_2x2, jnp.asarray(x))
    (gx,) = vjp(jnp.asarray(g))

    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)), requires_grad=True)
    yt = F.max_pool2d(xt, 2, 2)
    yt.backward(torch.tensor(np.transpose(g, (0, 3, 1, 2))))
    want = np.transpose(xt.grad.numpy(), (0, 2, 3, 1))

    np.testing.assert_array_equal(np.asarray(gx), want)


def test_vjp_matches_reduce_window():
    rng = np.random.RandomState(2)
    x = _tied_input(rng, (2, 8, 8, 3))
    g = rng.randn(2, 4, 4, 3).astype(np.float32)

    _, vjp_a = jax.vjp(max_pool_2x2, jnp.asarray(x))
    (ga,) = vjp_a(jnp.asarray(g))
    _, vjp_b = jax.vjp(
        lambda v: nn.max_pool(v, (2, 2), strides=(2, 2)), jnp.asarray(x)
    )
    (gb,) = vjp_b(jnp.asarray(g))
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))


def test_bf16_and_jit():
    rng = np.random.RandomState(3)
    x = jnp.asarray(_tied_input(rng, (1, 4, 4, 2)), dtype=jnp.bfloat16)
    y = jax.jit(max_pool_2x2)(x)
    assert y.dtype == jnp.bfloat16 and y.shape == (1, 2, 2, 2)
    want = nn.max_pool(x, (2, 2), strides=(2, 2))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(want))


def test_alt_bwds_match_stack_bwd():
    """The 'pad' and 'gather' backwards route gradients identically to
    the stack+reshape form, ties included."""
    import jax
    import jax.numpy as jnp

    from swapnet_tpu.ops.pooling import max_pool_2x2

    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 5))
    # force ties (post-ReLU zeros) to exercise first-maximal routing
    x = jnp.maximum(x, 0.0)

    def loss(impl):
        return lambda t: jnp.sum(
            jnp.cos(max_pool_2x2(t, bwd_impl=impl) * 3.0))

    y_s = max_pool_2x2(x, bwd_impl="stack")
    g_s = jax.grad(loss("stack"))(x)
    for impl in ("pad", "gather"):
        y_i = max_pool_2x2(x, bwd_impl=impl)
        assert float(jnp.max(jnp.abs(y_s - y_i))) == 0.0, impl
        g_i = jax.grad(loss(impl))(x)
        assert float(jnp.max(jnp.abs(g_s - g_i))) == 0.0, impl
