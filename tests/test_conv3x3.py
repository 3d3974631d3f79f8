"""Pallas im2col conv3x3 (ops/conv3x3.py) vs the XLA emitter.

The kernel replaces XLA's conv emitter for the frozen-VGG block-1 shapes
in the perceptual loss (reference modules/losses/perceptual.py:26-42
extracts features with torchvision VGG16's 3x3 convs).  Everything runs
under the Pallas interpreter on the CPU test backend; the real-TPU
timing lives in benchmarks/conv3x3_micro.json.
"""

import jax
import jax.numpy as jnp
import pytest

from swapnet_tpu.ops.conv3x3 import (
    conv3x3_bias_act, pallas_vmem_ok, shape_ok, _xla_conv)

CASES = [
    # (B, H, W, C, N, dtype, relu)
    (2, 16, 16, 64, 64, jnp.float32, True),    # conv1_2 shape class
    (1, 8, 16, 3, 64, jnp.float32, False),     # conv1_1 shape class
    (2, 16, 16, 64, 3, jnp.float32, True),     # input-grad-to-image class
    (2, 16, 16, 64, 64, jnp.bfloat16, True),   # training dtype
]


@pytest.mark.smoke
@pytest.mark.parametrize("B,H,W,C,N,dt,relu", CASES)
def test_forward_matches_xla(B, H, W, C, N, dt, relu):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), dt)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, N), jnp.float32) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (N,), jnp.float32) * 0.1
    y_p = conv3x3_bias_act(x, w.astype(dt), b.astype(dt), relu, "pallas", True)
    y_x = conv3x3_bias_act(x, w.astype(dt), b.astype(dt), relu, "xla", False)
    a = y_p.astype(jnp.float32)
    r = y_x.astype(jnp.float32)
    tol = 1e-5 if dt == jnp.float32 else 3e-2
    assert float(jnp.max(jnp.abs(a - r))) <= tol * float(jnp.max(jnp.abs(r)) + 1e-9)


@pytest.mark.smoke
@pytest.mark.parametrize("B,H,W,C,N,dt,relu", CASES[:3])
def test_grads_match_xla_autodiff(B, H, W, C, N, dt, relu):
    """dx/dw/db from the custom VJP vs XLA autodiff of the same math."""
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), dt)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, N), jnp.float32) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (N,), jnp.float32) * 0.1

    def f_pallas(x_, w_, b_):
        y = conv3x3_bias_act(x_, w_, b_, relu, "pallas", True)
        return jnp.sum(jnp.sin(y.astype(jnp.float32) * 0.1))

    def f_ref(x_, w_, b_):
        y = _xla_conv(x_, w_) + b_
        if relu:
            y = jax.nn.relu(y)
        return jnp.sum(jnp.sin(y * 0.1))

    gp = jax.grad(f_pallas, (0, 1, 2))(x, w, b)
    gr = jax.grad(f_ref, (0, 1, 2))(x, w, b)
    for a, r, name in zip(gp, gr, ("dx", "dw", "db")):
        a = a.astype(jnp.float32)
        err = float(jnp.max(jnp.abs(a - r)))
        scale = float(jnp.max(jnp.abs(r)) + 1e-9)
        assert err <= 1e-5 * scale, (name, err, scale)


def test_vgg_dispatch_parity():
    """Whole extractor: interpret-mode pallas block == XLA, values + grads.

    Not smoke-marked: grad-of-10-interpreted-kernels takes ~2 min on CPU.
    """
    from swapnet_tpu.models.vgg import VGG16Features

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3), jnp.float32)
    m_x = VGG16Features(conv_impl="xla")
    m_i = VGG16Features(conv_impl="interpret")
    v = m_x.init(jax.random.PRNGKey(0), x)
    # identical param tree as the historical nn.Conv layout (porter contract)
    assert set(v["params"].keys()) == {
        f"conv{b}_{c}" for b, n in ((1, 2), (2, 2), (3, 3), (4, 3), (5, 3))
        for c in range(1, n + 1)
    }
    assert v["params"]["conv1_1"]["kernel"].shape == (3, 3, 3, 64)
    t_x = m_x.apply(v, x)
    t_i = m_i.apply(v, x)
    for a, b in zip(t_x, t_i):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-4

    def loss(mod):
        return lambda x_: sum(
            jnp.sum(jnp.square(t)) for t in mod.apply(v, x_))

    gx = jax.grad(loss(m_x))(x)
    gi = jax.grad(loss(m_i))(x)
    assert float(jnp.max(jnp.abs(gx - gi))) < 1e-3 * float(jnp.max(jnp.abs(gx)))


@pytest.mark.smoke
def test_gates():
    assert shape_ok((8, 128, 128, 64))
    assert not shape_ok((8, 4, 4, 512))
    assert pallas_vmem_ok((8, 128, 128, 64), jnp.bfloat16)
    # f32 at 128^2 double-buffers a ~9 MB padded image block: over budget
    assert not pallas_vmem_ok((8, 128, 128, 64), jnp.float32)
    assert not pallas_vmem_ok((8, 512, 512, 64), jnp.bfloat16)
