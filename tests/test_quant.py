"""Int8 quantized discriminator path (ops/quant.py, --quantize_D)."""

import jax
import jax.numpy as jnp
import numpy as np

from swapnet_tpu.ops.quant import conv2d_int8_ste


def _conv_f32(x, k, strides=(1, 1), padding=((1, 1), (1, 1))):
    return jax.lax.conv_general_dilated(
        x, k, strides, padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def test_int8_conv_close_to_f32():
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(2, 16, 16, 8).astype(np.float32))
    k = jnp.asarray((r.randn(4, 4, 8, 16) * 0.1).astype(np.float32))
    y = conv2d_int8_ste(x, k, (2, 2), ((1, 1), (1, 1)))
    ref = _conv_f32(x, k, (2, 2), ((1, 1), (1, 1)))
    rel = float(jnp.abs(y - ref).max() / jnp.abs(ref).max())
    assert rel < 0.03, rel  # int8 per-sample/per-channel scales


def test_int8_conv_ste_gradients():
    """Backward must be the UNQUANTIZED conv's vjp (straight-through):
    pulling back the same cotangent gives identical grads."""
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(2, 8, 8, 4).astype(np.float32))
    k = jnp.asarray((r.randn(3, 3, 4, 8) * 0.2).astype(np.float32))
    g = jnp.asarray(r.randn(2, 8, 8, 8).astype(np.float32))

    _, vjp_q = jax.vjp(lambda x, k: conv2d_int8_ste(x, k, (1, 1), ((1, 1), (1, 1))), x, k)
    _, vjp_f = jax.vjp(lambda x, k: _conv_f32(x, k), x, k)
    dxq, dkq = vjp_q(g)
    dxf, dkf = vjp_f(g)
    # bf16 backward vs f32 reference: tolerance is bf16 rounding
    np.testing.assert_allclose(np.asarray(dxq), np.asarray(dxf), rtol=0, atol=2e-2)
    np.testing.assert_allclose(np.asarray(dkq), np.asarray(dkf), rtol=0, atol=2e-1)


def test_int8_conv_zero_input_safe():
    x = jnp.zeros((1, 8, 8, 4))
    k = jnp.zeros((3, 3, 4, 8))
    y = conv2d_int8_ste(x, k, (1, 1), ((1, 1), (1, 1)))
    assert bool(jnp.isfinite(y).all())
    dx = jax.grad(lambda x: jnp.sum(conv2d_int8_ste(x, k, (1, 1), ((1, 1), (1, 1)))))(x)
    assert bool(jnp.isfinite(dx).all())


def test_quantized_discriminator_train_step():
    """TextureSystem with --quantize_D: one fused train step produces
    finite losses and actually updates the quantized D's params."""
    from __graft_entry__ import _texture_batch
    from swapnet_tpu.training import TextureSystem

    system = TextureSystem(
        img_size=32, lambda_content=0.0, lambda_style=0.0, quantize_D=True
    )
    batch = _texture_batch(2, 32)
    state = system.init_state(jax.random.key(0), batch)
    d_before = jax.tree.map(lambda x: np.asarray(x).copy(), state.d_params)
    state, metrics = jax.jit(system.train_step)(state, batch)
    for name, v in metrics.items():
        assert bool(jnp.isfinite(v).all()), (name, v)
    moved = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - b).max()),
            state.d_params, d_before,
        )
    )
    assert max(moved) > 0.0  # D learned through the int8 convs
