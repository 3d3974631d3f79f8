"""Gradient accumulation (train_step_accum / --grad_accum).

Equivalence law: for mean-reduced losses, averaging K micro-batch
gradients equals the full-batch gradient, so an accumulated step must
reproduce the plain step bit-for-bit on a deterministic system (no
dropout, no label smoothing, no GP).
"""

import jax
import jax.numpy as jnp
import numpy as np

from swapnet_tpu.losses import GANLossConfig
from swapnet_tpu.models.discriminators import PixelDiscriminator
from swapnet_tpu.models.layers import Conv
from swapnet_tpu.training.base_gan_system import BaseGANSystem


class _TinyG:
    """1x1-conv 'generator' — deterministic (no dropout)."""

    def __init__(self):
        self.mod = Conv(features=3, kernel_size=1, stride=1, padding=0)

    def init(self, rngs, x, train):
        return self.mod.init({"params": rngs["params"]}, x)

    def apply(self, variables, x, train, rngs=None, mutable=None):
        out = self.mod.apply(variables, x)
        return (out, {}) if mutable else out


class TinyGAN(BaseGANSystem):
    def __init__(self):
        super().__init__(
            _TinyG().mod,
            PixelDiscriminator(ndf=8),
            gan_cfg=GANLossConfig(gan_mode="lsgan", smooth_labels=False),
        )

    def init_generator(self, rngs, batch):
        return dict(self.G.init({"params": rngs["params"]}, batch["x"]))

    def generator_forward(self, g_params, g_extra, batch, rng, train):
        return self.G.apply({"params": g_params}, batch["x"]), {}

    def d_condition(self, batch, img):
        return img

    def targets(self, batch):
        return batch["y"]

    def extra_g_losses(self, fakes, batch, rng, frozen=None):
        l1 = jnp.mean(jnp.abs(fakes - batch["y"]))
        return {"loss_G_l1": l1 * 10.0}


def _batch(n, seed=0):
    r = np.random.RandomState(seed)
    return {
        "x": jnp.asarray(r.randn(n, 8, 8, 4).astype(np.float32)),
        "y": jnp.asarray(r.randn(n, 8, 8, 3).astype(np.float32)),
    }


def _micro(batch, k):
    return jax.tree.map(
        lambda v: v.reshape((k, v.shape[0] // k) + v.shape[1:]), batch
    )


def test_accum_equals_full_batch_step():
    import optax

    system = TinyGAN()
    # SGD makes the update linear in the gradient, so grad equivalence is
    # exact; Adam's g/sqrt(nu) at step 1 amplifies f32 summation-order
    # noise into ~1e-5 param diffs (the Adam path is covered below)
    system.g_tx = optax.sgd(0.1)
    system.d_tx = optax.sgd(0.1)
    batch = _batch(8)
    state = system.init_state(jax.random.key(0), batch)
    state_b = system.init_state(jax.random.key(0), batch)

    full, m_full = jax.jit(system.train_step)(state, batch)
    acc, m_acc = jax.jit(system.train_step_accum)(state_b, _micro(batch, 4))

    for a, b in zip(jax.tree.leaves(full.g_params), jax.tree.leaves(acc.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree.leaves(full.d_params), jax.tree.leaves(acc.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # micro-averaged loss metrics equal the full-batch losses
    np.testing.assert_allclose(
        float(m_full["loss_G_l1"]), float(m_acc["loss_G_l1"]), atol=1e-5
    )
    np.testing.assert_allclose(
        float(m_full["loss_D"]), float(m_acc["loss_D"]), atol=1e-5
    )
    assert int(acc.step) == 1


def test_accum_texture_system_runs_finite():
    """The real TextureSystem steps under accumulation (dropout + GAN +
    L1; scan over 2 micro-batches) with finite losses and param motion."""
    from __graft_entry__ import _texture_batch
    from swapnet_tpu.training import TextureSystem

    system = TextureSystem(img_size=32, lambda_content=0.0, lambda_style=0.0)
    batch = _micro(_texture_batch(4, 32), 2)
    state = system.init_state(jax.random.key(0), jax.tree.map(lambda v: v[0], batch))
    g_before = jax.tree.map(lambda x: np.asarray(x).copy(), state.g_params)
    state, metrics = jax.jit(system.train_step_accum)(state, batch)
    for name, v in metrics.items():
        assert bool(jnp.isfinite(v).all()), (name, v)
    moved = [
        float(np.abs(np.asarray(a) - b).max())
        for a, b in zip(jax.tree.leaves(state.g_params), jax.tree.leaves(g_before))
    ]
    assert max(moved) > 0.0
