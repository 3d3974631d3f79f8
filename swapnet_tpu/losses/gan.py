"""Adversarial loss family as pure functions (TPU-native GANLoss).

Functional rework of the reference GANLoss / gradient_penalty
(reference: modules/loss.py:12-184).  Instead of an nn.Module holding
label buffers, labels are drawn from an explicit PRNG key so the whole
G/D objective stays a pure jittable function.

Supported modes (reference choices, models/base_gan.py:26-40):
  vanilla                  BCE-with-logits
  lsgan                    MSE
  wgan / wgan-gp / wgan-lp +/- mean, with optional interpolation penalty
  dragan-gp / dragan-lp    BCE + penalty around the real manifold
  mescheder-r1-gp / r2-gp  BCE + simple grad penalty on real (r1) / fake (r2).
                           NOTE: the reference *lists* these choices but its
                           GANLoss constructor raises on them
                           (modules/loss.py:54-62); here they actually work.

Smooth labels (reference default, --gan_label_mode smooth): one scalar is
drawn per call — real ~ U[0.7, 1.1], fake ~ U[0.0, 0.3].  The reference
has a bug where fake labels are drawn from the *real* range
(modules/loss.py:101-102); set ``compat_fake_label_bug=True`` to reproduce
that behavior bit-for-bit when validating ported checkpoints.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GANLossConfig:
    gan_mode: str = "vanilla"
    smooth_labels: bool = True
    real_range: tuple = (0.7, 1.1)
    fake_range: tuple = (0.0, 0.3)
    compat_fake_label_bug: bool = False

    def __post_init__(self):
        known = (
            "vanilla", "lsgan", "wgan", "wgan-gp", "wgan-lp",
            "dragan", "dragan-gp", "dragan-lp",
            "mescheder-r1-gp", "mescheder-r2-gp",
        )
        if self.gan_mode not in known:
            raise NotImplementedError(f"gan mode {self.gan_mode} not implemented")


def _target(cfg: GANLossConfig, target_is_real: bool, rng: Optional[jax.Array]):
    if cfg.smooth_labels:
        if rng is None:
            raise ValueError("smooth labels require a PRNG key")
        if target_is_real or cfg.compat_fake_label_bug:
            low, high = cfg.real_range
        else:
            low, high = cfg.fake_range
        return jax.random.uniform(rng, (), minval=low, maxval=high)
    return jnp.float32(1.0 if target_is_real else 0.0)


def gan_loss(
    prediction: jax.Array,
    target_is_real: bool,
    cfg: GANLossConfig,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Scalar adversarial loss for a discriminator prediction map."""
    mode = cfg.gan_mode
    pred = prediction.astype(jnp.float32)
    if "wgan" in mode:
        return -jnp.mean(pred) if target_is_real else jnp.mean(pred)
    target = _target(cfg, target_is_real, rng)
    if mode == "lsgan":
        return jnp.mean(jnp.square(pred - target))
    # vanilla / dragan-* / mescheder-*: BCE with logits
    # log-sigmoid formulation is numerically stable on the VPU
    return jnp.mean(
        jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    )


def _penalty_from_grads(grads: jax.Array, penalty_type: str) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(jnp.square(grads.reshape(grads.shape[0], -1)), axis=1) + 1e-12)
    if penalty_type == "gp":
        return jnp.mean(jnp.square(norm - 1.0))
    if penalty_type == "lp":
        return jnp.mean(jnp.square(jnp.maximum(norm - 1.0, 0.0)))
    raise ValueError(penalty_type)


def gradient_penalty(
    d_apply,  # callable x -> prediction (params already bound)
    real: jax.Array,
    fake: Optional[jax.Array],
    gan_mode: str,
    rng: jax.Array,
) -> jax.Array:
    """Gradient penalty via grad-of-grad (reference modules/loss.py:133-184).

    ``d_apply`` must be a pure function of the input image; JAX handles the
    double backprop natively (the torch version needs autograd.grad with
    create_graph=True).
      * wgan-gp/lp : penalty at uniform interpolates between real and fake
      * dragan-*   : penalty around real + 0.5*std(real)*u noise
      * mescheder-r1-gp / r2-gp: simple squared-grad penalty at real / fake
    """
    if gan_mode in ("vanilla", "lsgan", "wgan") or not gan_mode:
        return jnp.float32(0.0)

    grad_fn = jax.grad(lambda x: jnp.sum(d_apply(x).astype(jnp.float32)))

    if gan_mode in ("mescheder-r1-gp", "mescheder-r2-gp"):
        at = real if gan_mode == "mescheder-r1-gp" else fake
        grads = grad_fn(jax.lax.stop_gradient(at))
        flat = grads.reshape(grads.shape[0], -1)
        return 0.5 * jnp.mean(jnp.sum(jnp.square(flat), axis=1))

    r_alpha, r_beta = jax.random.split(rng)
    a = real.astype(jnp.float32)
    if gan_mode.startswith("dragan"):
        beta = jax.random.uniform(r_beta, a.shape)
        b = a + 0.5 * jnp.std(a) * beta
    else:  # wgan-gp / wgan-lp
        b = fake.astype(jnp.float32)
    shape = (a.shape[0],) + (1,) * (a.ndim - 1)
    alpha = jax.random.uniform(r_alpha, shape)
    x = jax.lax.stop_gradient(a + alpha * (b - a))

    penalty_type = "gp" if gan_mode in ("dragan", "wgan-gp", "dragan-gp") else "lp"
    return _penalty_from_grads(grad_fn(x), penalty_type)
