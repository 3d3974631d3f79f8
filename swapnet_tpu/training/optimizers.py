"""Optimizer factory (optax) — AdamW, AdaBound, and Adafactor.

Mirrors the reference factory (reference: optimizers/__init__.py:37-60):
per-net lr / weight decay with betas shared, selected by name.  AdaBound
is not in optax, so it's implemented here as a gradient transformation
(Luo et al. 2019: Adam with the effective per-parameter step size clipped
into a band that converges to ``final_lr``, blending into SGD).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    name: str = "AdamW"  # AdamW | AdaBound | Adafactor
    lr: float = 1e-4
    b1: float = 0.9
    b2: float = 0.999
    weight_decay: float = 0.0
    final_lr: float = 0.1  # AdaBound only
    gamma: float = 1e-3  # AdaBound bound convergence speed
    # bf16 first moment halves mu's HBM traffic + footprint; with b1=0.9
    # the per-step increment is 0.1*g, well above bf16's 2^-8 resolution
    # relative to mu.  nu stays f32: its 0.001*g^2 increments would be
    # swallowed by bf16 rounding once nu converges.
    mu_dtype: str = "bfloat16"  # bfloat16 | float32
    # LR schedule (TPU-native optional extension: the reference's torch
    # scheduler hooks are commented out upstream, models/base_model.py:122)
    lr_policy: str = "constant"  # constant | linear | cosine
    warmup_steps: int = 0  # linear 0 -> lr warmup prefix
    decay_steps: int = 0  # schedule horizon (incl. warmup); 0 = loop-derived


def make_lr(cfg: OptimizerConfig):
    """Scalar lr for constant/no-warmup configs, else an optax schedule."""
    if cfg.lr_policy == "constant" and not cfg.warmup_steps:
        return cfg.lr
    total = max(int(cfg.decay_steps), cfg.warmup_steps + 1)
    main_steps = max(total - cfg.warmup_steps, 1)
    if cfg.lr_policy == "constant":
        main = optax.constant_schedule(cfg.lr)
    elif cfg.lr_policy == "linear":
        main = optax.linear_schedule(cfg.lr, 0.0, main_steps)
    elif cfg.lr_policy == "cosine":
        main = optax.cosine_decay_schedule(cfg.lr, main_steps)
    else:
        raise NotImplementedError(f"lr_policy [{cfg.lr_policy}]")
    if not cfg.warmup_steps:
        return main
    warmup = optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)
    return optax.join_schedules([warmup, main], [cfg.warmup_steps])


class AdaBoundState(NamedTuple):
    count: chex.Array
    mu: optax.Updates
    nu: optax.Updates


def adabound(
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    final_lr: float = 0.1,
    gamma: float = 1e-3,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    def init_fn(params):
        return AdaBoundState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)
        t = count.astype(jnp.float32)
        lr_t = lr(state.count) if callable(lr) else lr
        bc1 = 1 - b1 ** t
        bc2 = 1 - b2 ** t
        step_size = lr_t * jnp.sqrt(bc2) / bc1
        lower = final_lr * (1 - 1 / (gamma * t + 1))
        upper = final_lr * (1 + 1 / (gamma * t))

        def scaled(m, v):
            denom = jnp.sqrt(v) + eps
            step = jnp.clip(step_size / denom, lower, upper)
            return -step * m

        new_updates = jax.tree.map(scaled, mu, nu)
        if weight_decay:
            assert params is not None
            new_updates = jax.tree.map(
                lambda u, p: u - lr_t * weight_decay * p, new_updates, params
            )
        return new_updates, AdaBoundState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


def define_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    name = cfg.name.lower()
    if "adafactor" in name:
        # TPU-native addition (not in the reference factory): Adafactor with
        # bf16 momentum.  The second moment is stored factored (row/col means
        # per matrix, Shazeer & Stern 2018) instead of per-parameter f32, so a
        # 137M-param warp generator's optimizer traffic drops from ~1.6 GB to
        # ~0.55 GB per step — the warp step is compulsory-bytes bound (see
        # benchmarks/roofline_warp.json).  multiply_by_parameter_scale=False
        # keeps the effective step Adam-like under the reference's small
        # constant lr.
        if cfg.b2 != 0.999:
            import warnings

            warnings.warn(
                "Adafactor ignores --b2: its second-moment decay follows the "
                "Shazeer & Stern schedule 1-(t+1)^-0.8, not a fixed beta2",
                stacklevel=2,
            )
        # optax.adafactor applies weight_decay_rate AFTER lr scaling (raw
        # multiplicative decay per step); scale by lr so --weight_decay means
        # the same thing as under AdamW (effective decay = lr * wd).
        return optax.adafactor(
            learning_rate=make_lr(cfg),
            multiply_by_parameter_scale=False,
            clipping_threshold=1.0,
            momentum=cfg.b1,
            dtype_momentum=jnp.bfloat16,
            # decay stays pinned to the base lr under a schedule (optax
            # applies weight_decay_rate multiplicatively, pre-lr)
            weight_decay_rate=(cfg.lr * cfg.weight_decay) or None,
            factored=True,
        )
    if "adam" in name:
        return optax.adamw(
            make_lr(cfg), b1=cfg.b1, b2=cfg.b2, eps=1e-8,
            weight_decay=cfg.weight_decay,
            mu_dtype=jnp.dtype(cfg.mu_dtype),
        )
    if "adabound" in name:
        return adabound(
            make_lr(cfg), b1=cfg.b1, b2=cfg.b2,
            final_lr=cfg.final_lr, gamma=cfg.gamma, weight_decay=cfg.weight_decay,
        )
    raise NotImplementedError(cfg.name)


def from_options(opt, net: str) -> OptimizerConfig:
    """Build an OptimizerConfig from a reference-style options namespace."""
    if net not in ("G", "D"):
        raise ValueError(f"net arg must be 'D' or 'G', received {net}")
    if net == "D":
        lr, wd = opt.d_lr, opt.d_weight_decay
    else:
        lr, wd = opt.lr, opt.weight_decay
    return OptimizerConfig(
        name=getattr(opt, f"optimizer_{net}"),
        lr=lr,
        b1=getattr(opt, "b1", 0.9),
        b2=getattr(opt, "b2", 0.999),
        weight_decay=wd,
        final_lr=getattr(opt, "final_lr", 0.1),
        lr_policy=getattr(opt, "lr_policy", "constant"),
        warmup_steps=getattr(opt, "lr_warmup_steps", 0),
        # explicit flag wins; else the loop stamps its epoch-derived horizon
        # onto the namespace before create_system (training/loop.py)
        decay_steps=(
            getattr(opt, "lr_decay_steps", 0)
            or getattr(opt, "schedule_total_steps", 0)
        ),
    )
