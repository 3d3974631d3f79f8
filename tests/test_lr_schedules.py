"""LR schedules (--lr_policy / --lr_warmup_steps / --lr_decay_steps)."""

import jax.numpy as jnp
import numpy as np

from swapnet_tpu.training.optimizers import OptimizerConfig, define_optimizer, make_lr


def test_make_lr_constant_is_scalar():
    assert make_lr(OptimizerConfig(lr=3e-4)) == 3e-4


def test_make_lr_linear_with_warmup():
    sched = make_lr(
        OptimizerConfig(lr=1.0, lr_policy="linear", warmup_steps=2, decay_steps=6)
    )
    vals = [float(sched(i)) for i in range(7)]
    assert vals[0] == 0.0 and abs(vals[2] - 1.0) < 1e-6  # warmup 0 -> lr
    assert vals[3] < vals[2] and abs(vals[6]) < 1e-6  # linear to 0 at horizon


def test_make_lr_cosine_endpoints():
    sched = make_lr(OptimizerConfig(lr=2.0, lr_policy="cosine", decay_steps=10))
    assert abs(float(sched(0)) - 2.0) < 1e-6
    assert float(sched(10)) < 1e-6


def _step_norms(name, policy):
    tx = define_optimizer(
        OptimizerConfig(name=name, lr=1e-2, lr_policy=policy, decay_steps=4)
    )
    p = {"w": jnp.ones((4,))}
    g = {"w": jnp.full((4,), 0.5)}
    state = tx.init(p)
    norms = []
    for _ in range(4):
        upd, state = tx.update(g, state, p)
        norms.append(float(jnp.abs(upd["w"]).max()))
    return norms


def test_adamw_linear_decay_shrinks_updates():
    norms = _step_norms("AdamW", "linear")
    assert norms[0] > norms[-1] > 0.0


def test_adabound_accepts_schedule():
    norms = _step_norms("AdaBound", "linear")
    assert all(np.isfinite(norms)) and norms[0] > norms[-1]


def test_from_options_uses_loop_stamped_horizon():
    from types import SimpleNamespace

    from swapnet_tpu.training.optimizers import from_options

    opt = SimpleNamespace(
        optimizer_G="AdamW", lr=1e-4, weight_decay=0.0,
        d_lr=4e-4, d_weight_decay=0.01,
        lr_policy="cosine", lr_warmup_steps=3, lr_decay_steps=0,
        schedule_total_steps=123,
    )
    cfg = from_options(opt, "G")
    assert cfg.lr_policy == "cosine" and cfg.decay_steps == 123
    opt.lr_decay_steps = 50  # explicit flag wins
    assert from_options(opt, "G").decay_steps == 50
