"""Warp-step A/B: dot-form CE vs lax.reduce CE, and Adafactor, interleaved.

The warp compulsory-bytes floor (compulsory_bytes_warp.json) puts the
step at 52.5% of speed-of-light with params+optimizer traffic dominating
the floor; the trace (trace_report_warp.json) shows ~1.1 ms of CE-loss
fusions operating on 19/128-lane-sparse tensors plus channel reduces
that pin the generator-output layout.  Variants (measure_ab, same
session, canonical harness):

  ce_reduce   round-3 form: optax CE (argmax + max/sum channel reduces)
  ce_dot      dot-with-ones CE for bounded logits (losses/extra.py) —
              the shipped form
  ce_dot_adafactor  ce_dot + Adafactor G/D (factored nu + bf16 momentum;
              round-2 measured +9% alone) — attacks the 1.68 GB/step
              optimizer-state traffic half of the floor

Writes benchmarks/warp_ce_ab.json.  Needs exclusive TPU access.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swapnet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import optax

from __graft_entry__ import _warp_batch
from benchmarks.timing import measure_ab
from swapnet_tpu.training import WarpSystem
from swapnet_tpu.training.optimizers import OptimizerConfig

# warp byte floor 5.67 ms (compulsory_bytes_warp.json), relaxed
FLOOR_S = 4.5e-3


class ReduceCEWarpSystem(WarpSystem):
    """Round-3 CE form, kept ONLY for this A/B (product code ships the
    dot form in WarpSystem.extra_g_losses)."""

    def extra_g_losses(self, fakes, batch, rng, frozen=None):
        labels = jnp.argmax(batch["target_cloths"], axis=-1)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            fakes.astype(jnp.float32), labels
        ).mean()
        return {"loss_G_ce": ce * self.lambda_ce}


def make(cls, **kw):
    system = cls(dtype=jnp.bfloat16, **kw)
    batch = _warp_batch(8, 128)
    state = system.init_state(jax.random.key(0), batch)
    return lambda s: system.train_step(s, batch)[0], state


def main():
    af = dict(
        g_opt=OptimizerConfig(lr=1e-4, name="Adafactor"),
        d_opt=OptimizerConfig(lr=4e-4, weight_decay=0.01, name="Adafactor"),
    )
    variants = {}
    for name, cls, kw in (
        ("ce_reduce", ReduceCEWarpSystem, {}),
        ("ce_dot", WarpSystem, {}),
        ("ce_dot_adafactor", WarpSystem, af),
    ):
        variants[name] = make(cls, **kw)
        print("built", name, flush=True)

    out = measure_ab(variants, k=20, n_rounds=4, min_plausible_s=FLOOR_S)
    for name, m in out.items():
        m["images_per_sec"] = round(8 / m["seconds_per_step"], 2)
        m["seconds_per_step"] = round(m["seconds_per_step"], 6)

    base = out["ce_reduce"]["images_per_sec"]
    result = {
        "device": str(jax.devices()[0]),
        "config": {"model": "warp", "batch": 8, "size": 128},
        "variants": out,
        "delta_vs_ce_reduce_pct": {
            n: round(100.0 * (m["images_per_sec"] - base) / base, 2)
            for n, m in out.items()
        },
        "note": "interleaved same-session A/B (benchmarks/timing.measure_ab)",
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "warp_ce_ab.json"
    )
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
