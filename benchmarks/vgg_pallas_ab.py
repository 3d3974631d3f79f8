"""A/B: Pallas im2col VGG convs (ops/conv3x3.py) vs the XLA conv emitter
in the REAL texture train step — the round-4 "only untried lever"
(ROADMAP.md): step accounting put the VGG block-1 cluster at ~1.56 ms of
the 7.0 ms step at 7-43% bandwidth efficiency.

Two arms, interleaved per the canonical harness (benchmarks/timing.py):
  xla     TextureSystem(vgg_conv_impl="xla")   — the round-4 program
  pallas  TextureSystem(vgg_conv_impl="auto")  — auto resolves to the
          Pallas kernel for every VGG conv whose shape fits the VMEM
          budget on the single-chip TPU (all 13 convs at 128^2 input)

Correctness first: one train step per arm from identical state/batch,
G/D losses must be finite and agree to bf16 tolerance.  Writes
benchmarks/vgg_pallas_ab.json.  Needs exclusive TPU access.
Usage: python -u benchmarks/vgg_pallas_ab.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swapnet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from __graft_entry__ import _texture_batch
from benchmarks.timing import measure_ab
from swapnet_tpu.training import TextureSystem

FLOOR_S = 3.0e-3  # compulsory-bytes floor (3.53 ms), slightly relaxed


def make(name, **kw):
    system = TextureSystem(img_size=128, dtype=jnp.bfloat16, **kw)
    batch = _texture_batch(8, 128)
    state = system.init_state(jax.random.key(0), batch)
    fn = lambda s: system.train_step(s, batch)[0]
    step = jax.jit(lambda s: system.train_step(s, batch))
    return name, fn, step, state


def main():
    print("device:", jax.devices()[0], flush=True)
    _, fn_x, step_x, st_x = make("xla", vgg_conv_impl="xla")
    print("built xla arm", flush=True)
    _, fn_p, step_p, st_p = make("pallas", vgg_conv_impl="auto")
    print("built pallas arm", flush=True)

    # --- correctness: one real step per arm, identical init/batch ---
    _, logs_x = jax.block_until_ready(step_x(st_x))
    print("xla step logs:", {k: float(v) for k, v in logs_x.items()}, flush=True)
    _, logs_p = jax.block_until_ready(step_p(st_p))
    print("pallas step logs:", {k: float(v) for k, v in logs_p.items()}, flush=True)
    checks = {}
    for k in logs_x:
        a, b = float(logs_x[k]), float(logs_p[k])
        import math
        assert math.isfinite(a) and math.isfinite(b), (k, a, b)
        checks[k] = {"xla": a, "pallas": b}
        # bf16 train-step losses: same math, different accumulation order
        assert abs(a - b) <= 3e-2 * max(1.0, abs(a)), (k, a, b)
    print("correctness OK", flush=True)

    # --- interleaved timing ---
    out = measure_ab(
        {"xla": (fn_x, st_x), "pallas": (fn_p, st_p)},
        k=20, n_rounds=4, min_plausible_s=FLOOR_S,
    )
    for name, m in out.items():
        m["images_per_sec"] = round(8 / m["seconds_per_step"], 2)
        m["seconds_per_step"] = round(m["seconds_per_step"], 6)
        print(name, m["images_per_sec"], "img/s (spread",
              m["spread_pct"], "%)", flush=True)

    base = out["xla"]["images_per_sec"]
    result = {
        "device": str(jax.devices()[0]),
        "config": {"model": "texture", "batch": 8, "size": 128,
                   "dtype": "bfloat16"},
        "loss_parity": checks,
        "variants": out,
        "delta_pct": round(
            100.0 * (out["pallas"]["images_per_sec"] - base) / base, 2),
        "note": "interleaved same-session A/B (benchmarks/timing.measure_ab);"
                " a delta smaller than the larger spread_pct is a wash",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "vgg_pallas_ab.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
