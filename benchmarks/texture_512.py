"""Single-chip 512^2 texture-GAN training benchmark (BASELINE stretch config).

The 512^2 step was only ever validated for correctness on the virtual CPU
mesh (benchmarks/space_shard.py); this measures REAL-chip throughput and
peak HBM, composing the memory levers where needed:

  * batch as large as HBM allows (scanned downward from --batch),
  * --grad_accum (train_step_accum): K micro-batches, one live micro-batch
    of activations, identical effective batch (reference anchor: the U-Net
    deepens with img_size, modules/swapnet_modules.py:177-187 — at 512^2
    the step is activation-memory-bound, which is what accumulation buys
    back).

Writes benchmarks/texture_512.json.  Requires exclusive TPU access.

Usage: python benchmarks/texture_512.py [--batch 8] [--accums 1,2,4]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swapnet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from __graft_entry__ import _texture_batch
from benchmarks.memory import step_memory_analysis
from benchmarks.timing import chain_seconds_per_step
from swapnet_tpu.training import TextureSystem


def micro(batch, k):
    return jax.tree.map(
        lambda v: v.reshape((k, v.shape[0] // k) + v.shape[1:]), batch
    )


def measure(size, batch, accum, k):
    system = TextureSystem(img_size=size, dtype=jnp.bfloat16)
    batch_d = _texture_batch(batch, size)
    state = system.init_state(jax.random.key(0), batch_d)
    if accum > 1:
        mb = micro(batch_d, accum)
        fn = lambda s: system.train_step_accum(s, mb)[0]
    else:
        fn = lambda s: system.train_step(s, batch_d)[0]
    # compile-time memory analysis FIRST (fills the persistent compilation
    # cache, so the chain timing below re-uses the executable); axon's
    # runtime memory_stats() lacks peak keys, this is the scheduler's own
    # allocation plan (benchmarks/memory.py)
    mem = step_memory_analysis(fn, state)
    # chained-dispatch timing: ONE compile (a 512^2 fused step takes >10 min
    # to compile through the remote compiler; the fori_loop slope method
    # would need three such compiles).  Conservative: includes per-dispatch
    # tunnel overhead the fori_loop method cancels.  Plausibility floor
    # (the chain method cannot catch the axon early-return bug on its own,
    # benchmarks/timing.py): compulsory-byte floor of the 128^2 step
    # (3.53 ms, compulsory_bytes.json) scaled by activation area and batch,
    # with a 4x safety margin.
    floor = 3.53e-3 * (size / 128.0) ** 2 * (batch / 8.0) / 4.0
    sec = chain_seconds_per_step(fn, state, k=k, min_plausible_s=floor)
    return {
        "images_per_sec": round(batch / sec, 2),
        "seconds_per_step": round(sec, 5),
        "memory_analysis": mem,
        "peak_hbm_mb": mem.get("peak_hbm_mb"),
        "timing": "chained-dispatch slope (benchmarks/timing.py), "
                  f"min_plausible_s={floor:.4f}",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--accums", default="1,2,4",
                    help="grad_accum values to try at --batch")
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    results = {
        "device": str(jax.devices()[0]),
        "config": {"size": args.size, "batch": args.batch},
        "runs": {},
        "note": "fused texture-GAN train step at 512^2, bf16; grad_accum "
                "K runs K micro-batches per optimizer update (one live "
                "micro-batch of activations; same effective batch). "
                "OOM entries record the failure instead of a number.",
    }
    for accum in [int(a) for a in args.accums.split(",")]:
        if args.batch % accum:
            continue
        key = f"batch{args.batch}_accum{accum}"
        try:
            results["runs"][key] = measure(args.size, args.batch, accum, args.steps)
        except Exception as e:  # OOM or compile failure: record, keep going
            results["runs"][key] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(key, results["runs"][key], flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "texture_512.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
