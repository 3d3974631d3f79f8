"""A/B: remat_perceptual (jax.checkpoint over the VGG perceptual block).

Physics (benchmarks/compulsory_bytes.json): the G-loss closure saves
~545 MB of residuals per step — the largest activation block in the
train step, dominated by the (B*C)^2 f32 Gram matrices and VGG taps.
Remat trades those round-trips for ~0.4 ms of MXU recompute.  Counter-
physics (ROADMAP round-2 negative result): rematerializing the
*generator* LOST 10% because the recompute's own HBM writes exceeded
the savings.  Only the chip can break the tie.

Timing method: the remote compiler is slow under today's tunnel
(~7 min/program), so instead of the 3-program fori_loop slope
(benchmarks/timing.py), each variant compiles ONE fori_loop of K steps
and is timed absolutely over several calls.  Early-return detection
(the axon block_until_ready bug): a K-step call faster than K x 4 ms
is physically impossible for this step (measured floor 8.4 ms) and
voids the measurement.

Writes benchmarks/remat_perceptual_ab.json.  Requires exclusive TPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swapnet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from __graft_entry__ import _texture_batch
from swapnet_tpu.training import TextureSystem

K = 48
MIN_PLAUSIBLE_S_PER_STEP = 0.004


def measure(remat: bool, batch_n=8, size=128):
    system = TextureSystem(
        img_size=size, dtype=jnp.bfloat16, remat_perceptual=remat
    )
    batch = _texture_batch(batch_n, size)
    state = system.init_state(jax.random.key(0), batch)
    step = lambda s: system.train_step(s, batch)[0]
    loop = jax.jit(
        lambda s: jax.lax.fori_loop(0, K, lambda i, x: step(x), s)
    )
    t0 = time.time()
    jax.block_until_ready(loop(state))  # compile + first run
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(state))
        best = min(best, time.perf_counter() - t0)
    sec = best / K
    if sec < MIN_PLAUSIBLE_S_PER_STEP:
        return {"error": f"implausible {sec*1e3:.2f} ms/step — "
                         "early-return bug, measurement void"}
    return {
        "images_per_sec": round(batch_n / sec, 2),
        "ms_per_step": round(sec * 1e3, 3),
        "compile_s": round(compile_s, 1),
    }


def main():
    out = {
        "config": {"model": "texture", "batch": 8, "size": 128, "K": K},
        "method": "single fori_loop(K) per variant, absolute best-of-4, "
                  "early-return guard at 4 ms/step",
    }
    for remat in (False, True):
        key = "remat" if remat else "no_remat"
        out[key] = measure(remat)
        print(key, out[key], flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "remat_perceptual_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
