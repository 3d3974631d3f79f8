"""Warp-step batch scaling: empirical check of the param-bound thesis.

compulsory_bytes_warp.json puts params+optimizer traffic at 3.3 GB of
the 4.6 GB/step floor at batch 8 — if that is what binds the step,
throughput should scale strongly with batch (param traffic amortizes;
activations grow linearly but start small).  This measures img/s at
batch 8/16/32 with the canonical harness.  The REFERENCE config stays
batch 8 (BASELINE config 3) — this records the scaling curve, it does
not move the headline.

Writes benchmarks/warp_batch_scaling.json.  Needs exclusive TPU access.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swapnet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from __graft_entry__ import _warp_batch
from benchmarks.timing import measure
from swapnet_tpu.training import WarpSystem


def main():
    results = {
        "device": str(jax.devices()[0]),
        "config": {"model": "warp", "size": 128, "optimizer": "AdamW"},
        "runs": {},
        "note": "throughput scaling with batch; the headline stays at the "
                "reference batch 8.  Strong scaling here = param/optimizer "
                "traffic dominates (compulsory_bytes_warp.json floor).",
    }
    system = WarpSystem(dtype=jnp.bfloat16)
    for b in (8, 16, 32):
        batch = _warp_batch(b, 128)
        state = system.init_state(jax.random.key(0), batch)
        try:
            m = measure(
                lambda s: system.train_step(s, batch)[0], state,
                k=max(4, 160 // b), n_runs=3,
                min_plausible_s=4.5e-3,  # byte floor at b8; larger b slower
            )
            m["images_per_sec"] = round(b / m["seconds_per_step"], 2)
            m["seconds_per_step"] = round(m["seconds_per_step"], 6)
            results["runs"][f"batch{b}"] = m
        except Exception as e:  # OOM at 32 is a legitimate result
            results["runs"][f"batch{b}"] = {
                "error": f"{type(e).__name__}: {e}"[:300]
            }
        print(f"batch{b}", results["runs"][f"batch{b}"], flush=True)

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "warp_batch_scaling.json"
    )
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
