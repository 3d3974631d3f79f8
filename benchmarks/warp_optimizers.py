"""GAN training throughput per stage: AdamW vs Adafactor (factored nu).

``--model warp`` (default): the warp step is compulsory-bytes bound on its
137M-param generator (benchmarks/roofline_warp.json): params f32 r/w + mu
bf16 r/w + nu f32 r/w is ~2.8 GB/step for AdamW.  Adafactor stores the
second moment factored (row/col means, Shazeer & Stern 2018), cutting nu
traffic from ~1.1 GB to ~KBs.  ``--model texture`` runs the same A/B on
the texture stage (smaller params, activation-dominated — expect a smaller
delta).  This measures the realized step-time win on the actual device.

Writes benchmarks/{warp|texture}_optimizers.json.  Run from the repo root
with exclusive device access (no concurrent pytest).
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
import numpy as np

from benchmarks.timing import scan_seconds_per_step
from swapnet_tpu.training import WarpSystem
from swapnet_tpu.training.optimizers import OptimizerConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="warp", choices=("warp", "texture"))
    args = ap.parse_args()

    batch, size, k = 8, 128, 20
    r = np.random.RandomState(0)
    if args.model == "warp":
        onehot = np.eye(19, dtype=np.float32)[r.randint(0, 19, (batch, size, size))]
        batch_d = {
            "bodys": jnp.asarray(r.randn(batch, size, size, 3).astype(np.float32)),
            "input_cloths": jnp.asarray(onehot),
            "target_cloths": jnp.asarray(onehot),
        }
    else:
        from __graft_entry__ import _texture_batch

        batch_d = _texture_batch(batch, size)

    results = {
        "backend": jax.default_backend(), "model": args.model,
        "batch": batch, "size": size,
    }
    for name in ("AdamW", "Adafactor"):
        opts = dict(
            dtype=jnp.bfloat16,
            g_opt=OptimizerConfig(name=name, lr=1e-4),
            d_opt=OptimizerConfig(name=name, lr=4e-4, weight_decay=0.01),
        )
        if args.model == "warp":
            sys_ = WarpSystem(warp_mode="gan", **opts)
        else:
            from swapnet_tpu.training import TextureSystem

            sys_ = TextureSystem(img_size=size, **opts)
        state = sys_.init_state(jax.random.key(0), batch_d)
        opt_bytes = sum(x.nbytes for x in jax.tree.leaves(state.g_opt_state))
        sec = min(
            scan_seconds_per_step(
                lambda s: sys_.train_step(s, batch_d)[0], state, k=k
            )
            for _ in range(2)
        )
        results[name] = {
            "images_per_sec": round(batch / sec, 2),
            "seconds_per_step": round(sec, 5),
            "g_opt_state_mb": round(opt_bytes / 1e6, 1),
        }
        print(name, results[name], flush=True)
        del state

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"{args.model}_optimizers.json",
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
