"""Peak-HBM columns for the headline benchmark configs (VERDICT r3 #4).

Compile-time XLA memory analysis (benchmarks/memory.py) of the fused
train step at the reference configs: texture 128^2 b8, warp 128^2 b8,
and optionally texture 512^2 (--with-512, slow remote compile).

Writes benchmarks/hbm_analysis.json.  Uses the TPU compiler (axon) but
does not need exclusive access — nothing is timed.

Usage: python benchmarks/hbm_analysis.py [--with-512]
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

from __graft_entry__ import _texture_batch, _warp_batch
from benchmarks.memory import step_memory_analysis
from swapnet_tpu.training import TextureSystem, WarpSystem


def texture_cfg(size, batch):
    system = TextureSystem(img_size=size, dtype=jnp.bfloat16)
    b = _texture_batch(batch, size)
    state = system.init_state(jax.random.key(0), b)
    return step_memory_analysis(
        lambda s: system.train_step(s, b)[0], state, donate_argnums=0
    )


def warp_cfg(size, batch):
    system = WarpSystem(dtype=jnp.bfloat16)
    b = _warp_batch(batch, size)
    state = system.init_state(jax.random.key(0), b)
    return step_memory_analysis(
        lambda s: system.train_step(s, b)[0], state, donate_argnums=0
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--with-512", action="store_true")
    args = ap.parse_args()

    out = {
        "device": str(jax.devices()[0]),
        "note": "compile-time XLA memory analysis of the fused train step "
                "(benchmarks/memory.py); peak = args + temps + un-aliased "
                "outputs.  Replaces runtime memory_stats(), which lacks "
                "peak keys under axon.",
        "configs": {},
    }
    out["configs"]["texture_128_b8"] = texture_cfg(128, 8)
    print("texture_128_b8", out["configs"]["texture_128_b8"], flush=True)
    out["configs"]["warp_128_b8"] = warp_cfg(128, 8)
    print("warp_128_b8", out["configs"]["warp_128_b8"], flush=True)
    if args.with_512:
        out["configs"]["texture_512_b8"] = texture_cfg(512, 8)
        print("texture_512_b8", out["configs"]["texture_512_b8"], flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "hbm_analysis.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
