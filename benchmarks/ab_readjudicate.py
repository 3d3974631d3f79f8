"""Re-adjudicate the round-3 A/Bs under the canonical interleaved harness.

Round 3 measured int8-D ("wash"), remat_perceptual ("-11%") and the
paired-D form ("-3%") with different harnesses in different sessions,
against a recorded same-config spread of 26% — none of those deltas is
trustworthy as recorded (VERDICT r3, weak #2).  This reruns them with
benchmarks/timing.measure_ab: one fori_loop K/2K/4K slope estimate per
variant per round, variants alternating in the SAME session so thermal/
tunnel drift hits all arms equally; spread recorded per variant.

Texture 128^2 batch 8 (the headline config).  Variants:
  base              TextureSystem(bf16) — round-4 default: reference-
                    parity image grams (compat_image_gram=True)
  int8_D            quantize_D=True   (ops/quant.py STE path)
  remat_perceptual  remat_perceptual=True (jax.checkpoint over VGG+grams)
  gatys_feature_gram  compat_image_gram=False — the rounds-1-3 headline
                    config, kept for cross-round comparability

Writes benchmarks/ab_readjudicate.json.  Needs exclusive TPU access.
Usage: python benchmarks/ab_readjudicate.py
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
    return name, fn, state


def main():
    variants = {}
    for name, fn, state in (
        make("base"),
        make("int8_D", quantize_D=True),
        make("remat_perceptual", remat_perceptual=True),
        # rounds 1-3 benched this config (Gatys feature grams was the old
        # default); round 4 flipped the default to reference-parity image
        # grams — this arm keeps the old headline comparable
        make("gatys_feature_gram", compat_image_gram=False),
    ):
        variants[name] = (fn, state)
        print("built", name, flush=True)

    out = measure_ab(variants, k=20, n_rounds=4, min_plausible_s=FLOOR_S)
    for name, m in out.items():
        m["images_per_sec"] = round(8 / m["seconds_per_step"], 2)
        m["seconds_per_step"] = round(m["seconds_per_step"], 6)

    base = out["base"]["images_per_sec"]
    result = {
        "device": str(jax.devices()[0]),
        "config": {"model": "texture", "batch": 8, "size": 128},
        "variants": out,
        "delta_vs_base_pct": {
            n: round(100.0 * (m["images_per_sec"] - base) / base, 2)
            for n, m in out.items()
        },
        "note": "interleaved same-session A/B (benchmarks/timing.measure_ab);"
                " a delta smaller than the larger spread_pct is a wash",
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "ab_readjudicate.json"
    )
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
