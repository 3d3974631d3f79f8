"""A/B: one batch-2B VGG pass for (fake, target) vs two batch-B passes.

The optimized HLO shows the VGG block-1 convs scheduled with the
"EmitAllBatchInSublanes" emitter at an estimated ~645K cycles for
conv1_2 (~0.69 ms, ~7% MXU) — batch 8 fills the 8 sublanes and spatial
is tiled 16x16.  Hypothesis: doubling the conv batch (fake and target
concatenated into one 2B apply) halves the number of such passes and
may tile better.  Unlike the round-3 paired-D negative (16 MB concat),
the VGG input concat is only 2x [8,128,128,3] bf16 = 786 KB.

Gradient correctness: taps are split back into (fake, target) halves
before the loss; the target half gets stop_gradient exactly as before.

Variants interleaved (canonical harness).  Writes
benchmarks/vgg_pair_ab.json.  If it wins it becomes the unconditional
form in losses/perceptual.py; if it loses this file + JSON record the
negative.
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
from swapnet_tpu.losses.perceptual import _gram, _normalized_mse
from swapnet_tpu.training import TextureSystem

FLOOR_S = 2.5e-3


class PairedVGGTextureSystem(TextureSystem):
    def extra_g_losses(self, fakes, batch, rng, frozen=None):
        targets = batch["target_textures"]
        out = {}
        if self.lambda_l1:
            l1 = jnp.mean(
                jnp.abs(fakes.astype(jnp.float32) - targets.astype(jnp.float32))
            )
            out["loss_G_l1"] = l1 * self.lambda_l1
        vgg_vars = frozen["vgg"] if frozen is not None else self._vgg_variables
        B = fakes.shape[0]
        both = jnp.concatenate(
            [2.0 * fakes - 1.0, jax.lax.stop_gradient(2.0 * targets - 1.0)],
            axis=0,
        )
        taps = self.vgg.apply(vgg_vars, both)
        content = jnp.float32(0.0)
        style = jnp.float32(0.0)
        for f in taps:
            o, t = f[:B], jax.lax.stop_gradient(f[B:])
            content += _normalized_mse(o, t)
            go, gt = _gram(fakes), _gram(targets)
            style += jnp.mean(jnp.square(go - jax.lax.stop_gradient(gt)))
        out["loss_G_content"] = content * self.lambda_content
        out["loss_G_style"] = style * self.lambda_style
        return out


def make(cls):
    system = cls(img_size=128, dtype=jnp.bfloat16)
    batch = _texture_batch(8, 128)
    state = system.init_state(jax.random.key(0), batch)
    return lambda s: system.train_step(s, batch)[0], state


def main():
    variants = {
        "base_two_passes": make(TextureSystem),
        "paired_one_pass": make(PairedVGGTextureSystem),
    }
    out = measure_ab(variants, k=20, n_rounds=4, min_plausible_s=FLOOR_S)
    for name, m in out.items():
        m["images_per_sec"] = round(8 / m["seconds_per_step"], 2)
        m["seconds_per_step"] = round(m["seconds_per_step"], 6)
    base = out["base_two_passes"]["images_per_sec"]
    result = {
        "device": str(jax.devices()[0]),
        "config": {"model": "texture", "batch": 8, "size": 128},
        "variants": out,
        "delta_vs_base_pct": {
            n: round(100.0 * (m["images_per_sec"] - base) / base, 2)
            for n, m in out.items()
        },
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "vgg_pair_ab.json"
    )
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
