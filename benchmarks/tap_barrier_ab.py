"""A/B: optimization_barrier between VGG taps and the content loss.

step_accounting.json (round 4) shows the content-loss per-pixel channel
sums fusing INTO the VGG conv fusions: %fusion.39 (conv1_2 + per-pixel
sums) runs 0.30 ms where the conv alone is ~50 us of MXU and the sums
~40 us of bandwidth — the fused reduction epilogue appears to serialize
the conv's output loop.  Hypothesis: breaking the fusion with
lax.optimization_barrier on each tap lets the conv run at MXU rate and
the loss fusion at bandwidth rate, paying one extra HBM round-trip of
the taps (~2x16 MB for tap 1) — net win if the serialization penalty
exceeds the re-read.

Variants (interleaved, canonical harness): base vs tap_barrier, texture
128^2 batch 8 image-gram program.  Writes benchmarks/tap_barrier_ab.json.
The barrier variant lives HERE (a subclass), not in the product: if it
wins it becomes the unconditional form in losses/perceptual.py; if it
loses this file + the JSON record the negative.
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


class TapBarrierTextureSystem(TextureSystem):
    def extra_g_losses(self, fakes, batch, rng, frozen=None):
        targets = batch["target_textures"]
        out = {}
        if self.lambda_l1:
            l1 = jnp.mean(
                jnp.abs(fakes.astype(jnp.float32) - targets.astype(jnp.float32))
            )
            out["loss_G_l1"] = l1 * self.lambda_l1
        vgg_vars = frozen["vgg"] if frozen is not None else self._vgg_variables
        vgg_apply = lambda x: self.vgg.apply(vgg_vars, x)
        out_f = [
            jax.lax.optimization_barrier(f)
            for f in vgg_apply(2.0 * fakes - 1.0)
        ]
        tgt_f = [
            jax.lax.stop_gradient(jax.lax.optimization_barrier(f))
            for f in vgg_apply(2.0 * targets - 1.0)
        ]
        content = jnp.float32(0.0)
        style = jnp.float32(0.0)
        for o, t in zip(out_f, tgt_f):
            content += _normalized_mse(o, t)
            # image grams (the round-4 default), barrier-free: tiny
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
        "base": make(TextureSystem),
        "tap_barrier": make(TapBarrierTextureSystem),
    }
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
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tap_barrier_ab.json"
    )
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
