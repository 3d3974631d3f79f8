"""A/B: flatten per-pixel loss tensors to 1-D before the scalar math.

The optimized HLO shows the per-pixel intermediates of both losses —
so/st/ot in the texture content loss (fusion.36/.39/.40 outputs) and
sum_exp/picked in the warp CE (fusion.10) — materialized as
f32[8,128,128] with layout {0,2,1}: BATCH-minor, so every elementwise
op on them uses 8 of 128 lanes.  Reshaping the (B,H,W,C) operand to
(B*H*W, C) is a free bitcast on the channel-minor layout, and the
per-pixel results become dense 1-D f32[131072] vectors.

Variants (interleaved, canonical harness):
  texture: base vs flat _normalized_mse
  warp:    base vs flat CE
If a flat form wins it becomes the unconditional form in
losses/{perceptual,extra}.py; if it loses, this file + JSON record the
negative.  Writes benchmarks/flat_pixel_ab.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swapnet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from __graft_entry__ import _texture_batch, _warp_batch
from benchmarks.timing import measure_ab
from swapnet_tpu.losses.perceptual import _EPS2, _gram
from swapnet_tpu.training import TextureSystem, WarpSystem


def _flat_normalized_mse(o, t):
    C = o.shape[-1]
    o32 = o.astype(jnp.float32).reshape(-1, C)
    t32 = t.astype(jnp.float32).reshape(-1, C)
    so = jnp.sum(jnp.square(o32), axis=-1)
    st = jnp.sum(jnp.square(t32), axis=-1)
    ot = jnp.sum(o32 * t32, axis=-1)
    den_o = so + _EPS2
    den_t = st + _EPS2
    per_pixel = (
        so / den_o + st / den_t - 2.0 * ot * jax.lax.rsqrt(den_o * den_t)
    )
    return jnp.mean(per_pixel) / C


class FlatContentTextureSystem(TextureSystem):
    def extra_g_losses(self, fakes, batch, rng, frozen=None):
        targets = batch["target_textures"]
        out = {}
        if self.lambda_l1:
            l1 = jnp.mean(
                jnp.abs(fakes.astype(jnp.float32) - targets.astype(jnp.float32))
            )
            out["loss_G_l1"] = l1 * self.lambda_l1
        vgg_vars = frozen["vgg"] if frozen is not None else self._vgg_variables
        out_f = self.vgg.apply(vgg_vars, 2.0 * fakes - 1.0)
        tgt_f = [
            jax.lax.stop_gradient(f)
            for f in self.vgg.apply(vgg_vars, 2.0 * targets - 1.0)
        ]
        content = jnp.float32(0.0)
        style = jnp.float32(0.0)
        for o, t in zip(out_f, tgt_f):
            content += _flat_normalized_mse(o, t)
            go, gt = _gram(fakes), _gram(targets)
            style += jnp.mean(jnp.square(go - jax.lax.stop_gradient(gt)))
        out["loss_G_content"] = content * self.lambda_content
        out["loss_G_style"] = style * self.lambda_style
        return out


class FlatCEWarpSystem(WarpSystem):
    def extra_g_losses(self, fakes, batch, rng, frozen=None):
        C = fakes.shape[-1]
        x = fakes.astype(jnp.float32).reshape(-1, C)
        onehot = batch["target_cloths"].astype(jnp.float32).reshape(-1, C)
        sum_exp = jnp.sum(jnp.exp(x), axis=-1)
        picked = jnp.sum(x * onehot, axis=-1)
        ce = jnp.mean(jnp.log(sum_exp) - picked)
        return {"loss_G_ce": ce * self.lambda_ce}


def make(cls, kind):
    if kind == "texture":
        system = cls(img_size=128, dtype=jnp.bfloat16)
        batch = _texture_batch(8, 128)
    else:
        system = cls(dtype=jnp.bfloat16)
        batch = _warp_batch(8, 128)
    state = system.init_state(jax.random.key(0), batch)
    return lambda s: system.train_step(s, batch)[0], state


def main():
    results = {}
    for kind, base_cls, flat_cls, floor in (
        ("texture", TextureSystem, FlatContentTextureSystem, 2.5e-3),
        ("warp", WarpSystem, FlatCEWarpSystem, 4.5e-3),
    ):
        variants = {
            f"{kind}_base": make(base_cls, kind),
            f"{kind}_flat": make(flat_cls, kind),
        }
        print("built", kind, flush=True)
        out = measure_ab(variants, k=20, n_rounds=4, min_plausible_s=floor)
        for name, m in out.items():
            m["images_per_sec"] = round(8 / m["seconds_per_step"], 2)
            m["seconds_per_step"] = round(m["seconds_per_step"], 6)
        base = out[f"{kind}_base"]["images_per_sec"]
        results[kind] = {
            "variants": out,
            "delta_flat_vs_base_pct": round(
                100.0
                * (out[f"{kind}_flat"]["images_per_sec"] - base)
                / base,
                2,
            ),
        }
        print(kind, results[kind]["delta_flat_vs_base_pct"], flush=True)

    result = {"device": str(jax.devices()[0]), **results}
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "flat_pixel_ab.json"
    )
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
