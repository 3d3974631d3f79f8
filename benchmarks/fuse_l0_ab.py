"""A/B: split-form outermost UNet down conv (fuse_l0) on the texture step.

Context (step_accounting.json): the texture generator materializes a
2x-nearest upsample of the 36-channel ROI encoding to 128^2 before the
UNet's first conv — the forward broadcast shows up as the
[8,128,64,36]/[8,64,64,36] broadcast fusions (~0.06 ms) and the backward
as the [128,8,*,36] transpose/copy cluster (~0.3 ms of layout churn).
conv4s2p1 over up2(x) merges exactly into a 3-tap stride-1 conv on the
un-upsampled input (taps w0; w1+w2; w3 per axis — the head_s2d pr=1
row), so the conceptual concat([up2(encoded), cloth]) conv splits into
conv4s2p1(cloth) + conv3s1p1(encoded@64^2): the 128^2 36-channel tensor
never exists in either direction, and the 36-part's conv FLOPs drop 44%
(9 vs 16 taps).  Math-identical (tests/test_layers.py), same param tree
(models/unet._SplitL0Conv).

Interleaved canonical harness; writes benchmarks/fuse_l0_ab.json.
Adopt as default if >= +2%, else record the negative.
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

FLOOR_S = 4.0e-3


def make(fuse_l0):
    system = TextureSystem(img_size=128, dtype=jnp.bfloat16, fuse_l0=fuse_l0)
    batch = _texture_batch(8, 128)
    state = system.init_state(jax.random.key(0), batch)
    return system, batch, (lambda s: system.train_step(s, batch)[0], state)


def parity(sys_a, st_a, sys_b, st_b, batch):
    st_b = st_b.replace(g_params=st_a.g_params, d_params=st_a.d_params)
    _, m_a = jax.jit(sys_a.train_step)(st_a, batch)
    _, m_b = jax.jit(sys_b.train_step)(st_b, batch)
    return {k: {"materialized": float(m_a[k]), "fused": float(m_b[k])}
            for k in m_a}


def main():
    result = {"device": str(jax.devices()[0]),
              "config": {"model": "texture", "batch": 8, "size": 128,
                         "dtype": "bfloat16"}}
    sys_a, batch, (fn_a, st_a) = make(False)
    sys_f, _, (fn_f, st_f) = make(True)
    result["loss_parity"] = parity(sys_a, st_a, sys_f, st_f, batch)
    out = measure_ab(
        {"materialized": (fn_a, st_a), "fused": (fn_f, st_f)},
        k=20, n_rounds=4, min_plausible_s=FLOOR_S,
    )
    for name, m in out.items():
        m["images_per_sec"] = round(8 / m["seconds_per_step"], 2)
        m["seconds_per_step"] = round(m["seconds_per_step"], 6)
    base = out["materialized"]["images_per_sec"]
    result["variants"] = out
    result["delta_pct"] = round(
        100.0 * (out["fused"]["images_per_sec"] - base) / base, 2)

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "fuse_l0_ab.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
