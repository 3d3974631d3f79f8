"""A/B: width-packed inputs for the D's lane-sparse stride-2 convs.

Context: the PatchGAN runs three times per fused GAN step (D-update fake
+ real, G-update fake) plus two backwards; its first two convs (22-in
and 64-in at 128^2/64^2) half-fill the MXU's 128-lane input tile.  The
same width-packing that won +4.5% on VGG block 1 (vgg_s2d_ab.json)
applies more cheaply here: for stride-2 convs the phase axis is consumed
by the stride, so the packed conv ([4,3,2C,O] kernel at strides (2,1),
layers.conv4s2p1_in_kernel) emits the standard layout directly — no
depth-to-space — at 1.5x the MACs for 2x the input-lane occupancy.
Identical math and param tree (tests/test_layers.py).

Interleaved canonical harness on the full texture train step; writes
benchmarks/d_s2d_ab.json.  Adopt if >= +1.5%, else record the negative.
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


def make(d_conv_impl):
    system = TextureSystem(img_size=128, dtype=jnp.bfloat16,
                           d_conv_impl=d_conv_impl)
    batch = _texture_batch(8, 128)
    state = system.init_state(jax.random.key(0), batch)
    return system, batch, (lambda s: system.train_step(s, batch)[0], state)


def parity(sys_a, st_a, sys_b, st_b, batch):
    st_b = st_b.replace(g_params=st_a.g_params, d_params=st_a.d_params)
    _, m_a = jax.jit(sys_a.train_step)(st_a, batch)
    _, m_b = jax.jit(sys_b.train_step)(st_b, batch)
    return {k: {"auto": float(m_a[k]), "s2d_in": float(m_b[k])}
            for k in m_a}


def main():
    result = {"device": str(jax.devices()[0]),
              "config": {"model": "texture", "batch": 8, "size": 128,
                         "dtype": "bfloat16"}}
    sys_a, batch, (fn_a, st_a) = make("auto")
    sys_s, _, (fn_s, st_s) = make("s2d_in")
    result["loss_parity"] = parity(sys_a, st_a, sys_s, st_s, batch)
    out = measure_ab(
        {"auto": (fn_a, st_a), "s2d_in": (fn_s, st_s)},
        k=20, n_rounds=4, min_plausible_s=FLOOR_S,
    )
    for name, m in out.items():
        m["images_per_sec"] = round(8 / m["seconds_per_step"], 2)
        m["seconds_per_step"] = round(m["seconds_per_step"], 6)
    base = out["auto"]["images_per_sec"]
    result["variants"] = out
    result["delta_pct"] = round(
        100.0 * (out["s2d_in"]["images_per_sec"] - base) / base, 2)

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "d_s2d_ab.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
