"""A/B: VGG block 1 width-packed (block1_s2d) on the texture train step.

Context (step_accounting.json): the VGG block-1 convs (64 channels at
128^2, the reference extractor's hottest shapes,
/root/reference/modules/losses/perceptual.py:26-42) run at 7-43%
bandwidth/FLOP efficiency — 64 output channels half-fill the 128-lane
MXU tile.  Packing the width axis into channels (models/vgg.py:s2d_w /
s2d_kernel_w) runs conv1_1/conv1_2 as 128-in/128-out convs at half the
spatial positions: 2x the MACs (half the embedded kernel is zeros) for
full tile occupancy, with the pool re-entering standard layout
(ops/pooling.max_pool_2x2_s2d) and the block-1 tap consumed packed by
the cosine content loss (PerceptualLossConfig.tap1_s2d — numerically
identical, tests/test_losses.py::test_vgg_block1_s2d_loss_parity).

Interleaved canonical harness; writes benchmarks/vgg_s2d_ab.json.
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


def make(block1_s2d):
    system = TextureSystem(img_size=128, dtype=jnp.bfloat16,
                           vgg_block1_s2d=block1_s2d)
    batch = _texture_batch(8, 128)
    state = system.init_state(jax.random.key(0), batch)
    return system, batch, (lambda s: system.train_step(s, batch)[0], state)


def parity(sys_a, st_a, sys_b, st_b, batch):
    st_b = st_b.replace(g_params=st_a.g_params, d_params=st_a.d_params)
    _, m_a = jax.jit(sys_a.train_step)(st_a, batch)
    _, m_b = jax.jit(sys_b.train_step)(st_b, batch)
    return {k: {"unpacked": float(m_a[k]), "s2d": float(m_b[k])}
            for k in m_a}


def main():
    result = {"device": str(jax.devices()[0]),
              "config": {"model": "texture", "batch": 8, "size": 128,
                         "dtype": "bfloat16"}}
    sys_u, batch, (fn_u, st_u) = make(False)
    sys_s, _, (fn_s, st_s) = make(True)
    result["loss_parity"] = parity(sys_u, st_u, sys_s, st_s, batch)
    out = measure_ab(
        {"unpacked": (fn_u, st_u), "s2d": (fn_s, st_s)},
        k=20, n_rounds=4, min_plausible_s=FLOOR_S,
    )
    for name, m in out.items():
        m["images_per_sec"] = round(8 / m["seconds_per_step"], 2)
        m["seconds_per_step"] = round(m["seconds_per_step"], 6)
    base = out["unpacked"]["images_per_sec"]
    result["variants"] = out
    result["delta_pct"] = round(
        100.0 * (out["s2d"]["images_per_sec"] - base) / base, 2)

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "vgg_s2d_ab.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
