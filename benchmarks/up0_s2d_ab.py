"""A/B: the texture UNet's outermost up-conv as a space-to-depth conv.

Context: the warp head's s2d rewrite won +16% (warp_head_s2d_ab.json) by
curing lane-sparsity (19/128 MXU lanes at full spatial resolution).  The
texture generator has the same disease at its RGB head: the outermost
ConvTranspose(k4 s2 p1) emits 3/128 lanes at 128^2.  step_accounting.json
shows the head cluster (%fusion.182/.139 at ~12.6% bandwidth efficiency
+ the %copy.448 [8,128,128,3] layout copy at 1.9%) costing ~0.28 ms of
the 7.0 ms step.  ConvT k4s2p1 decomposes exactly (layers.convt_s2d_kernel,
tested in tests/test_layers.py): each output-parity class is a 2x2-tap
conv, all four fit one 3x3/pad-1 conv emitting 12 lanes at 64^2 positions
+ a depth-to-space interleave.

Interleaved canonical harness; writes benchmarks/up0_s2d_ab.json.
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


def make(up0_impl):
    system = TextureSystem(
        img_size=128, dtype=jnp.bfloat16, up0_impl=up0_impl)
    batch = _texture_batch(8, 128)
    state = system.init_state(jax.random.key(0), batch)
    return system, batch, (lambda s: system.train_step(s, batch)[0], state)


def parity(sys_a, st_a, sys_b, st_b, batch):
    """Same init params -> the first step's losses must match closely."""
    st_b = st_b.replace(g_params=st_a.g_params, d_params=st_a.d_params)
    _, m_a = jax.jit(sys_a.train_step)(st_a, batch)
    _, m_b = jax.jit(sys_b.train_step)(st_b, batch)
    return {k: {"auto": float(m_a[k]), "s2d": float(m_b[k])} for k in m_a}


def main():
    result = {"device": str(jax.devices()[0]),
              "config": {"model": "texture", "batch": 8, "size": 128,
                         "dtype": "bfloat16"}}
    sys_a, batch, (fn_a, st_a) = make("auto")
    sys_s, _, (fn_s, st_s) = make("s2d")
    result["loss_parity"] = parity(sys_a, st_a, sys_s, st_s, batch)
    out = measure_ab(
        {"auto": (fn_a, st_a), "s2d": (fn_s, st_s)},
        k=20, n_rounds=4, min_plausible_s=FLOOR_S,
    )
    for name, m in out.items():
        m["images_per_sec"] = round(8 / m["seconds_per_step"], 2)
        m["seconds_per_step"] = round(m["seconds_per_step"], 6)
    base = out["auto"]["images_per_sec"]
    result["variants"] = out
    result["delta_pct"] = round(
        100.0 * (out["s2d"]["images_per_sec"] - base) / base, 2)

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "up0_s2d_ab.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
