"""A/B: VGG max-pool backward as interior-padded adds vs stack+reshape.

Context (step_accounting.json): the round-4 layout-preserving max-pool's
backward interleaves the four window gradients via stack+reshape, whose
5-D intermediates ([8,64,64,2,64], [8,64,2,128,64]) XLA lays out badly —
the %copy.509/510/511 cluster, ~0.17 ms/step of layout copies.  The
"pad" form (ops/pooling._bwd_pad) scatters each window-position gradient
with lax.pad interior padding instead: every intermediate stays 4-D with
channels minormost.  Identical values and routing
(tests/test_pooling.py::test_pad_bwd_matches_stack_bwd, exact equality).

Round-5 addendum: the "pad" arm measured -24.5% (XLA materializes each
interior-padded tensor full-size).  The "gather" arm routes up2(g) by
first-maximal masks at full resolution — pure elementwise over
broadcast upsamples, no scatter at all (ops/pooling._bwd_gather).

Interleaved canonical harness on the full texture train step; writes
benchmarks/pool_bwd_ab.json.  Adopt if >= +1.5%, else record the
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
from swapnet_tpu.training import TextureSystem

FLOOR_S = 4.0e-3


def make(pool_bwd):
    system = TextureSystem(img_size=128, dtype=jnp.bfloat16,
                           pool_bwd=pool_bwd)
    batch = _texture_batch(8, 128)
    state = system.init_state(jax.random.key(0), batch)
    return system, batch, (lambda s: system.train_step(s, batch)[0], state)


def parity(sys_a, st_a, sys_b, st_b, batch):
    st_b = st_b.replace(g_params=st_a.g_params, d_params=st_a.d_params)
    _, m_a = jax.jit(sys_a.train_step)(st_a, batch)
    _, m_b = jax.jit(sys_b.train_step)(st_b, batch)
    return {k: {"stack": float(m_a[k]), "alt": float(m_b[k])} for k in m_a}


def main():
    result = {"device": str(jax.devices()[0]),
              "config": {"model": "texture", "batch": 8, "size": 128,
                         "dtype": "bfloat16"}}
    sys_s, batch, (fn_s, st_s) = make("stack")
    sys_g, _, (fn_g, st_g) = make("gather")
    result["loss_parity"] = parity(sys_s, st_s, sys_g, st_g, batch)
    out = measure_ab(
        {"stack": (fn_s, st_s), "gather": (fn_g, st_g)},
        k=20, n_rounds=4, min_plausible_s=FLOOR_S,
    )
    for name, m in out.items():
        m["images_per_sec"] = round(8 / m["seconds_per_step"], 2)
        m["seconds_per_step"] = round(m["seconds_per_step"], 6)
    base = out["stack"]["images_per_sec"]
    result["variants"] = out
    result["delta_pct"] = round(
        100.0 * (out["gather"]["images_per_sec"] - base) / base, 2)

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "pool_bwd_gather_ab.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
