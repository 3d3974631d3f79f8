"""A/B: the warp output head as a space-to-depth conv (layers._HeadS2D).

Context (step_accounting_warp.json, ROADMAP round-4 negatives): the
head+CE cluster costs ~1.4 ms of the 9.6 ms warp step — the final
Upsample2x+Conv4 at 19 output channels fills 19/128 MXU lanes and the
tanh/CE elementwise cluster runs at ~10% bandwidth efficiency on the
lane-sparse [8,128,128,19] arrays.  Padding the head to 32 channels was
a wash (warp_padded_head_ab.json): the lane count wasn't the whole
story.  This variant restructures the conv itself: every 4-tap window
over the 2x-upsampled image touches at most 3 distinct input rows/cols,
so the head is ONE 3x3 conv on the 64^2 input producing 4*19=76
channels (one output-parity class each) + a depth-to-space interleave —
math-identical (tested in tests/test_layers.py), 76/128 lanes, quarter
the spatial positions, tanh on the 76-lane array.

Interleaved canonical harness; writes benchmarks/warp_head_s2d_ab.json.
Adopt as default if >= +5% (VERDICT r4 item 3), else this file + JSON
record the negative and the warp step is declared emitter-bound at
batch 8.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swapnet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from __graft_entry__ import _warp_batch
from benchmarks.timing import measure_ab
from swapnet_tpu.training import WarpSystem

FLOOR_S = 4.0e-3


def make(head_impl, warp_mode):
    system = WarpSystem(
        dtype=jnp.bfloat16, head_impl=head_impl, warp_mode=warp_mode)
    batch = _warp_batch(8, 128)
    state = system.init_state(jax.random.key(0), batch)
    return system, batch, (lambda s: system.train_step(s, batch)[0], state)


def parity(sys_a, st_a, sys_b, st_b, batch):
    """Same init params -> the first step's losses must match closely."""
    st_b = st_b.replace(g_params=st_a.g_params,
                        d_params=st_a.d_params)
    _, m_a = jax.jit(sys_a.train_step)(st_a, batch)
    _, m_b = jax.jit(sys_b.train_step)(st_b, batch)
    return {k: {"xla": float(m_a[k]), "s2d": float(m_b[k])} for k in m_a}


def main():
    result = {"device": str(jax.devices()[0]),
              "config": {"model": "warp", "batch": 8, "size": 128,
                         "dtype": "bfloat16"}}
    for mode in ("gan", "ce"):
        sys_x, batch, (fn_x, st_x) = make("xla", mode)
        sys_s, _, (fn_s, st_s) = make("s2d", mode)
        result[f"loss_parity_{mode}"] = parity(sys_x, st_x, sys_s, st_s, batch)
        out = measure_ab(
            {"xla": (fn_x, st_x), "s2d": (fn_s, st_s)},
            k=20, n_rounds=4, min_plausible_s=FLOOR_S,
        )
        for name, m in out.items():
            m["images_per_sec"] = round(8 / m["seconds_per_step"], 2)
            m["seconds_per_step"] = round(m["seconds_per_step"], 6)
        base = out["xla"]["images_per_sec"]
        result[f"variants_{mode}"] = out
        result[f"delta_pct_{mode}"] = round(
            100.0 * (out["s2d"]["images_per_sec"] - base) / base, 2)

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "warp_head_s2d_ab.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
