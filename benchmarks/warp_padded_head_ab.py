"""A/B: pad the warp generator's output head 19 -> 32 channels, slice after.

The optimized HLO shows the step's single hottest instruction is the
FINAL output conv (UpsamplePadConvTanh, 4x4 -> 19 channels at 128^2)
with the CE math fused in: the compiler's own estimate is ~1.07M cycles
(~1.1 ms) for a conv whose FLOPs are ~78 us at MXU peak — 19 output
channels fill 19 of 128 lanes.  Variant: the head produces 32 channels
and the caller slices [..., :19] after tanh (identical math for the
real channels; the 13 pad channels receive zero gradient through the
slice).  If the emitter tiles N=32 better, up to ~0.9 ms/step is on the
table.

Interleaved canonical harness; writes benchmarks/warp_padded_head_ab.json.
If it wins it becomes a WarpModule option wired to the system (numerics
of the 19 real channels are unchanged); if it loses this file + JSON
record the negative.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swapnet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import flax.linen as nn
import jax
import jax.numpy as jnp

from __graft_entry__ import _warp_batch
from benchmarks.timing import measure_ab
from swapnet_tpu.models.warp import WarpModule
from swapnet_tpu.training import WarpSystem

FLOOR_S = 4.0e-3


class PaddedHeadWarp(nn.Module):
    inner: WarpModule  # configured with cloth_channels=32 (head width)

    @nn.compact
    def __call__(self, body, cloth, train: bool = True):
        return self.inner(body, cloth, train)[..., :19]


class PaddedHeadWarpSystem(WarpSystem):
    def __init__(self, **kw):
        super().__init__(**kw)
        self.G = PaddedHeadWarp(
            inner=WarpModule(cloth_channels=32, dtype=self.G.dtype)
        )


def make(cls):
    system = cls(dtype=jnp.bfloat16)
    batch = _warp_batch(8, 128)
    state = system.init_state(jax.random.key(0), batch)
    return lambda s: system.train_step(s, batch)[0], state


def main():
    variants = {
        "head19": make(WarpSystem),
        "head32_sliced": make(PaddedHeadWarpSystem),
    }
    out = measure_ab(variants, k=20, n_rounds=4, min_plausible_s=FLOOR_S)
    for name, m in out.items():
        m["images_per_sec"] = round(8 / m["seconds_per_step"], 2)
        m["seconds_per_step"] = round(m["seconds_per_step"], 6)
    base = out["head19"]["images_per_sec"]
    result = {
        "device": str(jax.devices()[0]),
        "config": {"model": "warp", "batch": 8, "size": 128},
        "variants": out,
        "delta_vs_head19_pct": {
            n: round(100.0 * (m["images_per_sec"] - base) / base, 2)
            for n, m in out.items()
        },
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "warp_padded_head_ab.json"
    )
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
