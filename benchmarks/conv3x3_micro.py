"""Microbenchmark: Pallas im2col conv3x3 vs XLA's conv emitter at the VGG
block-1 shapes (the 7-43%-efficiency cluster in step_accounting.json).

Interleaved A/B per timing.py's canonical harness.  Shapes measured:
  fwd64:  [8,128,128,64] x [3,3,64,64]   (conv1_2 / its input-grad)
  fwd3:   [8,128,128,3]  x [3,3,3,64]    (conv1_1)
  grad64: forward + custom-VJP input-grad chain of fwd64

Writes benchmarks/conv3x3_micro.json.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benchmarks.timing import measure_ab  # noqa: E402
from swapnet_tpu.ops.conv3x3 import conv3x3_bias_act  # noqa: E402


def main():
    key = jax.random.PRNGKey(0)
    kx, kw, kw3, kb = jax.random.split(key, 4)
    x64 = jax.random.normal(kx, (8, 128, 128, 64), jnp.bfloat16)
    w64 = jax.random.normal(kw, (3, 3, 64, 64), jnp.float32) * 0.05
    x3 = x64[..., :3]
    w3 = jax.random.normal(kw3, (3, 3, 3, 64), jnp.float32) * 0.05

    b64 = jax.random.normal(kb, (64,), jnp.float32) * 0.01

    def fwd64(impl):
        def step(x):
            return (conv3x3_bias_act(x, w64, b64, True, impl) * 0.05).astype(
                jnp.bfloat16)
        return step

    def fwd3(impl):
        def step(x):
            y = conv3x3_bias_act(x, w3, b64, True, impl)  # [B,H,W,64]
            return (y[..., :3] * 0.05).astype(jnp.bfloat16)
        return step

    def grad64(impl):
        def loss(x):
            return jnp.sum(
                conv3x3_bias_act(x, w64, b64, True, impl).astype(jnp.float32)
                * 1e-4)

        def step(x):
            g = jax.grad(loss)(x)
            return (x * 0.5 + g).astype(jnp.bfloat16)
        return step

    results = {}
    for name, builder, state in [
        ("fwd64", fwd64, x64),
        ("fwd3", fwd3, x3),
        ("grad64", grad64, x64),
    ]:
        ab = measure_ab(
            {
                "xla": (builder("xla"), state),
                "pallas": (builder("pallas"), state),
            },
            k=30, n_rounds=4,
        )
        results[name] = ab
        for arm, m in ab.items():
            print(f"{name}/{arm}: {m['seconds_per_step']*1e6:.1f} us/iter "
                  f"(spread {m['spread_pct']}%)")

    out = {
        "device": jax.devices()[0].device_kind,
        "shapes": {"x64": list(x64.shape), "w64": list(w64.shape),
                   "x3": list(x3.shape), "w3": list(w3.shape)},
        "results": results,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "conv3x3_micro.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
