"""A/B the two exact ConvTranspose(k4,s2,p1) formulations on the device.

  * lhs_dilation: conv over the 2x-dilated input (3/4 zeros), HWOI kernel
  * subpixel/scatter: one (B*H*W, I) @ (I, 16*O) GEMM + shift-adds
    (swapnet_tpu/models/layers.py:_convt_4s2p1_subpixel)

Run at the texture/warp decoder shapes to decide which form each backend
should use.  Writes benchmarks/convt_forms.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swapnet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from benchmarks.timing import scan_seconds_per_step
from swapnet_tpu.models.layers import _convt_4s2p1_subpixel

SHAPES = [  # (B, H, W, Cin) -> Cout at the warp/UNet decoder stages
    # batch 1: the form choice matters for the CPU-pinned inference config
    ((1, 4, 4, 1024), 1024),
    ((1, 8, 8, 1024), 512),
    ((1, 8, 8, 1024), 256),
    ((1, 16, 16, 768), 128),
    ((1, 32, 32, 384), 64),
]


def dilated(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWOI", "NHWC"),
        preferred_element_type=x.dtype,
    )


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None,
                    help="override batch (default: SHAPES as-is; TPU A/B uses 8)")
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()
    shapes = SHAPES
    if args.batch is not None:
        shapes = [((args.batch,) + xs[1:], co) for xs, co in SHAPES]
    dt = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    out = {"device": str(jax.devices()[0]), "dtype": str(dt.__name__), "shapes": {}}
    for (xs, co) in shapes:
        key = jax.random.fold_in(jax.random.key(0), xs[1] * 1000 + co)
        x = jax.random.normal(key, xs).astype(dt)
        k = jax.random.normal(key, (4, 4, co, xs[-1])).astype(dt)

        # time fwd+bwd (grad wrt x and k) like a train step would pay
        def loss(fn):
            return lambda args: jnp.sum(fn(args[0], args[1]).astype(jnp.float32) ** 2)

        res = {}
        for name, fn in [("lhs_dilation", dilated), ("subpixel", _convt_4s2p1_subpixel)]:
            g = jax.grad(loss(fn))
            step = lambda args: tuple(a + b.astype(a.dtype) for a, b in zip(args, g(args)))
            sec = scan_seconds_per_step(step, (x, k), k=args.steps)
            res[name] = round(sec * 1e6, 1)  # us per fwd+bwd
        res["subpixel_speedup"] = round(res["lhs_dilation"] / res["subpixel"], 3)
        out["shapes"][f"{xs}->{co}"] = res
        print(f"{xs}->{co}", res, flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "convt_forms%s.json" % ("" if jax.default_backend() == "cpu" else "_tpu"))
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
