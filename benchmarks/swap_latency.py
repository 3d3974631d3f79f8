"""Per-pair two-stage swap latency benchmark (BASELINE.json config 5 analog).

Measures device-time per fused warp->texture swap at batch 1 (latency) and
batch N (throughput), 128x128 bf16, via the device-side-loop method in
benchmarks/timing.py (host-side dispatch timing is unreliable under the
axon tunnel).  Requires exclusive device access.

Usage: python benchmarks/swap_latency.py [--size 128] [--batch 8]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.timing import scan_seconds_per_iter_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from swapnet_tpu.models.texture import TextureModule
    from swapnet_tpu.models.warp import WarpModule

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    warp = WarpModule(dtype=dtype)
    tex = TextureModule(img_size=args.size, dtype=dtype)

    k = jax.random.key(0)
    S = args.size

    def inputs(B):
        return (
            jnp.zeros((B, S, S, 3)),
            jnp.zeros((B, S, S, 19)),
            jnp.zeros((B, S, S, 3)),
            jnp.tile(jnp.asarray([8.0, 8.0, S - 8.0, S - 8.0]), (B, 12, 1)),
        )

    b1 = inputs(1)
    wv = warp.init({"params": k, "dropout": k}, b1[0], b1[1], False)
    tv = tex.init({"params": k, "dropout": k}, b1[2], b1[3], b1[1], False)

    def swap_iter(carry, wv_, tv_, body, cloth, texture, rois):
        warped = warp.apply(wv_, body + carry * 0, cloth, False)
        onehot = jax.nn.one_hot(jnp.argmax(warped, -1), 19, dtype=warped.dtype)
        out = tex.apply(tv_, texture, rois, onehot, False)
        return jnp.mean(out).astype(jnp.float32)

    sec1 = scan_seconds_per_iter_fn(swap_iter, 50, wv, tv, *inputs(1))
    secN = scan_seconds_per_iter_fn(swap_iter, 30, wv, tv, *inputs(args.batch))

    print(
        json.dumps(
            {
                "swap_device_ms_batch1": round(sec1 * 1e3, 3),
                "swap_batched_images_per_sec": round(args.batch / secN, 2),
                "batch": args.batch,
                "size": args.size,
                "dtype": args.dtype,
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
