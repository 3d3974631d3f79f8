"""Per-pair two-stage swap latency benchmark (BASELINE.json config 5 analog).

Measures p50/p90 of the FUSED warp->texture program at batch 1, 128x128,
bf16 on the current device, plus batched throughput.  Compare with the
reference's CPU two-stage median in BASELINE_MEASURED.json.

Usage: python benchmarks/swap_latency.py [--size 128] [--batch 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from swapnet_tpu.models.texture import TextureModule
    from swapnet_tpu.models.warp import WarpModule
    from swapnet_tpu.swap import FusedSwap

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    warp = WarpModule(dtype=dtype)
    tex = TextureModule(img_size=args.size, dtype=dtype)

    r = jax.random.key(0)
    body = jnp.zeros((1, args.size, args.size, 3))
    cloth = jnp.zeros((1, args.size, args.size, 19))
    texture = jnp.zeros((1, args.size, args.size, 3))
    rois = jnp.tile(
        jnp.asarray([8.0, 8.0, args.size - 8.0, args.size - 8.0]), (1, 12, 1)
    )
    wv = warp.init({"params": r, "dropout": r}, body, cloth, False)
    tv = tex.init({"params": r, "dropout": r}, texture, rois, cloth, False)

    swap = FusedSwap(warp, wv, tex, tv)

    def run(batch):
        b, c, t, ro = (
            jnp.tile(body, (batch, 1, 1, 1)),
            jnp.tile(cloth, (batch, 1, 1, 1)),
            jnp.tile(texture, (batch, 1, 1, 1)),
            jnp.tile(rois, (batch, 1, 1)),
        )
        jax.block_until_ready(swap(b, c, t, ro))  # compile
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            jax.block_until_ready(swap(b, c, t, ro))
            times.append(time.perf_counter() - t0)
        return np.asarray(times)

    lat = run(1)
    p50, p90 = np.percentile(lat, 50) * 1e3, np.percentile(lat, 90) * 1e3
    thr = run(args.batch)
    ips = args.batch / np.median(thr)

    result = {
        "swap_p50_ms": round(float(p50), 3),
        "swap_p90_ms": round(float(p90), 3),
        "swap_batched_images_per_sec": round(float(ips), 2),
        "batch": args.batch,
        "size": args.size,
        "dtype": args.dtype,
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
