"""Benchmark the five BASELINE.json configs, write BENCH_DETAILS.json.

  1. single-pair warp-stage inference, 128x128, CPU          (latency)
  2. texture-stage inference with ROI pooling at 512x512     (latency)
  3. warp-stage GAN training, batch 8                        (img/s)
  4. texture-stage GAN training, fused L1+feature+adv        (img/s)
  5. end-to-end batched warp->texture swap pipeline          (img/s)

Configs 2-5 run on the default backend (TPU under the driver); config 1
is pinned to CPU per the baseline spec.  Run from the repo root.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


from benchmarks.timing import scan_seconds_per_iter_fn, scan_seconds_per_step


def config1_warp_inference_cpu():
    """Runs in a subprocess pinned to CPU."""
    import subprocess

    code = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import time, json
import jax
# env var alone does not override the session's axon platform pin; the
# config update is required (see .claude/skills/verify/SKILL.md)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
assert jax.default_backend() == "cpu", jax.default_backend()
from swapnet_tpu.models.warp import WarpModule
m = WarpModule()
body = jnp.zeros((1,128,128,3)); cloth = jnp.zeros((1,128,128,19))
v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(0)}, body, cloth, False)
f = jax.jit(lambda v,b,c: m.apply(v,b,c,False))
jax.block_until_ready(f(v,body,cloth))
ts=[]
for _ in range(10):
    t0=time.perf_counter(); jax.block_until_ready(f(v,body,cloth)); ts.append(time.perf_counter()-t0)
print("RESULT " + json.dumps({"warp_inference_cpu_p50_ms": round(float(np.median(ts))*1e3,2)}))
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(out.stdout + out.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip_cpu", action="store_true")
    ap.add_argument("--size512", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _texture_batch
    from swapnet_tpu.models.texture import TextureModule
    from swapnet_tpu.models.warp import WarpModule
    from swapnet_tpu.swap import FusedSwap
    from swapnet_tpu.training import TextureSystem, WarpSystem

    results = {"backend": jax.default_backend(), "device": str(jax.devices()[0])}

    # ---- config 1: warp inference on CPU ------------------------------
    if not args.skip_cpu:
        results.update(config1_warp_inference_cpu())
        print("config 1 done:", results, flush=True)

    # ---- config 2: texture inference at 512^2 --------------------------
    S = args.size512
    tex512 = TextureModule(img_size=S, dtype=jnp.bfloat16)
    b = {
        "t": jnp.zeros((1, S, S, 3)),
        "r": jnp.tile(jnp.asarray([16.0, 16.0, S - 16.0, S - 16.0]), (1, 12, 1)),
        "c": jnp.zeros((1, S, S, 19)),
    }
    v512 = tex512.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(0)},
        b["t"], b["r"], b["c"], False,
    )

    def tex512_iter(carry, v):
        out = tex512.apply(v, b["t"] + carry * 0, b["r"], b["c"], False)
        return jnp.mean(out).astype(jnp.float32)

    results["texture_inference_512_ms"] = round(
        scan_seconds_per_iter_fn(tex512_iter, 20, v512) * 1e3, 3
    )
    print("config 2 done:", results["texture_inference_512_ms"], "ms", flush=True)
    del v512

    # ---- config 3: warp GAN train, batch 8 -----------------------------
    r = np.random.RandomState(0)
    onehot = np.eye(19, dtype=np.float32)[r.randint(0, 19, (8, 128, 128))]
    warp_batch = {
        "bodys": jnp.asarray(r.randn(8, 128, 128, 3).astype(np.float32)),
        "input_cloths": jnp.asarray(onehot),
        "target_cloths": jnp.asarray(onehot),
    }
    wsys = WarpSystem(warp_mode="gan", dtype=jnp.bfloat16)
    wstate = wsys.init_state(jax.random.key(0), warp_batch)
    sec = scan_seconds_per_step(
        lambda s: wsys.train_step(s, warp_batch)[0], wstate, k=20
    )
    results["warp_gan_train_images_per_sec"] = round(8 / sec, 2)
    print("config 3 done:", results["warp_gan_train_images_per_sec"], "img/s", flush=True)
    del wstate, wsys

    # ---- config 4: texture GAN train (bench.py headline) ----------------
    tsys = TextureSystem(img_size=128, dtype=jnp.bfloat16)
    tb = _texture_batch(8, 128)
    tstate = tsys.init_state(jax.random.key(0), tb)
    sec = scan_seconds_per_step(
        lambda s: tsys.train_step(s, tb)[0], tstate, k=15
    )
    results["texture_gan_train_images_per_sec"] = round(8 / sec, 2)
    print("config 4 done:", results["texture_gan_train_images_per_sec"], "img/s", flush=True)
    del tstate, tsys

    # ---- config 5: end-to-end batched swap pipeline ---------------------
    warp = WarpModule(dtype=jnp.bfloat16)
    tex = TextureModule(img_size=128, dtype=jnp.bfloat16)
    k = jax.random.key(0)
    body = jnp.zeros((8, 128, 128, 3))
    cloth = jnp.zeros((8, 128, 128, 19))
    texture = jnp.zeros((8, 128, 128, 3))
    rois = jnp.tile(jnp.asarray([8.0, 8.0, 120.0, 120.0]), (8, 12, 1))
    wv = warp.init({"params": k, "dropout": k}, body[:1], cloth[:1], False)
    tv = tex.init({"params": k, "dropout": k}, texture[:1], rois[:1], cloth[:1], False)
    swap = FusedSwap(warp, wv, tex, tv)

    def swap_iter(carry, wv_, tv_, b_, c_, t_, r_):
        out = swap._swap(wv_, tv_, b_ + carry * 0, c_, t_, r_)
        return jnp.mean(out).astype(jnp.float32)

    sec8 = scan_seconds_per_iter_fn(
        swap_iter, 30, wv, tv, body, cloth, texture, rois
    )
    results["e2e_swap_batched_images_per_sec"] = round(8 / sec8, 2)
    sec1 = scan_seconds_per_iter_fn(
        swap_iter, 50, wv, tv, body[:1], cloth[:1], texture[:1], rois[:1]
    )
    results["e2e_swap_device_ms_batch1"] = round(sec1 * 1e3, 3)
    print("config 5 done", flush=True)

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_DETAILS.json",
    )
    # merge: other benchmarks (swap_p50, input_pipeline, roofline) record
    # their sections in the same file — don't clobber them
    merged = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged.update(results)
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps(merged, indent=2))


if __name__ == "__main__":
    main()
