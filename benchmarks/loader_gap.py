"""Decompose the cache_device loader-fed gap (VERDICT r4 item 4).

Round-4 record: --cache_device trains at 979 img/s vs ~1,127 device-only
(-13%), attributed to "tunnel dispatch latency" without decomposition.
This script measures, with the same wall-clock-over-steps method as
input_pipeline.py (chain closed by a device fetch), the texture step at
batch 8 / 128^2 under ladders that isolate each suspect:

  dev_const_idx   resident tick, ONE device-resident index vector reused
                  every step (no host work, no H2D) — pure per-dispatch
                  overhead over the fori_loop device rate
  dev_fresh_idx   resident tick, fresh numpy indices device_put per step
                  (adds the 32 B index H2D through the tunnel)
  dev_epoch_gen   resident tick fed by DeviceDataset.epoch_batches (the
                  production path: adds host shuffle bookkeeping)
  scan_spc{K}     build_resident_scan_tick, K steps per dispatch (adds
                  nothing per step; amortizes dispatch+H2D to 1/K)

A separate noop ladder times an empty jitted fn dispatched the same way
to put a floor on per-dispatch tunnel latency.

Writes benchmarks/loader_gap.json with an attribution table.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swapnet_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _texture_batch
from swapnet_tpu.training import TextureSystem

BATCH, SIZE = 8, 128
STEPS = 400  # per timed run; wall-clock over the chain


def timed(fn_once, steps=STEPS, warmup=40):
    """Wall-clock seconds/step over a dispatched chain closed by fetch."""
    close = fn_once(warmup)  # compile + warm
    jax.device_get(close)
    t0 = time.perf_counter()
    close = fn_once(steps)
    jax.device_get(close)
    return (time.perf_counter() - t0) / steps


def main():
    system = TextureSystem(img_size=SIZE, dtype=jnp.bfloat16)
    batch_d = _texture_batch(BATCH, SIZE)
    state0 = system.init_state(jax.random.key(0), batch_d)

    # device-resident "dataset": N items of the same fields as the loader
    # batch, uint8-free but shape-faithful for the gather cost
    N = 256
    from swapnet_tpu.data.device_cache import (
        DeviceDataset, build_resident_scan_tick, build_resident_tick)

    class _Synth:
        """Minimal dataset view for DeviceDataset: N raw uint8-ish items."""

        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            # raw fields mirror the texture loader contract pre-preprocess
            # (pipelines.prepare_texture_batch: textures_u8/rois/cloth_labels)
            r = np.random.RandomState(i)
            xy1 = r.uniform(0, SIZE // 2, (12, 2))
            wh = r.uniform(4, SIZE // 2, (12, 2))
            rois = np.concatenate([xy1, xy1 + wh], -1).astype("float32")
            return {
                "textures_u8": r.randint(0, 255, (SIZE, SIZE, 3)).astype("uint8"),
                "rois": rois,
                "cloth_labels": r.randint(0, 19, (SIZE, SIZE)).astype("uint8"),
            }

    resident = DeviceDataset(_Synth(N), num_workers=4)

    from swapnet_tpu.data.pipelines import (
        TexturePipelineConfig, prepare_texture_batch)

    cfg = TexturePipelineConfig(
        cloth_channels=19, load_size=SIZE, crop_size=SIZE, crop_bounds=None,
        texture_norm_stats=((0.5, 0.5, 0.5), (0.25, 0.25, 0.25)),
        input_transforms=("hflip",), train=True,
    )

    def preprocess(rng, raw):
        return prepare_texture_batch(cfg, rng, raw)

    tick = build_resident_tick(system, preprocess, resident)
    scan_ticks = {
        k: build_resident_scan_tick(system, preprocess, resident)
        for k in (4, 8, 16)
    }

    # fresh state per ladder (ticks donate state)
    def fresh():
        raw = resident.gather(jnp.arange(BATCH, dtype=jnp.int32))
        b = preprocess(jax.random.key(1), raw)
        return system.init_state(jax.random.key(0), b)

    results = {}

    # --- noop dispatch floor
    @jax.jit
    def noop(x):
        return x + 1

    def run_noop(steps):
        x = jnp.zeros((), jnp.int32)
        for _ in range(steps):
            x = noop(x)
        return x

    results["noop_dispatch_ms"] = round(timed(run_noop) * 1e3, 4)

    # --- dev_const_idx: one resident index vector, reused (no host work)
    state = fresh()
    rng = jax.random.key(2)
    idx_const = {"indices": jnp.arange(BATCH, dtype=jnp.int32)}

    def run_const(steps):
        nonlocal state, rng
        for _ in range(steps):
            state, rng, m = tick(state, rng, idx_const)
        return m["loss_G"]

    results["dev_const_idx_ms"] = round(timed(run_const) * 1e3, 4)

    # --- dev_fresh_idx: new numpy indices device_put each step
    state = fresh()
    rng = jax.random.key(2)
    r = np.random.RandomState(0)

    def run_fresh_idx(steps):
        nonlocal state, rng
        for _ in range(steps):
            idx = {"indices": r.randint(0, N, BATCH).astype(np.int32)}
            state, rng, m = tick(state, rng, idx)
        return m["loss_G"]

    results["dev_fresh_idx_ms"] = round(timed(run_fresh_idx) * 1e3, 4)

    # --- dev_epoch_gen: the production epoch_batches feed
    state = fresh()
    rng = jax.random.key(2)
    epoch = [0]

    def run_epoch_gen(steps):
        nonlocal state, rng
        done, m = 0, None
        while done < steps:
            epoch[0] += 1
            for b in resident.epoch_batches(BATCH, epoch=epoch[0]):
                state, rng, m = tick(state, rng, b)
                done += 1
                if done >= steps:
                    break
        return m["loss_G"]

    results["dev_epoch_gen_ms"] = round(timed(run_epoch_gen) * 1e3, 4)

    # --- scan ticks
    for k, stick in scan_ticks.items():
        state = fresh()
        rng = jax.random.key(2)
        epoch = [0]

        def run_scan(steps, k=k, stick=stick):
            nonlocal state, rng
            done, m = 0, None
            while done < steps:
                epoch[0] += 1
                for b in resident.epoch_batches_grouped(
                        BATCH, k, epoch=epoch[0]):
                    state, rng, m = stick(state, rng, b)
                    done += k
                    if done >= steps:
                        break
            return m["loss_G"]

        results[f"scan_spc{k}_ms"] = round(timed(run_scan) * 1e3, 4)

    for k in sorted(results):
        v = results[k]
        ips = round(BATCH / (v / 1e3), 1) if k != "noop_dispatch_ms" else None
        print(f"{k}: {v} ms" + (f" = {ips} img/s" if ips else ""))

    out = {
        "device": str(jax.devices()[0]),
        "config": {"model": "texture", "batch": BATCH, "size": SIZE,
                   "resident_items": N, "steps": STEPS},
        "results_ms_per_step": results,
        "images_per_sec": {
            k: round(BATCH / (v / 1e3), 1)
            for k, v in results.items() if k != "noop_dispatch_ms"
        },
        "method": "wall-clock over dispatched chain closed by device fetch",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "loader_gap.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
