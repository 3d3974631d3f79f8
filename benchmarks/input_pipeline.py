"""Loader-fed training throughput — the honest end-to-end number.

bench.py measures the jitted texture-GAN step with device-resident
synthetic batches; this benchmark measures SUSTAINED training throughput
with the real input pipeline (VERDICT round-1 weak item #2): synthetic
dataroot on disk (real JPEG/PNG decode, sparse-npz cloth decode,
rois.csv), the threaded prefetching DataLoader, device_put, the jitted
device-side preprocessor, and the fused train step.

Method: epoch 1 warms compile caches; epochs 2+ are timed wall-clock
end to end, closed with a metrics fetch (host sync) so the clock includes
every dispatched step.  Wall-clock over hundreds of steps is robust to
the axon runtime's per-dispatch timing bug (benchmarks/timing.py) because
the final fetch forces completion of the whole chain.

Also reports the loader's standalone decode rate (no device work) so the
host-vs-device bottleneck is explicit.

Usage: python benchmarks/input_pipeline.py [--items 512] [--batch 8]
       [--size 128] [--epochs 2] [--model texture]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_dataroot(root: str, n_items: int, disk_size: int) -> None:
    """Synthetic DeepFashion-layout dataroot: JPEG textures, PNG bodies,
    sparse-npz cloth label maps, rois.csv, normalization stats."""
    from PIL import Image
    from scipy import sparse

    r = np.random.RandomState(0)
    for sub in ("cloth", "body", "texture"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    rois_rows = []
    for i in range(n_items):
        fid = f"img{i:05d}"
        # realistic sparsity: large contiguous label regions, not iid noise
        labels = np.zeros((disk_size, disk_size), dtype=np.uint8)
        for _ in range(6):
            y, x = r.randint(0, disk_size - 8, 2)
            h, w = r.randint(8, disk_size // 2, 2)
            labels[y : y + h, x : x + w] = r.randint(1, 19)
        sparse.save_npz(
            os.path.join(root, "cloth", fid + ".npz"), sparse.csc_matrix(labels)
        )
        img = r.randint(0, 255, (disk_size, disk_size, 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(root, "body", fid + ".png"))
        Image.fromarray(img).save(
            os.path.join(root, "texture", fid + ".jpg"), quality=90
        )
        for _ in range(12):
            x1, y1 = r.randint(0, disk_size // 2, 2)
            rois_rows.append(
                f"{fid},{x1},{y1},{x1 + r.randint(4, disk_size // 2)},"
                f"{y1 + r.randint(4, disk_size // 2)}"
            )
    with open(os.path.join(root, "rois.csv"), "w") as f:
        f.write("id,xmin,ymin,xmax,ymax\n" + "\n".join(rois_rows) + "\n")
    with open(os.path.join(root, "normalization_stats.json"), "w") as f:
        f.write(
            json.dumps({"path": "body", "means": [0.5] * 3, "stds": [0.25] * 3})
            + "\n"
        )
        f.write(
            json.dumps({"path": "texture", "means": [0.5] * 3, "stds": [0.25] * 3})
            + "\n"
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--disk_size", type=int, default=176,
                    help="on-disk image resolution (resized to --size at load)")
    ap.add_argument("--epochs", type=int, default=2, help="timed epochs")
    ap.add_argument("--model", default="texture", choices=["texture", "warp"])
    ap.add_argument("--num_workers", type=int, default=4)
    ap.add_argument("--prefetch", type=int, default=4)
    ap.add_argument("--decode_backend", default="pil",
                    choices=("pil", "native", "draft"),
                    help="image decode path (native = C++ libjpeg/libpng "
                         "fused decode+resize; draft adds DCT-scaled decode)")
    ap.add_argument("--cache_data", action="store_true",
                    help="decoded-file RAM cache: epochs 2+ skip disk decode")
    ap.add_argument("--cache_device", action="store_true",
                    help="HBM-resident dataset: steps ship only index vectors")
    ap.add_argument("--steps_per_call", type=int, default=1,
                    help="with --cache_device: K steps per dispatch (lax.scan)")
    ap.add_argument("--keep_dataroot", default=None,
                    help="reuse/persist the synthetic dataroot at this path")
    args = ap.parse_args()

    from swapnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from swapnet_tpu.data.loader import array_part
    from swapnet_tpu.options import TrainOptions
    from swapnet_tpu.parallel import batch_sharding, create_mesh, replicated_sharding
    from swapnet_tpu.training.registry import (
        create_dataset,
        create_preprocessor,
        create_system,
    )

    if args.keep_dataroot:
        root = args.keep_dataroot
        cleanup = False
        if not os.path.exists(os.path.join(root, "rois.csv")):
            make_dataroot(root, args.items, args.disk_size)
    else:
        root = tempfile.mkdtemp(prefix="swapnet_bench_data_")
        cleanup = True
        make_dataroot(root, args.items, args.disk_size)

    try:
        opt = TrainOptions().parse(
            print_options=False,
            store_options=False,
            args=[
                "--model", args.model, "--name", "bench",
                "--dataroot", root,
                "--load_size", str(args.size), "--crop_size", str(args.size),
                "--batch_size", str(args.batch),
                "--num_workers", str(args.num_workers),
                "--checkpoints_dir", tempfile.mkdtemp(prefix="swapnet_bench_ckpt_"),
                "--decode_backend", args.decode_backend,
            ]
            + (["--cache_data"] if args.cache_data else []),
        )
        dataset, loader = create_dataset(opt)
        loader.prefetch_batches = args.prefetch  # drop_last already set by registry
        system = create_system(opt)
        preprocess = create_preprocessor(opt, dataset)

        mesh = create_mesh(jax.devices()[:1])
        repl = replicated_sharding(mesh)
        data_sh = batch_sharding(mesh)
        rng = jax.random.key(0)

        from swapnet_tpu.training.loop import build_tick

        resident = None
        if args.cache_device:
            from swapnet_tpu.data.device_cache import (
                DeviceDataset, build_resident_tick,
            )

            resident = DeviceDataset(
                dataset, max_items=len(loader),
                num_workers=args.num_workers, sharding=repl,
            )

        first = next(iter(loader))
        arrays = {k: jax.device_put(v, data_sh) for k, v in array_part(first).items()}
        rng, r_pre, r_init = jax.random.split(rng, 3)
        state = jax.device_put(
            system.init_state(r_init, preprocess(r_pre, arrays)), repl
        )
        if resident is not None and args.steps_per_call > 1:
            from swapnet_tpu.data.device_cache import build_resident_scan_tick

            step_fn = build_resident_scan_tick(system, preprocess, resident)
        elif resident is not None:
            step_fn = build_resident_tick(system, preprocess, resident)
        else:
            step_fn = build_tick(system, preprocess)  # the production tick

        epoch_counter = [0]

        def run_epoch(state, rng):
            n = 0
            metrics = None
            epoch_counter[0] += 1
            if resident is not None and args.steps_per_call > 1:
                source = resident.epoch_batches_grouped(
                    args.batch, args.steps_per_call, epoch=epoch_counter[0]
                )
                per_call = args.batch * args.steps_per_call
            elif resident is not None:
                source = resident.epoch_batches(args.batch, epoch=epoch_counter[0])
                per_call = args.batch
            else:
                source = loader
                per_call = args.batch
            for batch in source:
                arrays = {
                    k: jax.device_put(v, data_sh)
                    for k, v in array_part(batch).items()
                }
                state, rng, metrics = step_fn(state, rng, arrays)
                n += per_call
            # close the chain with a REAL host fetch: the axon runtime's
            # block_until_ready can return early (benchmarks/timing.py),
            # but device_get must materialize the last step's metrics,
            # which depend on the whole donated-state chain
            _ = [float(v) for v in jax.device_get(metrics).values()]
            return state, rng, n

        # --- standalone loader rate (host decode only, no device work)
        t0 = time.perf_counter()
        n_host = 0
        for batch in loader:
            n_host += len(batch[next(iter(batch))])
        host_only_sec = time.perf_counter() - t0

        # --- warmup epoch (compiles step + preprocess)
        state, rng, _ = run_epoch(state, rng)

        # --- timed epochs
        t0 = time.perf_counter()
        n_total = 0
        for _ in range(args.epochs):
            state, rng, n = run_epoch(state, rng)
            n_total += n
        sec = time.perf_counter() - t0

        result = {
            "device": str(jax.devices()[0]),
            "model": args.model,
            "config": {
                "items": args.items, "batch": args.batch, "size": args.size,
                "disk_size": args.disk_size, "num_workers": args.num_workers,
                "decode_backend": args.decode_backend,
                "prefetch_batches": args.prefetch, "cache_data": args.cache_data,
                "cache_device": args.cache_device,
                "steps_per_call": args.steps_per_call,
            },
            "loader_only_images_per_sec": round(n_host / host_only_sec, 2),
            "train_images_per_sec": round(n_total / sec, 2),
            "timed_images": n_total,
            "timed_seconds": round(sec, 3),
            "method": "wall-clock over full epochs, closed by a device fetch; "
                       "epoch 1 (compile) excluded",
        }
        out = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "input_pipeline.json"
        )
        # key by config so re-runs under different loader settings append
        # instead of overwriting an incomparable measurement in place
        key = (
            f"{args.model}_b{args.batch}_s{args.size}"
            f"_{args.decode_backend}"
            f"{'_cachedata' if args.cache_data else ''}"
            f"{'_cachedev' if args.cache_device else ''}"
            f"{('_spc' + str(args.steps_per_call)) if args.steps_per_call > 1 else ''}"
        )
        book = {}
        if os.path.exists(out):
            try:
                with open(out) as f:
                    prev = json.load(f)
                # migrate a legacy single-result file into the keyed format
                book = prev if "train_images_per_sec" not in prev else {}
            except (json.JSONDecodeError, OSError):
                book = {}
        book[key] = result
        with open(out, "w") as f:
            json.dump(book, f, indent=2)
        print(json.dumps(result, indent=2))
    finally:
        if cleanup:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
