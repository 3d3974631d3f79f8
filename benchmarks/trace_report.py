"""Profiler-trace op breakdown for the texture-GAN train step.

Captures a JAX profiler trace of K steps on the current device, parses the
.xplane.pb (tensorflow.tsl proto, no tensorboard needed), and aggregates
device-side op time per step by HLO category (fusion / convolution / copy
/ reduce / ...).  This is the evidence behind the roofline/DESIGN.md perf
claims: it shows where the step time actually goes and whether epilogues
or layout copies are eating HBM bandwidth.

Usage (exclusive TPU access): python benchmarks/trace_report.py [--steps 5]
Writes benchmarks/trace_report.json.
"""

import argparse
import collections
import glob
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(path: str, steps: int):
    """Aggregate TPU-plane op durations by normalized op name.

    Returns (total_ms_per_step, {category: ms_per_step})."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    per_op = collections.Counter()
    per_instr = collections.Counter()
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            # XLA Ops line carries per-HLO durations; step lines duplicate
            if "XLA Ops" not in line.name and "xla op" not in line.name.lower():
                continue
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                # "%copy-start.15 = (bf16[...](...)) copy-start(...)" ->
                # opcode bucket "copy-start"
                instr = name.split(" = ")[0].lstrip("%")
                base = re.sub(r"[.\d]+$", "", instr)
                per_op[base] += ev.duration_ps
                if not base.endswith("-start"):
                    # keep the full def for the hot-instruction list
                    per_instr[name[:160]] += ev.duration_ps
    if not per_op:
        raise RuntimeError(f"no TPU op events found in {path}")

    # *-start ops report the whole async window (overlapped with compute);
    # everything else is synchronous core occupancy.
    sync = {k: v for k, v in per_op.items() if not k.endswith("-start")}
    async_w = {k: v for k, v in per_op.items() if k.endswith("-start")}
    to_ms = lambda d: {
        k: round(v / 1e9 / steps, 3)
        for k, v in sorted(d.items(), key=lambda kv: -kv[1])
    }
    sync_ms = round(sum(sync.values()) / 1e9 / steps, 3)
    return sync_ms, to_ms(sync), to_ms(async_w), to_ms(per_instr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--model", default="texture", choices=["texture", "warp"])
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    from swapnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _texture_batch
    from swapnet_tpu.training import TextureSystem, WarpSystem

    if args.model == "warp":
        import numpy as _np

        r = _np.random.RandomState(0)
        onehot = _np.eye(19, dtype=_np.float32)[
            r.randint(0, 19, (args.batch, args.size, args.size))
        ]
        system = WarpSystem(dtype=jnp.bfloat16)
        batch_d = {
            "bodys": jnp.asarray(
                r.randn(args.batch, args.size, args.size, 3).astype(_np.float32)
            ),
            "input_cloths": jnp.asarray(onehot),
            "target_cloths": jnp.asarray(onehot),
        }
    else:
        system = TextureSystem(img_size=args.size, dtype=jnp.bfloat16)
        batch_d = _texture_batch(args.batch, args.size)
    state = system.init_state(jax.random.key(0), batch_d)
    step = jax.jit(lambda s: system.train_step(s, batch_d)[0], donate_argnums=0)
    state = step(state)
    state = step(state)
    jax.block_until_ready(state)

    out_dir = tempfile.mkdtemp(prefix="swapnet_trace_")
    jax.profiler.start_trace(out_dir)
    for _ in range(args.steps):
        state = step(state)
    jax.block_until_ready(state)
    jax.profiler.stop_trace()

    pbs = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True)
    if not pbs:
        raise RuntimeError(f"no xplane.pb under {out_dir}")
    sync_ms, sync_ops, async_windows, instrs = parse_xplane(pbs[0], args.steps)

    result = {
        "device": str(jax.devices()[0]),
        "config": {"model": args.model, "batch": args.batch, "size": args.size, "steps": args.steps},
        "sync_device_ms_per_step": sync_ms,
        "sync_ops_ms_per_step": dict(list(sync_ops.items())[: args.top]),
        "async_window_ms_per_step": dict(list(async_windows.items())[: args.top]),
        "hot_instructions_ms_per_step": dict(list(instrs.items())[: args.top]),
        "trace_dir": out_dir,
        "note": "sync ops are core occupancy and should sum to ~wall step "
                 "time; async *-start windows overlap compute (prefetch of "
                 "params/opt-state slices) and are not additive",
    }
    suffix = "" if args.model == "texture" else f"_{args.model}"
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"trace_report{suffix}.json"
    )
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
