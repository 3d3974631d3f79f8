"""Per-instruction accounting of the texture-step residual time.

VERDICT r3 #1 (branch B): "a per-instruction table in
compulsory_bytes.json assigning every remaining ms to compulsory
bytes/FLOPs".  This captures a profiler trace of the train step and, for
every synchronous HLO instruction above a time threshold, parses the
operand/output shapes out of the HLO def string to estimate its HBM
traffic, then compares instruction time against that traffic at peak
bandwidth (819 GB/s):

  bandwidth_eff_pct ~ 100   the instruction is moving its bytes at
                            speed-of-light; the TIME is explained by the
                            BYTES.  Whether the bytes themselves are
                            compulsory is then a program-level question
                            (copies: no; loss/optimizer reads: counted
                            in the compulsory_bytes.json floor).
  bandwidth_eff_pct << 100  the instruction is compute- or
                            latency-bound (MXU convs: check the flops
                            column instead) or running inefficiently.

Conv fusions are byte-inefficient by design (they are MXU-bound); the
table classifies them separately rather than pretending a byte floor
explains them — compare their total against the FLOP floor in
compulsory_bytes*.json.

Caveats (kept honest): operand bytes assume each operand is read once
from HBM (fusion-internal reuse makes this an upper bound on compulsory
traffic for that instruction); shapes come from the def string, so
fusion-internal temporaries are invisible (lower bound).  The two
opposite biases are why the table reports both the estimate and the
classification rather than a single verdict bit.

Usage (exclusive TPU): python benchmarks/step_accounting.py [--model texture]
Writes benchmarks/step_accounting{_warp}.json.
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

HBM_GBPS = 819.0
BF16_TFLOPS = 197.0

_ITEM = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
         "u8": 1, "pred": 1, "s64": 8, "u64": 8, "f64": 8}
_SHAPE_RE = re.compile(r"\b(f32|bf16|f16|f64|s64|u64|s32|u32|s8|u8|pred)\[([\d,]*)\]")


def _shapes(def_line):
    out = []
    for dtype, dims in _SHAPE_RE.findall(def_line):
        elems = 1
        if dims:
            for d in dims.split(","):
                elems *= int(d)
        out.append((dtype, elems, elems * _ITEM[dtype]))
    return out


def classify(instr):
    base = instr.split(" = ")[0].lstrip("%")
    base = re.sub(r"[.\d]+$", "", base)
    if base in ("copy", "copy-done", "copy-start"):
        return "layout-copy (non-compulsory)"
    if "convolution" in instr or "custom-call" in instr:
        return "conv"
    if "reduce" in base or "_reduce_" in base:
        return "reduction"
    if base == "fusion":
        return "fusion"
    return base


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="texture", choices=["texture", "warp"])
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--min-ms", type=float, default=0.02)
    args = ap.parse_args()

    from swapnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _texture_batch, _warp_batch
    from swapnet_tpu.training import TextureSystem, WarpSystem

    if args.model == "warp":
        system = WarpSystem(dtype=jnp.bfloat16)
        batch_d = _warp_batch(args.batch, args.size)
    else:
        system = TextureSystem(img_size=args.size, dtype=jnp.bfloat16)
        batch_d = _texture_batch(args.batch, args.size)
    state = system.init_state(jax.random.key(0), batch_d)
    step = jax.jit(lambda s: system.train_step(s, batch_d)[0], donate_argnums=0)
    state = step(state)
    state = step(state)
    jax.block_until_ready(state)

    out_dir = tempfile.mkdtemp(prefix="swapnet_acct_")
    jax.profiler.start_trace(out_dir)
    for _ in range(args.steps):
        state = step(state)
    jax.block_until_ready(state)
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pbs = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True)
    xs = xplane_pb2.XSpace()
    with open(pbs[0], "rb") as f:
        xs.ParseFromString(f.read())

    per_instr = collections.Counter()
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if "XLA Ops" not in line.name and "xla op" not in line.name.lower():
                continue
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                instr = name.split(" = ")[0].lstrip("%")
                if re.sub(r"[.\d]+$", "", instr).endswith("-start"):
                    continue  # async window, overlapped
                per_instr[name] += ev.duration_ps

    rows = []
    total_ms = 0.0
    for name, ps in sorted(per_instr.items(), key=lambda kv: -kv[1]):
        ms = ps / 1e9 / args.steps
        total_ms += ms
        if ms < args.min_ms:
            continue
        shapes = _shapes(name)
        bytes_all = sum(b for _, _, b in shapes)
        floor_ms = bytes_all / (HBM_GBPS * 1e9) * 1e3
        eff = round(100.0 * floor_ms / ms, 1) if ms else None
        rows.append({
            "ms": round(ms, 4),
            "class": classify(name),
            "est_bytes_mb": round(bytes_all / 1e6, 2),
            "byte_floor_ms": round(floor_ms, 4),
            "bandwidth_eff_pct": eff,
            "instr": name[:240],
        })

    by_class = collections.Counter()
    for r in rows:
        by_class[r["class"]] += r["ms"]

    result = {
        "device": str(jax.devices()[0]),
        "config": {"model": args.model, "batch": args.batch,
                   "size": args.size, "steps": args.steps},
        "sync_total_ms_per_step": round(total_ms, 3),
        "tabled_ms": round(sum(r["ms"] for r in rows), 3),
        "ms_by_class": {k: round(v, 3) for k, v in by_class.most_common()},
        "rows": rows,
        "method": "per-HLO durations from the profiler xplane; bytes from "
                  "the def-string shapes (operands read once + outputs); "
                  "floor at 819 GB/s.  eff~100 => time explained by bytes; "
                  "whether bytes are compulsory is the program-level "
                  "question answered by compulsory_bytes*.json.",
    }
    suffix = "" if args.model == "texture" else f"_{args.model}"
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"step_accounting{suffix}.json",
    )
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "rows"}, indent=1))
    for r in rows[:25]:
        print(f"{r['ms']:8.3f} ms  eff={str(r['bandwidth_eff_pct']):>6}%  "
              f"{r['class'][:28]:28} {r['instr'][:90]}")


if __name__ == "__main__":
    main()
