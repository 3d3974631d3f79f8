"""XLA compiler-flag sweep for the fused texture-GAN train step.

The remaining step-time residuals (benchmarks/trace_report.json: ~1.6 ms
layout copies, 0.46 ms reduce-window, sub-0.25 ms tails) are XLA layout/
fusion decisions, not program structure — the program-level levers were
exhausted in rounds 2-3 (ROADMAP.md negative results).  The remaining
lever is the compiler itself: sweep documented TPU backend flags and
measure the real fused step.

Each variant runs in a fresh subprocess (XLA_FLAGS is read at backend
init).  A probe variant passes an intentionally unknown flag: if it does
NOT fail, XLA_FLAGS never reached the (possibly remote) compiler and the
whole sweep is void — recorded as such.

Writes benchmarks/xla_flags_sweep.json.  Requires exclusive TPU access.

Usage: python benchmarks/xla_flags_sweep.py            # parent sweep
       python benchmarks/xla_flags_sweep.py --child    # one measurement
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = {
    "baseline": "",
    # larger scoped VMEM lets the fusion pass form bigger fusions (fewer
    # HBM round-trips between producer/consumer ops)
    "vmem_32m": "--xla_tpu_scoped_vmem_limit_kib=32768",
    "vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    # disable reduce-window/broadcast fusion (trace shows 0.46 ms of
    # standalone reduce-window; test whether the fusion heuristic hurts)
    "no_rwb_fusion": "--xla_tpu_rwb_fusion=false",
    # flag-propagation probe: MUST fail; success voids the sweep
    "_probe_unknown": "--xla_tpu_this_flag_does_not_exist=1",
}


def child():
    sys.path.insert(0, REPO)
    from swapnet_tpu.utils.cache import enable_compilation_cache

    # flags change codegen; a shared cache would serve stale executables
    enable_compilation_cache("/tmp/xla_sweep_cache_" + os.environ.get("SWEEP_NAME", "x"))

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _texture_batch
    from benchmarks.timing import scan_seconds_per_step
    from swapnet_tpu.training import TextureSystem

    batch, size = 8, 128
    system = TextureSystem(img_size=size, dtype=jnp.bfloat16)
    batch_d = _texture_batch(batch, size)
    state = system.init_state(jax.random.key(0), batch_d)
    fn = lambda s: system.train_step(s, batch_d)[0]
    sec = min(scan_seconds_per_step(fn, state, k=8) for _ in range(2))
    print(json.dumps({"images_per_sec": round(batch / sec, 2),
                      "seconds_per_step": round(sec, 6)}))


def main():
    if "--child" in sys.argv:
        child()
        return

    results = {"config": {"model": "texture", "batch": 8, "size": 128},
               "variants": {}, "note": None}
    for name, flags in VARIANTS.items():
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        env["SWEEP_NAME"] = name
        try:
            # generous: remote compiles through the tunnel have been seen at
            # ~7 min/program and the child compiles up to 6 fori_loop programs
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                env=env, capture_output=True, text=True, timeout=3000, cwd=REPO,
            )
        except subprocess.TimeoutExpired:
            results["variants"][name] = {"flags": flags, "error": "timeout"}
            print(name, results["variants"][name], flush=True)
            continue
        line = next((l for l in p.stdout.splitlines() if l.startswith("{")), None)
        if p.returncode == 0 and line:
            results["variants"][name] = {"flags": flags, **json.loads(line)}
        else:
            tail = (p.stderr or p.stdout).strip().splitlines()[-1:] or ["?"]
            results["variants"][name] = {"flags": flags, "error": tail[0][:200]}
        print(name, results["variants"][name], flush=True)

    probe = results["variants"].get("_probe_unknown", {})
    if "error" not in probe:
        results["note"] = ("VOID: the unknown-flag probe succeeded, so "
                           "XLA_FLAGS does not reach the compiler under "
                           "this runtime; variant numbers are all baseline")
    else:
        results["note"] = ("probe failed as expected: flags reach the "
                           "compiler; differences are real")

    out = os.path.join(REPO, "benchmarks", "xla_flags_sweep.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
