"""Compile-time HBM accounting via XLA's memory analysis.

axon's runtime ``memory_stats()`` lacks peak-bytes keys (round-3
texture_512.json recorded nulls), so peak HBM is taken from the compiled
executable itself: ``jit(fn).lower(args).compile().memory_analysis()``.
This is the scheduler's own allocation plan — arguments + outputs +
temporaries (activations, workspaces) minus donation aliasing — and is
available without running a step or trusting runtime stats.
"""

from __future__ import annotations

from typing import Dict

import jax


def step_memory_analysis(fn, *args, donate_argnums=()) -> Dict:
    """Compile ``fn(*args)`` for the default backend and return the XLA
    memory analysis as a plain dict (bytes), plus a derived peak estimate:
    live arguments + temps + un-aliased outputs."""
    compiled = jax.jit(fn, donate_argnums=donate_argnums).lower(*args).compile()
    ma = compiled.memory_analysis()
    if ma is None:
        return {"error": "memory_analysis unavailable on this backend"}
    fields = [
        "argument_size_in_bytes",
        "output_size_in_bytes",
        "temp_size_in_bytes",
        "alias_size_in_bytes",
        "generated_code_size_in_bytes",
    ]
    out = {f: int(getattr(ma, f)) for f in fields if hasattr(ma, f)}
    arg_b = out.get("argument_size_in_bytes", 0)
    tmp_b = out.get("temp_size_in_bytes", 0)
    out_b = out.get("output_size_in_bytes", 0)
    alias_b = out.get("alias_size_in_bytes", 0)
    # aliased bytes (donated state) are counted in both argument and output
    # sizes but occupy one allocation
    out["peak_hbm_bytes"] = arg_b + tmp_b + max(out_b - alias_b, 0)
    out["peak_hbm_mb"] = round(out["peak_hbm_bytes"] / 1e6, 1)
    return out
