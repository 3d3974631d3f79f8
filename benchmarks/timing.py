"""Trustworthy device timing under the axon tunnel.

The experimental axon runtime's ``block_until_ready`` intermittently
returns before execution completes (observed: a 30-step warp-GAN chain
"finishing" in 1.8 ms against a >4 ms/step memory bound), so host-side
per-dispatch timing is unreliable in BOTH directions.  The robust method:

  * run K iterations inside ONE jitted ``lax.fori_loop`` program
    (single dispatch, device-side loop),
  * time several calls, take the best,
  * require ~linear scaling between K and 2K programs — a constant-time
    result means the runtime returned early and the measurement is void.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def _time_call(f, *args, repeats: int = 3) -> float:
    jax.block_until_ready(f(*args))  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _slope_seconds(loop_builder: Callable[[int], Callable], arg, k: int) -> float:
    """Seconds/iter as the slope between K- and 2K-iteration programs
    (cancels the constant dispatch overhead), cross-validated against the
    2K->4K slope.  Raises if the two slopes disagree (early-return bug or
    contention) or a slope is non-positive."""
    t1 = _time_call(loop_builder(k), arg)
    t2 = _time_call(loop_builder(2 * k), arg)
    t4 = _time_call(loop_builder(4 * k), arg)
    s_a = (t2 - t1) / k
    s_b = (t4 - t2) / (2 * k)
    if s_a <= 0 or s_b <= 0 or not (0.6 <= s_a / s_b <= 1.67):
        raise RuntimeError(
            f"inconsistent scan timing (slopes {s_a * 1e3:.3f} / "
            f"{s_b * 1e3:.3f} ms/iter from t={t1 * 1e3:.1f}/{t2 * 1e3:.1f}/"
            f"{t4 * 1e3:.1f} ms) — runtime returned early or device "
            "contended; measurement void"
        )
    return (t4 - t1) / (3 * k)


def scan_seconds_per_step(step_state_fn: Callable, state, k: int = 30) -> float:
    """step_state_fn: state -> state.  Returns validated seconds/step."""

    def loop(n):
        return jax.jit(
            lambda s: jax.lax.fori_loop(0, n, lambda i, x: step_state_fn(x), s)
        )

    return _slope_seconds(loop, state, k)


def chain_seconds_per_step(
    step_state_fn: Callable, state, k: int = 6,
    min_plausible_s: Optional[float] = None,
) -> float:
    """Like scan_seconds_per_step but compiles the step ONCE and chains K
    host dispatches (state -> state), blocking on the final result.  For
    big programs (512^2) where compiling three fori_loop variants would
    take tens of minutes.  Per-dispatch tunnel overhead is NOT cancelled,
    so this is a conservative (slower) bound.

    CAVEAT (advisor, round 3): unlike the fori_loop form, the K/2K/4K
    slope here does NOT reliably catch the axon early-return bug — if
    ``block_until_ready`` returns after dispatch instead of completion,
    per-dispatch *host* cost still scales linearly with K and the slopes
    stay positive and consistent, silently reporting host dispatch cost
    as seconds/step.  Callers MUST pass ``min_plausible_s`` (e.g. the
    compulsory-bytes floor scaled to the config) so an implausibly fast
    result raises instead of being recorded."""
    f = jax.jit(step_state_fn)
    jax.block_until_ready(f(state))  # compile

    def chain(n):
        def run(s):
            for _ in range(n):
                s = f(s)
            return s

        return run

    sec = _slope_seconds(chain, state, k)
    if min_plausible_s is not None and sec < min_plausible_s:
        raise RuntimeError(
            f"chain timing implausibly fast ({sec * 1e3:.3f} ms/step < floor "
            f"{min_plausible_s * 1e3:.3f} ms) — block_until_ready likely "
            "returned early (axon bug); measurement void"
        )
    return sec


def scan_seconds_per_iter_fn(
    iter_fn: Callable, k: int = 50, *extra_args
) -> float:
    """iter_fn: (scalar_carry, *extra_args) -> scalar_carry (chains a data
    dependency through an inference iteration).  ``extra_args`` (e.g. model
    variables) are passed as TRACED jit arguments — do not close over big
    pytrees, closure constants blow up remote-compile requests.
    Returns validated seconds/iter."""

    def loop(n):
        def run(c, *ex):
            return jax.lax.fori_loop(0, n, lambda i, x: iter_fn(x, *ex), c)

        return jax.jit(run)

    def builder(n):
        f = loop(n)
        return lambda c: f(c, *extra_args)

    return _slope_seconds(builder, jnp.float32(0), k)


# ---------------------------------------------------------------------------
# Canonical measurement API (round 4).
#
# Round 3 recorded the same texture config at 790/890/913/928/951/994 img/s
# across different scripts because each used a different harness (fori_loop
# absolute vs slope, different K, different session).  Every perf JSON must
# now come from measure()/measure_ab() below and record the returned
# metadata ({method, k, n_runs, spread_pct, runs_ms}) so numbers from
# different files are comparable and A/B deltas are adjudicable.
# ---------------------------------------------------------------------------


def measure(
    step_state_fn: Callable,
    state,
    k: int = 20,
    n_runs: int = 4,
    min_plausible_s: Optional[float] = None,
) -> Dict:
    """Canonical throughput measurement: ``n_runs`` independent fori_loop
    slope estimates (each internally validated K/2K/4K), best wins, spread
    recorded.  Returns a dict to embed verbatim in the benchmark JSON:

      {seconds_per_step, method, k, n_runs, spread_pct, runs_ms}

    ``spread_pct`` is 100*(max-min)/min over the n_runs estimates — the
    honest same-session noise band.  A/B deltas smaller than the larger of
    the two variants' spreads are a wash, not a result (use measure_ab to
    interleave variants so they share session conditions)."""
    runs = [
        scan_seconds_per_step(step_state_fn, state, k=k) for _ in range(n_runs)
    ]
    best = min(runs)
    if min_plausible_s is not None and best < min_plausible_s:
        raise RuntimeError(
            f"measured {best * 1e3:.3f} ms/step < plausibility floor "
            f"{min_plausible_s * 1e3:.3f} ms — runtime returned early; void"
        )
    return {
        "seconds_per_step": best,
        "method": "fori_loop K/2K/4K slope, best of n_runs",
        "k": k,
        "n_runs": n_runs,
        "spread_pct": round(100.0 * (max(runs) - best) / best, 2),
        "runs_ms": [round(r * 1e3, 4) for r in runs],
    }


def measure_ab(
    variants: Dict[str, Tuple[Callable, object]],
    k: int = 20,
    n_rounds: int = 4,
    min_plausible_s: Optional[float] = None,
) -> Dict[str, Dict]:
    """Interleaved A/B: one slope estimate per variant per round, variants
    alternating within the same session so thermal/tunnel drift hits all
    arms equally.  ``variants`` maps name -> (step_state_fn, state).
    Returns {name: measure()-style dict}."""
    runs: Dict[str, list] = {name: [] for name in variants}
    for _ in range(n_rounds):
        for name, (fn, st) in variants.items():
            runs[name].append(scan_seconds_per_step(fn, st, k=k))
    out = {}
    for name, rs in runs.items():
        best = min(rs)
        if min_plausible_s is not None and best < min_plausible_s:
            raise RuntimeError(
                f"variant {name}: {best * 1e3:.3f} ms/step < floor "
                f"{min_plausible_s * 1e3:.3f} ms — void"
            )
        out[name] = {
            "seconds_per_step": best,
            "method": "fori_loop K/2K/4K slope, interleaved A/B, best of rounds",
            "k": k,
            "n_runs": n_rounds,
            "spread_pct": round(100.0 * (max(rs) - best) / best, 2),
            "runs_ms": [round(r * 1e3, 4) for r in rs],
        }
    return out
