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
from typing import Callable

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


def chain_seconds_per_step(step_state_fn: Callable, state, k: int = 6) -> float:
    """Like scan_seconds_per_step but compiles the step ONCE and chains K
    host dispatches (state -> state), blocking on the final result.  For
    big programs (512^2) where compiling three fori_loop variants would
    take tens of minutes.  The K vs 2K vs 4K slope still cancels constant
    overhead and still catches the early-return bug; per-dispatch tunnel
    overhead is NOT cancelled, so this is a conservative (slower) bound."""
    f = jax.jit(step_state_fn)
    jax.block_until_ready(f(state))  # compile

    def chain(n):
        def run(s):
            for _ in range(n):
                s = f(s)
            return s

        return run

    return _slope_seconds(chain, state, k)


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
