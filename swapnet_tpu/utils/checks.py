"""Debugging / correctness checks (aux subsystem; SURVEY.md §5 "race
detection" analog: JAX's hazards are impurity and donation bugs, not
data races — these checks catch both)."""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np


def check_train_step_purity(system, batch, rng=None, atol: float = 0.0) -> Dict[str, float]:
    """Run train_step twice from the identical state; a pure step must
    produce bit-identical metrics.  Returns the max per-metric drift.
    Catches hidden host randomness, stateful closures, and donation bugs
    (donated-buffer reuse shows up as nondeterminism)."""
    rng = rng if rng is not None else jax.random.key(0)
    step = jax.jit(system.train_step)

    s1 = system.init_state(rng, batch)
    s2 = system.init_state(rng, batch)
    _, m1 = step(s1, batch)
    _, m2 = step(s2, batch)

    drift = {}
    for k in m1:
        d = abs(float(m1[k]) - float(m2[k]))
        drift[k] = d
        if d > atol:
            raise AssertionError(
                f"train_step is impure: metric {k} drifted by {d} across "
                "identical invocations"
            )
    return drift


def check_no_nonfinite(tree, name: str = "tree") -> None:
    """Assert every leaf is finite (gradient/param health check)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            key = jax.tree_util.keystr(path)
            raise AssertionError(f"non-finite values in {name}{key}")
