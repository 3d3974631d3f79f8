"""Misc utilities (reference util/util.py)."""

from __future__ import annotations

import os

import jax
import numpy as np


def diagnose_network(params, name: str = "network") -> float:
    """Mean absolute value across all parameters — grad-health probe
    (reference util/util.py:35-51 computes mean |grad|; pass a grads
    pytree here for the same diagnostic)."""
    leaves = [np.abs(np.asarray(p)).mean() for p in jax.tree.leaves(params)]
    mean = float(np.mean(leaves)) if leaves else 0.0
    print(f"{name}: mean abs = {mean}")
    return mean


class PromptOnce:
    """Interactive overwrite guard (reference util/util.py:100-126):
    prompts once before reusing a non-empty output directory."""

    asked = False

    @staticmethod
    def makedirs(path: str, prompt: bool = True) -> None:
        os.makedirs(path, exist_ok=True)
        if prompt and not PromptOnce.asked and os.listdir(path):
            PromptOnce.asked = True
            try:
                a = input(
                    f"\n'{path}' already exists and is not empty. Overwrite contents? "
                    "y/N: "
                )
            except (EOFError, OSError):  # non-interactive (incl. pytest's
                return                   # captured stdin): like --no_confirm
            if a.strip().lower() not in ("y", "yes"):
                print("Exiting.")
                raise SystemExit(1)


def mkdirs(paths) -> None:
    if isinstance(paths, (list, tuple)):
        for p in paths:
            os.makedirs(p, exist_ok=True)
    else:
        os.makedirs(paths, exist_ok=True)
