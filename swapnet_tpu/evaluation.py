"""Quality evaluation harness — L1 / PSNR / SSIM over a dataset.

The reference has no quantitative evaluation at all (SURVEY.md §6); this
green-field harness scores a trained generator against ground truth so
training runs can be compared numerically.  One jitted metric program per
batch; metrics accumulate on host.

Used by evaluate.py:
    python evaluate.py --checkpoint checkpoints --dataroot data/deep_fashion
"""

from __future__ import annotations

import json
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from swapnet_tpu.losses.extra import ssim


def batch_metrics(fakes: jax.Array, targets: jax.Array, max_val: float = 2.0) -> Dict[str, jax.Array]:
    """Per-batch quality metrics for [-1, 1]-ish image tensors.

    max_val=2.0 treats the tanh output range [-1, 1] as the dynamic range
    for PSNR/SSIM.
    """
    f = fakes.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    l1 = jnp.mean(jnp.abs(f - t))
    mse = jnp.mean(jnp.square(f - t))
    psnr = 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))
    s = ssim(f, t, max_val=max_val)
    return {"l1": l1, "mse": mse, "psnr": psnr, "ssim": s}


def evaluate_system(system, state, loader, preprocess) -> Dict[str, float]:
    """Run the generator over a loader and average the metrics."""
    metric_fn = jax.jit(batch_metrics)
    eval_fn = jax.jit(system.eval_step)

    from swapnet_tpu.data.loader import array_part

    sums: Dict[str, float] = {}
    weight = 0
    for batch in loader:
        model_batch = preprocess(None, array_part(batch))
        fakes = eval_fn(state, model_batch)
        targets = system.targets(model_batch)
        m = metric_fn(fakes, targets)
        n = fakes.shape[0]
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + float(v) * n
        weight += n
    return {k: v / max(weight, 1) for k, v in sums.items()}
