"""Evaluation harness: metric math + system-level averaging."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swapnet_tpu.evaluation import batch_metrics, evaluate_system
from swapnet_tpu.training import WarpSystem


def test_batch_metrics_identity():
    x = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    m = batch_metrics(x, x)
    assert float(m["l1"]) == 0.0
    assert float(m["ssim"]) == pytest.approx(1.0, abs=1e-5)
    assert float(m["psnr"]) > 100  # mse clamp floor


def test_batch_metrics_orders():
    r = np.random.RandomState(1)
    x = jnp.asarray(r.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    near = x + 0.01
    far = jnp.asarray(r.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    m_near, m_far = batch_metrics(near, x), batch_metrics(far, x)
    assert float(m_near["psnr"]) > float(m_far["psnr"])
    assert float(m_near["ssim"]) > float(m_far["ssim"])
    assert float(m_near["l1"]) < float(m_far["l1"])


def test_evaluate_system_averages():
    size = 32
    r = np.random.RandomState(0)
    onehot = np.eye(19, dtype=np.float32)[r.randint(0, 19, (2, size, size))]
    batch_np = {
        "bodys_u8": r.randint(0, 255, (2, size, size, 3), dtype=np.uint8),
        "input_labels": r.randint(0, 19, (2, size, size)).astype(np.uint8),
        "target_labels": r.randint(0, 19, (2, size, size)).astype(np.uint8),
    }

    from swapnet_tpu.data.pipelines import WarpPipelineConfig, make_warp_preprocessor

    cfg = WarpPipelineConfig(load_size=size, crop_size=size, train=False)
    preprocess = make_warp_preprocessor(cfg)

    system = WarpSystem(warp_mode="ce")
    model_batch = preprocess(None, batch_np)
    state = system.init_state(jax.random.key(0), model_batch)

    metrics = evaluate_system(system, state, [batch_np, batch_np], preprocess)
    for k in ("l1", "mse", "psnr", "ssim"):
        assert k in metrics and np.isfinite(metrics[k]), (k, metrics)
