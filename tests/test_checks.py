"""Purity / health check utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swapnet_tpu.training import WarpSystem
from swapnet_tpu.utils.checks import check_no_nonfinite, check_train_step_purity


def _batch(size=64):  # WarpModule minimum: 6 downsamples need >=64
    r = np.random.RandomState(0)
    onehot = np.eye(19, dtype=np.float32)[r.randint(0, 19, (2, size, size))]
    return {
        "bodys": jnp.asarray(r.randn(2, size, size, 3).astype(np.float32)),
        "input_cloths": jnp.asarray(onehot),
        "target_cloths": jnp.asarray(onehot),
    }


def test_warp_ce_step_is_pure():
    drift = check_train_step_purity(WarpSystem(warp_mode="ce"), _batch())
    assert all(v == 0.0 for v in drift.values()), drift


def test_check_no_nonfinite():
    check_no_nonfinite({"a": jnp.ones(3)})
    with pytest.raises(AssertionError, match="non-finite"):
        check_no_nonfinite({"a": jnp.asarray([1.0, np.nan])}, "grads")
