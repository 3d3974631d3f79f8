"""Pallas kernels vs their jnp counterparts (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swapnet_tpu.ops import roi_align
from swapnet_tpu.ops.pallas_kernels import roi_align_pallas


@pytest.fixture
def rng():
    return np.random.RandomState(7)


def test_roi_align_pallas_matches_jnp(rng):
    feats = rng.randn(2, 32, 32, 3).astype(np.float32)
    x1 = rng.uniform(0, 16, (2, 4))
    y1 = rng.uniform(0, 16, (2, 4))
    rois = np.stack(
        [x1, y1, x1 + rng.uniform(2, 14, (2, 4)), y1 + rng.uniform(2, 14, (2, 4))],
        axis=-1,
    ).astype(np.float32)

    ours = roi_align_pallas(
        jnp.asarray(feats), jnp.asarray(rois), output_size=(8, 8), interpret=True
    )
    ref = roi_align(jnp.asarray(feats), jnp.asarray(rois), output_size=(8, 8))
    assert ours.shape == (2, 4, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-4)


def test_roi_align_pallas_zero_rois(rng):
    feats = rng.randn(1, 16, 16, 2).astype(np.float32)
    rois = np.zeros((1, 3, 4), np.float32)
    ours = roi_align_pallas(
        jnp.asarray(feats), jnp.asarray(rois), output_size=(4, 4), interpret=True
    )
    ref = roi_align(jnp.asarray(feats), jnp.asarray(rois), output_size=(4, 4))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-4)
