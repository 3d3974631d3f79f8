"""Validate the MXU matmul ROI-Align against a literal numpy port of
torchvision's algorithm (tests/conftest.py pins CPU for exact numerics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swapnet_tpu.ops import roi_align, roi_align_reference

pytestmark = pytest.mark.smoke


@pytest.fixture
def rng():
    return np.random.RandomState(42)


def _random_rois(rng, B, R, H, W):
    x1 = rng.uniform(0, W * 0.6, (B, R))
    y1 = rng.uniform(0, H * 0.6, (B, R))
    x2 = x1 + rng.uniform(1, W * 0.4, (B, R))
    y2 = y1 + rng.uniform(1, H * 0.4, (B, R))
    return np.stack([x1, y1, x2, y2], axis=-1).astype(np.float32)


def test_matches_reference_small(rng):
    feats = rng.randn(2, 24, 20, 3).astype(np.float32)
    rois = _random_rois(rng, 2, 4, 24, 20)
    out = roi_align(jnp.asarray(feats), jnp.asarray(rois), output_size=(8, 8))
    ref = roi_align_reference(feats, rois, output_size=(8, 8))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_out_of_bounds_rois(rng):
    """ROIs partially outside the image: out-of-range samples contribute 0."""
    feats = rng.randn(1, 16, 16, 2).astype(np.float32)
    rois = np.array([[[-6.0, -4.0, 10.0, 12.0], [8.0, 8.0, 30.0, 25.0]]], np.float32)
    out = roi_align(jnp.asarray(feats), jnp.asarray(rois), output_size=(8, 8))
    ref = roi_align_reference(feats, rois, output_size=(8, 8))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_degenerate_and_zero_rois(rng):
    """Zero-size ROIs (the dataset fills missing rois with 0) must not NaN."""
    feats = rng.randn(1, 16, 16, 2).astype(np.float32)
    rois = np.zeros((1, 3, 4), np.float32)
    rois[0, 1] = [5, 5, 5, 5]  # degenerate point ROI
    rois[0, 2] = [2, 3, 9, 11]
    out = roi_align(jnp.asarray(feats), jnp.asarray(rois), output_size=(4, 4))
    ref = roi_align_reference(feats, rois, output_size=(4, 4))
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_spatial_scale_and_sampling_ratio(rng):
    feats = rng.randn(1, 32, 32, 1).astype(np.float32)
    rois = _random_rois(rng, 1, 2, 64, 64)  # coords in 2x space
    out = roi_align(
        jnp.asarray(feats), jnp.asarray(rois),
        output_size=(6, 6), spatial_scale=0.5, sampling_ratio=2,
    )
    ref = roi_align_reference(
        feats, rois, output_size=(6, 6), spatial_scale=0.5, sampling_ratio=2
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_reference_shape_config(rng):
    """The exact config used by TextureModule: 12 ROIs -> (128,128), sr=1."""
    feats = rng.randn(2, 128, 128, 3).astype(np.float32)
    rois = _random_rois(rng, 2, 12, 128, 128)
    out = jax.jit(lambda f, r: roi_align(f, r, output_size=(128, 128)))(
        jnp.asarray(feats), jnp.asarray(rois)
    )
    assert out.shape == (2, 12, 128, 128, 3)
    # spot-check a handful of output positions against the reference
    ref = roi_align_reference(feats[:1, :, :, :1], rois[:1, :2], output_size=(128, 128))
    np.testing.assert_allclose(
        np.asarray(out)[:1, :2, :, :, :1], ref, atol=1e-3
    )


def test_gradients_flow(rng):
    feats = jnp.asarray(rng.randn(1, 16, 16, 2).astype(np.float32))
    rois = jnp.asarray(_random_rois(rng, 1, 2, 16, 16))
    g = jax.grad(lambda f: jnp.sum(roi_align(f, rois, output_size=(4, 4)) ** 2))(feats)
    assert g.shape == feats.shape
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(g))) > 0
