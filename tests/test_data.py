"""Data layer tests: sparse codec round-trip, stats reader, file pairing,
device-side transforms (what the reference's notebooks checked by eye,
SURVEY.md §4 — here as real asserts)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import sparse

pytestmark = pytest.mark.smoke

from swapnet_tpu.data import (
    compress_and_save_cloth,
    decompress_cloth_labels,
    find_valid_files,
    get_corresponding_file,
    get_norm_stats,
    labels_to_onehot,
)
from swapnet_tpu.data.transforms import (
    center_crop_bounds,
    crop_rois,
    crop_tensors,
    flip_rois,
    normalize,
    per_channel_random_warp,
    random_image_roi_flip,
    unnormalize,
    warp_nearest,
)


def test_codec_roundtrip(tmp_path):
    r = np.random.RandomState(0)
    labels = r.randint(0, 19, (64, 48)).astype(np.uint8)
    onehot = labels_to_onehot(labels)
    assert onehot.shape == (64, 48, 19)
    f = str(tmp_path / "x.npz")
    compress_and_save_cloth(onehot, f)
    back = decompress_cloth_labels(f)
    np.testing.assert_array_equal(back, labels)


def test_codec_reads_reference_format(tmp_path):
    """Files written by scipy (the reference's format) decode identically."""
    labels = np.zeros((32, 32), np.uint8)
    labels[4:10, 6:12] = 7
    f = str(tmp_path / "ref.npz")
    sparse.save_npz(f, sparse.csc_matrix(labels))
    np.testing.assert_array_equal(decompress_cloth_labels(f), labels)


def test_onehot_device_jit():
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 19, (2, 16, 16)))
    oh = jax.jit(lambda l: labels_to_onehot(l, 19))(labels)
    assert oh.shape == (2, 16, 16, 19)
    np.testing.assert_array_equal(np.asarray(oh.sum(-1)), 1.0)
    np.testing.assert_array_equal(np.asarray(oh.argmax(-1)), np.asarray(labels))


def test_norm_stats_reader(tmp_path):
    path = tmp_path / "normalization_stats.json"
    with open(path, "w") as f:
        f.write(json.dumps({"path": "body", "means": [0.1, 0.2, 0.3], "stds": [1, 1, 1]}) + "\n")
        f.write(json.dumps({"path": "texture", "means": [0.5] * 3, "stds": [0.2] * 3}) + "\n")
    means, stds = get_norm_stats(str(tmp_path), "texture")
    assert means == [0.5] * 3 and stds == [0.2] * 3


def test_get_corresponding_file(tmp_path):
    os.makedirs(tmp_path / "d/body"), os.makedirs(tmp_path / "d/cloth")
    (tmp_path / "d/cloth/ID1.npz").write_bytes(b"x")
    body = str(tmp_path / "d/body/ID1.jpg")
    assert get_corresponding_file(body, str(tmp_path / "d/cloth")) == str(
        tmp_path / "d/cloth/ID1.npz"
    )


def test_normalize_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32))
    mean, std = [0.4, 0.5, 0.6], [0.2, 0.25, 0.3]
    y = unnormalize(normalize(x, mean, std), mean, std, clamp=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_warp_nearest_identity_and_flip():
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
    out = warp_nearest(img, jnp.eye(3))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))
    hflip = jnp.asarray([[-1, 0, 3], [0, 1, 0], [0, 0, 1]], jnp.float32)
    np.testing.assert_array_equal(np.asarray(warp_nearest(img, hflip)), np.asarray(img)[:, ::-1])


def test_per_channel_warp_independent():
    """Each channel must receive a DIFFERENT random transform."""
    oh = jnp.ones((1, 32, 32, 19), jnp.float32)
    # a recognizable asymmetric pattern per channel
    base = np.zeros((1, 32, 32, 19), np.float32)
    base[0, 4:12, 4:20, :] = 1.0
    warped = jax.jit(per_channel_random_warp)(jax.random.key(3), jnp.asarray(base))
    assert warped.shape == base.shape
    w = np.asarray(warped)
    assert np.isfinite(w).all()
    assert set(np.unique(w)) <= {0.0, 1.0}, "nearest warp of one-hot stays binary"
    diffs = [
        not np.array_equal(w[0, :, :, i], w[0, :, :, j])
        for i in range(3) for j in range(i + 1, 4)
    ]
    assert any(diffs), "channels got identical transforms"


def test_per_channel_warp_none_is_identity():
    base = np.random.RandomState(0).rand(1, 16, 16, 4).astype(np.float32)
    out = per_channel_random_warp(jax.random.key(0), jnp.asarray(base), ("none",))
    np.testing.assert_array_equal(np.asarray(out), base)


def test_roi_flip_matches_reference_math():
    rois = jnp.asarray([[10.0, 20.0, 30.0, 50.0]])
    flipped = flip_rois(rois, 1, 64)  # horizontal about x=64
    np.testing.assert_allclose(np.asarray(flipped), [[98.0, 20.0, 118.0, 50.0]])
    # double flip = identity
    np.testing.assert_allclose(np.asarray(flip_rois(flipped, 1, 64)), np.asarray(rois))


def test_random_image_roi_flip_lockstep():
    r = np.random.RandomState(0)
    img = jnp.asarray(r.rand(4, 16, 16, 3).astype(np.float32))
    rois = jnp.asarray(r.uniform(0, 15, (4, 12, 4)).astype(np.float32))
    img2, rois2 = random_image_roi_flip(jax.random.key(1), img, rois, vp=1.0, hp=0.0)
    np.testing.assert_allclose(np.asarray(img2), np.asarray(img)[:, ::-1], atol=0)
    # y coords flipped about H/2=8
    np.testing.assert_allclose(
        np.asarray(rois2[..., 1]), 16 - np.asarray(rois[..., 3]), atol=1e-5
    )


def test_center_crop_and_rois():
    bounds = center_crop_bounds(128, 64)
    assert bounds == ((32, 32), (96, 96))
    x = jnp.zeros((1, 128, 128, 3))
    assert crop_tensors(x, bounds).shape == (1, 64, 64, 3)
    rois = jnp.asarray([[[0.0, 0.0, 127.0, 127.0]]])
    out = np.asarray(crop_rois(rois, bounds))
    np.testing.assert_allclose(out, [[[0.0, 0.0, 63.0, 63.0]]])


def test_parse_and_resolve_crop_bounds():
    from swapnet_tpu.data.transforms import parse_crop_bounds, resolve_crop_bounds

    assert parse_crop_bounds(None) is None
    assert parse_crop_bounds("((8, 4), (120, 100))") == ((8, 4), (120, 100))
    assert parse_crop_bounds([[8, 4], [120, 100]]) == ((8, 4), (120, 100))
    with pytest.raises(ValueError):
        parse_crop_bounds("((10, 10), (5, 20))")  # min >= max
    with pytest.raises(ValueError):
        parse_crop_bounds("garbage")
    # center crop from crop_size < load_size wins (reference
    # base_dataset.py:51-58); explicit bounds apply otherwise
    assert resolve_crop_bounds(128, 64, "((0, 0), (10, 10))") == ((32, 32), (96, 96))
    assert resolve_crop_bounds(128, 128, "((8, 4), (120, 100))") == ((8, 4), (120, 100))
    assert resolve_crop_bounds(128, 128, None) is None


def test_pipelines_apply_explicit_crop_bounds():
    """--crop_bounds wired through both device pipelines, ROIs in lockstep
    (reference warp_dataset.py:168, texture_dataset.py:137-144)."""
    from swapnet_tpu.data.pipelines import (
        TexturePipelineConfig,
        WarpPipelineConfig,
        prepare_texture_batch,
        prepare_warp_batch,
    )

    bounds = ((8, 4), (40, 28))
    r = np.random.RandomState(0)
    wcfg = WarpPipelineConfig(load_size=48, crop_size=48, crop_bounds=bounds,
                              train=False)
    wbatch = {
        "bodys_u8": jnp.asarray(r.randint(0, 255, (2, 48, 48, 3), dtype=np.uint8)),
        "input_labels": jnp.asarray(r.randint(0, 19, (2, 48, 48), dtype=np.int32)),
        "target_labels": jnp.asarray(r.randint(0, 19, (2, 48, 48), dtype=np.int32)),
    }
    out = prepare_warp_batch(wcfg, None, wbatch)
    assert out["bodys"].shape == (2, 24, 32, 3)  # H = 28-4, W = 40-8
    assert out["input_cloths"].shape == (2, 24, 32, 19)

    tcfg = TexturePipelineConfig(load_size=48, crop_size=48, crop_bounds=bounds,
                                 train=False)
    tbatch = {
        "textures_u8": jnp.asarray(r.randint(0, 255, (2, 48, 48, 3), dtype=np.uint8)),
        "rois": jnp.asarray(r.uniform(0, 47, (2, 12, 4)).astype(np.float32)),
        "cloth_labels": jnp.asarray(r.randint(0, 19, (2, 48, 48), dtype=np.int32)),
    }
    tout = prepare_texture_batch(tcfg, None, tbatch)
    assert tout["input_textures"].shape == (2, 24, 32, 3)
    rois = np.asarray(tout["rois"])
    assert rois[..., 0::2].max() <= 32 - 1 and rois[..., 1::2].max() <= 24 - 1
    assert rois.min() >= 0
