"""--aug_at_original (data/host_aug.py): exactness vs the reference path.

The reference augments each one-hot cloth channel as a PIL image at the
file's ORIGINAL resolution (per_channel_transform, reference
datasets/data_utils.py:346-361) and then nearest-resizes with torch
``F.interpolate`` (warp_dataset.py:155-161).  host_aug fuses both nearest
gathers into one lookup; these tests replay the same homographies through
actual PIL ``Image.transform`` + the torch-nearest index map and demand
EXACT equality, then check the dataset/pipeline integration.
"""

import numpy as np
import pytest
from PIL import Image

from swapnet_tpu.data.host_aug import (
    draw_channel_homographies,
    warp_labels_at_original,
)

AFFINE = getattr(getattr(Image, "Transform", Image), "AFFINE")
PERSPECTIVE = getattr(getattr(Image, "Transform", Image), "PERSPECTIVE")
NEAREST = getattr(getattr(Image, "Resampling", Image), "NEAREST")


def _pil_reference(labels, mat, load_size, channel):
    """Reference path for one channel: PIL transform at original res with
    the inverse homography, then torch-nearest resize."""
    H0, W0 = labels.shape
    plane = (labels == channel).astype(np.uint8)
    img = Image.fromarray(plane, mode="L")
    m = np.asarray(mat, np.float64)
    if abs(m[2, 0]) < 1e-12 and abs(m[2, 1]) < 1e-12 and abs(m[2, 2] - 1) < 1e-12:
        coeffs = tuple(m[:2].reshape(-1))
        warped = img.transform((W0, H0), AFFINE, coeffs, resample=NEAREST)
    else:
        m = m / m[2, 2]
        coeffs = tuple(m.reshape(-1)[:8])
        warped = img.transform((W0, H0), PERSPECTIVE, coeffs, resample=NEAREST)
    aug = np.asarray(warped, np.uint8)
    # torch F.interpolate nearest: src = floor(dst * in / out)
    ry = np.arange(load_size) * H0 // load_size
    rx = np.arange(load_size) * W0 // load_size
    return aug[np.ix_(ry, rx)]


def _labels(seed, H0, W0):
    return np.random.RandomState(seed).randint(0, 19, (H0, W0)).astype(np.uint8)


@pytest.mark.parametrize("H0,W0", [(37, 53), (181, 133)])
def test_fused_warp_matches_pil_exactly(H0, W0):
    labels = _labels(0, H0, W0)
    rs = np.random.default_rng(7)
    # identity + one of each transform family + a random composition
    mats = [np.eye(3)]
    mats.append(np.array([[-1, 0, W0 - 1], [0, 1, 0], [0, 0, 1]], np.float64))
    mats.extend(draw_channel_homographies(rs, 3, H0, W0, ("affine",)))
    mats.extend(draw_channel_homographies(rs, 2, H0, W0, ("perspective",)))
    mats.extend(
        draw_channel_homographies(
            rs, 3, H0, W0, ("hflip", "vflip", "affine", "perspective")
        )
    )
    mats = np.stack(mats)
    got = warp_labels_at_original(labels, mats, 32)  # (32, 32, C)
    for c in range(mats.shape[0]):
        want = _pil_reference(labels, mats[c], 32, c)
        m = mats[c]
        mismatched = int(np.sum(got[..., c] != want))
        if np.allclose(m, np.rint(m)):
            # integer matrices (identity, flips): float-exact, demand equal
            np.testing.assert_array_equal(
                got[..., c], want, err_msg=f"channel {c} (matrix {m})"
            )
        else:
            # real-valued homographies: PIL evaluates source coordinates in
            # a different floating-point order (AFFINE even steps them
            # incrementally, xx += a per column, Geometry.c), so a pixel
            # whose source coordinate sits exactly on an integer boundary
            # can round the other way.  Allow a <=0.3% pixel budget
            # (observed: ~1/1024).
            assert mismatched <= max(3, int(0.003 * want.size)), (
                f"channel {c}: {mismatched}/{want.size} pixels differ "
                f"(matrix {m})"
            )


def test_identity_multi_hot_equals_resized_onehot():
    labels = _labels(3, 61, 47)
    mats = np.tile(np.eye(3), (19, 1, 1))
    got = warp_labels_at_original(labels, mats, 24)
    ry = np.arange(24) * 61 // 24
    rx = np.arange(24) * 47 // 24
    resized = labels[np.ix_(ry, rx)]
    want = np.eye(19, dtype=np.uint8)[resized]
    np.testing.assert_array_equal(got, want)


def test_dataset_and_pipeline_integration(tmp_path):
    """WarpDataset --aug_at_original emits input_onehot_u8 and the warp
    pipeline consumes it (skipping the device-side warp)."""
    import jax
    from scipy import sparse

    from swapnet_tpu.data.datasets import WarpDataset
    from swapnet_tpu.data.pipelines import (
        WarpPipelineConfig,
        prepare_warp_batch,
    )

    root = tmp_path / "data"
    (root / "cloth").mkdir(parents=True)
    (root / "body").mkdir()
    r = np.random.RandomState(0)
    for i in range(2):
        lab = r.randint(0, 19, (40, 30)).astype(np.uint8)  # original res
        sparse.save_npz(root / "cloth" / f"f{i}.npz", sparse.csc_matrix(lab))
        from PIL import Image as PImage

        PImage.fromarray(
            r.randint(0, 255, (40, 30, 3), dtype=np.uint8)
        ).save(root / "body" / f"f{i}.png")
    import json

    stats = {"path": "body", "means": [0.5, 0.5, 0.5],
             "stds": [0.5, 0.5, 0.5]}
    (root / "normalization_stats.json").write_text(json.dumps(stats) + "\n")

    from argparse import Namespace

    opt = Namespace(
        dataroot=str(root), is_train=True, dataset_mode="image",
        cloth_representation="labels", cloth_channels=19, load_size=16,
        crop_size=16, shuffle_data=False, aug_at_original=True,
        input_transforms=("hflip", "vflip", "affine", "perspective"),
    )
    ds = WarpDataset(opt)
    item = ds[0]
    assert "input_onehot_u8" in item and "input_labels" not in item
    assert item["input_onehot_u8"].shape == (16, 16, 19)
    assert set(np.unique(item["input_onehot_u8"])) <= {0, 1}

    batch = {
        "bodys_u8": item["bodys_u8"][None],
        "target_labels": item["target_labels"][None],
        "input_onehot_u8": item["input_onehot_u8"][None],
    }
    cfg = WarpPipelineConfig(
        load_size=16, crop_size=16,
        body_norm_stats=((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
        aug_at_original=True, train=True,
    )
    out = prepare_warp_batch(cfg, jax.random.key(0), batch)
    assert out["input_cloths"].shape == (1, 16, 16, 19)
    np.testing.assert_array_equal(
        np.asarray(out["input_cloths"]), item["input_onehot_u8"][None]
    )
