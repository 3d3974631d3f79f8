"""Host dataset tests: item contracts, pairing, video mode, loader capping."""

import json
import os
from types import SimpleNamespace

import numpy as np
import pytest
from PIL import Image
from scipy import sparse

from swapnet_tpu.data.datasets import TextureDataset, WarpDataset
from swapnet_tpu.data.loader import DataLoader

SIZE = 64


@pytest.fixture(scope="module")
def dataroot(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    r = np.random.RandomState(0)
    for sub in ("cloth", "body", "texture"):
        os.makedirs(root / sub)
    rows = []
    for i in range(6):
        fid = f"f{i}"
        labels = r.randint(0, 19, (128, 128)).astype(np.uint8)
        sparse.save_npz(str(root / "cloth" / f"{fid}.npz"), sparse.csc_matrix(labels))
        Image.fromarray(r.randint(0, 255, (128, 128, 3), dtype=np.uint8)).save(
            root / "body" / f"{fid}.png"
        )
        Image.fromarray(r.randint(0, 255, (256, 256, 3), dtype=np.uint8)).save(
            root / "texture" / f"{fid}.jpg"
        )
        for _ in range(12):
            rows.append(f"{fid},10,20,100,200")  # coords in 256-space
    with open(root / "rois.csv", "w") as f:
        f.write("id,xmin,ymin,xmax,ymax\n" + "\n".join(rows) + "\n")
    with open(root / "normalization_stats.json", "w") as f:
        f.write(json.dumps({"path": "body", "means": [0.5] * 3, "stds": [0.25] * 3}) + "\n")
        f.write(json.dumps({"path": "texture", "means": [0.5] * 3, "stds": [0.25] * 3}) + "\n")
    return root


def _opt(root, **kw):
    base = dict(
        dataroot=str(root), is_train=True, load_size=SIZE, crop_size=SIZE,
        cloth_representation="labels", cloth_channels=19,
        dataset_mode="image", shuffle_data=True,
    )
    base.update(kw)
    return SimpleNamespace(**base)


def test_warp_dataset_item(dataroot):
    ds = WarpDataset(_opt(dataroot))
    assert len(ds) == 6
    item = ds[0]
    assert item["bodys_u8"].shape == (SIZE, SIZE, 3)
    assert item["bodys_u8"].dtype == np.uint8
    assert item["input_labels"].shape == (SIZE, SIZE)
    assert item["target_labels"].dtype == np.uint8
    # image mode: input == target before device-side augmentation
    np.testing.assert_array_equal(item["input_labels"], item["target_labels"])
    # pairing: body file matches cloth id
    assert os.path.basename(item["body_paths"]).split(".")[0] == os.path.basename(
        item["cloth_paths"]
    ).split(".")[0]


def test_warp_dataset_video_mode(dataroot):
    ds = WarpDataset(_opt(dataroot, dataset_mode="video"))
    diffs = 0
    for _ in range(8):
        item = ds[0]
        if not np.array_equal(item["input_labels"], item["target_labels"]):
            diffs += 1
    assert diffs > 0, "video mode should sample other frames as input"


def test_warp_dataset_inference_mode(dataroot):
    opt = _opt(dataroot, is_train=False, shuffle_data=False)
    ds = WarpDataset(opt)
    item = ds[1]
    np.testing.assert_array_equal(item["input_labels"], item["target_labels"])
    assert opt.body_norm_stats == ([0.5] * 3, [0.25] * 3)


def test_texture_dataset_item(dataroot):
    opt = _opt(dataroot)
    ds = TextureDataset(opt)
    item = ds[0]
    assert item["textures_u8"].shape == (SIZE, SIZE, 3)
    assert item["cloth_labels"].shape == (SIZE, SIZE)
    assert item["rois"].shape == (12, 4)
    # rois scaled from original 256 -> load 64 (factor 0.25), rounded
    np.testing.assert_allclose(item["rois"][0], [2.0, 5.0, 25.0, 50.0])


def test_loader_caps_and_collates(dataroot):
    ds = WarpDataset(_opt(dataroot))
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2,
                        max_dataset_size=4, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["bodys_u8"].shape == (2, SIZE, SIZE, 3)
    assert isinstance(b["cloth_paths"], list) and len(b["cloth_paths"]) == 2


def test_loader_shuffles_per_epoch(dataroot):
    ds = WarpDataset(_opt(dataroot))
    loader = DataLoader(ds, batch_size=6, shuffle=True, num_workers=1, seed=1)
    e1 = next(iter(loader))["cloth_paths"]
    e2 = next(iter(loader))["cloth_paths"]
    assert set(e1) == set(e2)
    assert e1 != e2, "epochs should reshuffle"


def test_loader_propagates_worker_errors(dataroot):
    class Boom:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            raise RuntimeError("decode failed")

    loader = DataLoader(Boom(), batch_size=2, shuffle=False, num_workers=2)
    with pytest.raises(RuntimeError, match="decode failed"):
        list(loader)


def test_cache_data_items_identical_and_decode_once(dataroot, monkeypatch):
    """--cache_data must return identical items while decoding each file
    at most once across epochs (texture ROI scale needs the cached
    pre-resize width too)."""
    import swapnet_tpu.data.datasets as dsmod

    cold = TextureDataset(_opt(dataroot))
    want = [cold[i] for i in range(len(cold))]

    calls = {"n": 0}
    real = dsmod.load_rgb_resized

    def counting_load(path, size, backend="pil"):
        calls["n"] += 1
        return real(path, size, backend)

    monkeypatch.setattr(dsmod, "load_rgb_resized", counting_load)
    ds = TextureDataset(_opt(dataroot, cache_data=True))
    for _ in range(3):  # three epochs over the same files
        for i in range(len(ds)):
            got = ds[i]
            np.testing.assert_array_equal(got["textures_u8"], want[i]["textures_u8"])
            np.testing.assert_array_equal(got["rois"], want[i]["rois"])
            np.testing.assert_array_equal(got["cloth_labels"], want[i]["cloth_labels"])
    assert calls["n"] == len(ds)  # one decode per texture file, ever


def test_cache_data_warp_video_mode_pairing_still_random(dataroot):
    """Caching the decode must not freeze video-mode's random pairing."""
    import random as _random

    ds = WarpDataset(_opt(dataroot, dataset_mode="video", cache_data=True))
    _random.seed(0)
    pairs = {ds[0]["cloth_paths"] for _ in range(2)}  # target fixed
    inputs = set()
    for _ in range(8):
        item = ds[0]
        inputs.add(item["input_labels"].tobytes())
    assert len(pairs) == 1
    assert len(inputs) > 1  # random other frames still vary


def _native_available():
    from swapnet_tpu.data import native

    return native.has_image_decode()


@pytest.mark.parametrize("cache_data", [False, True])
def test_getitems_batch_decode_matches_per_item(dataroot, cache_data):
    """The loader's batch fast path (getitems -> one C++ thread-pool decode
    call) must produce items identical to per-item __getitem__."""
    if not _native_available():
        pytest.skip("native image decode unavailable")
    from concurrent.futures import ThreadPoolExecutor

    for cls in (WarpDataset, TextureDataset):
        per_item = cls(_opt(dataroot, decode_backend="native"))
        batched = cls(
            _opt(dataroot, decode_backend="native", cache_data=cache_data)
        )
        idxs = [0, 3, 1, 3]  # duplicate index: memo dedup path
        with ThreadPoolExecutor(2) as pool:
            items = batched.getitems(idxs, pool=pool)
        for got, i in zip(items, idxs):
            want = per_item.__getitem__(i)
            for k in want:
                if isinstance(want[k], np.ndarray):
                    np.testing.assert_array_equal(got[k], want[k], err_msg=f"{cls.__name__}.{k}")
                else:
                    assert got[k] == want[k]
        if cache_data:  # second pass must serve from cache, still equal
            rgb_key = "bodys_u8" if cls is WarpDataset else "textures_u8"
            again = batched.getitems(idxs)
            for got, prev in zip(again, items):
                np.testing.assert_array_equal(got[rgb_key], prev[rgb_key])


def test_getitems_pil_backend_falls_back_per_item(dataroot):
    """backend pil: getitems must not touch the native batch path."""
    ds = TextureDataset(_opt(dataroot, decode_backend="pil"))
    items = ds.getitems([0, 2])
    for got, i in zip(items, [0, 2]):
        want = ds[i]
        np.testing.assert_array_equal(got["textures_u8"], want["textures_u8"])
        np.testing.assert_array_equal(got["rois"], want["rois"])


def test_loader_uses_getitems(dataroot):
    """DataLoader must route whole batches through dataset.getitems."""
    calls = []

    class Spy(WarpDataset):
        def getitems(self, indices, pool=None):
            calls.append(list(indices))
            return super().getitems(indices, pool=pool)

    ds = Spy(_opt(dataroot, decode_backend="pil"))
    loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=2)
    batches = list(loader)
    assert len(calls) == len(batches) == 2
    assert sorted(sum(calls, [])) == list(range(6))
    assert batches[0]["bodys_u8"].shape == (4, SIZE, SIZE, 3)
