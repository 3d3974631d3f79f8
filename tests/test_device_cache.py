"""Device-resident dataset cache (swapnet_tpu/data/device_cache.py)."""

import numpy as np

from swapnet_tpu.data.device_cache import DeviceDataset


class _FakeDataset:
    def __len__(self):
        return 10

    def __getitem__(self, i):
        return {
            "textures_u8": np.full((4, 4, 3), i, dtype=np.uint8),
            "rois": np.full((12, 4), i, dtype=np.float32),
            "texture_paths": f"item{i}.jpg",
        }


def test_resident_arrays_and_gather():
    res = DeviceDataset(_FakeDataset(), num_workers=2)
    assert res.n == 10
    assert set(res.arrays) == {"textures_u8", "rois"}
    assert res.host_fields["texture_paths"][3] == "item3.jpg"
    got = res.gather_host(np.asarray([3, 7]))
    assert got["textures_u8"][0, 0, 0, 0] == 3
    assert got["rois"][1, 0, 0] == 7.0
    assert res.nbytes() == 10 * (4 * 4 * 3 + 12 * 4 * 4)


def test_epoch_batches_cover_and_shuffle():
    res = DeviceDataset(_FakeDataset(), max_items=9)
    e0 = [b["indices"] for b in res.epoch_batches(2, seed=1, epoch=0)]
    e1 = [b["indices"] for b in res.epoch_batches(2, seed=1, epoch=1)]
    # drop_last: 4 batches of 2 from 9 items
    assert len(e0) == 4 and all(len(i) == 2 for i in e0)
    assert not np.array_equal(np.concatenate(e0), np.concatenate(e1))
    assert res.num_batches(2) == 4


def test_grouped_batches_shapes():
    res = DeviceDataset(_FakeDataset())
    groups = list(res.epoch_batches_grouped(2, steps_per_call=2))
    assert all(g["indices"].shape == (2, 2) for g in groups)
    assert len(groups) == 2  # 5 batches -> 2 full groups, tail dropped
