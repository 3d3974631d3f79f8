"""Regression tests for the option/loader review findings."""

import json
import sys

import numpy as np
import pytest

from swapnet_tpu.data.loader import DataLoader
from swapnet_tpu.options import TrainOptions, load_options


def test_config_file_values_reach_return_value(tmp_path):
    """parse() must return the MERGED namespace when --config_file is given
    (review finding: train.py got the pre-merge namespace)."""
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({"lambda_ce": 77, "load_size": 64, "crop_size": 64}))
    opt = TrainOptions().parse(
        print_options=False, store_options=False,
        args=["--model", "warp", "--dataroot", "/tmp/x",
              "--config_file", str(cfg)],
    )
    assert opt.lambda_ce == 77
    assert opt.load_size == 64


def test_shuffle_data_false_parses():
    opt = TrainOptions().parse(
        print_options=False, store_options=False,
        args=["--model", "warp", "--dataroot", "/tmp/x",
              "--shuffle_data", "False"],
    )
    assert opt.shuffle_data is False
    opt = TrainOptions().parse(
        print_options=False, store_options=False,
        args=["--model", "warp", "--dataroot", "/tmp/x",
              "--shuffle_data", "true"],
    )
    assert opt.shuffle_data is True


def test_load_options_handles_equals_syntax(tmp_path, monkeypatch):
    """--key=value CLI flags must win over args.json values."""
    cfg = tmp_path / "args.json"
    cfg.write_text(json.dumps({"load_size": 128, "name": "from_file"}))
    from types import SimpleNamespace

    opt = SimpleNamespace(load_size=256, name="cli")
    monkeypatch.setattr(sys, "argv", ["prog", "--load_size=256"])
    merged = load_options(opt, str(cfg), user_overrides=True)
    assert merged.load_size == 256  # CLI wins
    assert merged.name == "from_file"  # not on CLI -> file wins


class _CountingDataset:
    def __init__(self, n=100):
        self.n = n
        self.calls = 0

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        self.calls += 1
        return {"x": np.zeros(3, np.float32)}


def test_abandoned_iterator_releases_producer():
    """Taking one batch and dropping the iterator must not decode the whole
    dataset in a leaked thread (review finding)."""
    import threading
    import time

    ds = _CountingDataset(100)
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2,
                        prefetch_batches=2)
    it = iter(loader)
    next(it)
    it.close()  # what `next(iter(loader))` triggers at GC
    time.sleep(1.0)
    # producer stopped early: at most a few prefetched batches decoded
    assert ds.calls <= 12, ds.calls
    assert threading.active_count() < 10


def test_crop_bounds_accepted_and_validated():
    # valid: explicit bounds with crop_size == load_size
    opt = TrainOptions().parse(
        print_options=False, store_options=False,
        args=["--model", "warp", "--dataroot", "/tmp/x",
              "--crop_bounds", "((8, 8), (120, 120))"],
    )
    assert opt.crop_bounds == "((8, 8), (120, 120))"
    # conflict: crop_bounds + center crop from crop_size < load_size
    with pytest.raises(AssertionError):
        TrainOptions().parse(
            print_options=False, store_options=False,
            args=["--model", "warp", "--dataroot", "/tmp/x",
                  "--crop_size", "64", "--crop_bounds", "((8, 8), (60, 60))"],
        )
    # out of range
    with pytest.raises(AssertionError):
        TrainOptions().parse(
            print_options=False, store_options=False,
            args=["--model", "warp", "--dataroot", "/tmp/x",
                  "--crop_bounds", "((8, 8), (200, 200))"],
        )


def test_style_gram_flag_maps_to_image_default(tmp_path):
    """--style_gram image (the default) is the reference's shipped style
    loss; 'features' opts into the Gatys form (round-4 default flip)."""
    from swapnet_tpu.options import TrainOptions
    from swapnet_tpu.training.registry import create_system

    common = [
        "--model", "texture", "--name", "sg", "--dataroot", str(tmp_path),
        "--checkpoints_dir", str(tmp_path), "--load_size", "32",
        "--crop_size", "32",
    ]
    opt = TrainOptions().parse(
        print_options=False, store_options=False, args=common
    )
    assert opt.style_gram == "image"
    system = create_system(opt)
    assert system.perc_cfg.compat_image_gram is True

    opt2 = TrainOptions().parse(
        print_options=False, store_options=False,
        args=common + ["--style_gram", "features"],
    )
    system2 = create_system(opt2)
    assert system2.perc_cfg.compat_image_gram is False
