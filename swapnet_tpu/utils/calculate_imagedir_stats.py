"""Offline preprocessing: per-directory channel mean/std -> line-json.

Reference: util/calculate_imagedir_stats.py (cv2-based two-pass-free
mean/std).  PIL+numpy here; appends {"path", "means", "stds"} to the
dataroot's normalization_stats.json, exactly the format
swapnet_tpu.data.stats.get_norm_stats reads.

Usage: python -m swapnet_tpu.utils.calculate_imagedir_stats DIR [DIR ...]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from swapnet_tpu.data.files import find_valid_files
from swapnet_tpu.data.image_io import load_rgb


def cal_dir_stat(root: str):
    """Single-pass sum/sum-of-squares channel statistics over [0,1] pixels."""
    files = find_valid_files(root)
    if not files:
        raise ValueError(f"no images found under {root}")
    pixel_num = 0
    channel_sum = np.zeros(3, dtype=np.float64)
    channel_sum_squared = np.zeros(3, dtype=np.float64)
    for path in files:
        im = load_rgb(path).astype(np.float64) / 255.0
        pixel_num += im.shape[0] * im.shape[1]
        channel_sum += im.sum(axis=(0, 1))
        channel_sum_squared += np.square(im).sum(axis=(0, 1))
    means = channel_sum / pixel_num
    stds = np.sqrt(channel_sum_squared / pixel_num - np.square(means))
    return means.tolist(), stds.tolist()


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dirs", nargs="+", help="image directories (e.g. dataroot/body)")
    args = ap.parse_args(argv)

    for d in args.dirs:
        d = d.rstrip("/")
        means, stds = cal_dir_stat(d)
        key = os.path.basename(d)
        out_path = os.path.join(os.path.dirname(d), "normalization_stats.json")
        with open(out_path, "a") as f:
            f.write(json.dumps({"path": key, "means": means, "stds": stds}) + "\n")
        print(f"{key}: means={means} stds={stds} -> {out_path}")


if __name__ == "__main__":
    main()
