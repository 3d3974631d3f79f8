"""Opt-in host-side augmentation at ORIGINAL resolution (--aug_at_original).

The default pipeline augments cloth channels on device at load_size
(data/transforms.py) — same semantics as the reference, cheaper, but not
bit-identical: the reference augments each one-hot channel as a PIL image
at the file's original resolution and THEN resizes
(/root/reference/datasets/warp_dataset.py:110-166, per_channel_transform
data_utils.py:346-361).  This module reproduces the reference order of
operations exactly, fused into one numpy gather per sample:

  out_c[p] = plane_c[ trunc(M_c @ (q + 0.5)) ],  q = floor(p * H0 / L)

where the inner trunc/+0.5/validity matches PIL's NEAREST generic
transform (Geometry.c: sample at output pixel centers, truncate, valid
iff coord in (-1, size)), and the outer floor matches the reference's
``nn.functional.interpolate`` default nearest resize
(warp_dataset.py:155-161).  Because both stages are nearest gathers, the
composition collapses into a single lookup — no original-resolution
intermediate is materialized.

Random parameter distributions mirror the device path (transforms.py,
itself mirroring the torchvision config the reference uses): RandomOrder
of {hflip p=.5, vflip p=.5, affine(deg 10, trans .1, scale .8-1.2,
shear 20), perspective(distortion .5, p=.5)}, drawn independently per
channel.  Host-side cost is what the reference pays (this is the compat
path); the device path remains the default.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def _hflip_inv(H, W):
    return np.array([[-1, 0, W - 1], [0, 1, 0], [0, 0, 1]], np.float64)


def _vflip_inv(H, W):
    return np.array([[1, 0, 0], [0, -1, H - 1], [0, 0, 1]], np.float64)


def _affine_inv(rs: np.random.Generator, H, W, degrees=10.0,
                translate=(0.1, 0.1), scale=(0.8, 1.2), shear=20.0):
    ang = np.deg2rad(rs.uniform(-degrees, degrees))
    tx = rs.uniform(-translate[0] * W, translate[0] * W)
    ty = rs.uniform(-translate[1] * H, translate[1] * H)
    s = rs.uniform(scale[0], scale[1])
    sh = np.deg2rad(rs.uniform(-shear, shear))
    cx, cy = (W - 1) * 0.5, (H - 1) * 0.5
    cos, sin = np.cos(ang), np.sin(ang)
    lin = s * np.array([[cos, -sin], [sin, cos]]) @ np.array(
        [[1.0, np.tan(sh)], [0.0, 1.0]]
    )
    fwd = np.eye(3)
    fwd[:2, :2] = lin
    center = np.array([cx, cy])
    fwd[:2, 2] = center + np.array([tx, ty]) - lin @ center
    return np.linalg.inv(fwd)


def _perspective_inv(rs: np.random.Generator, H, W, distortion_scale=0.5):
    half_w = distortion_scale * W // 2
    half_h = distortion_scale * H // 2
    d = rs.uniform(size=8)
    end = np.array(
        [
            [d[0] * half_w, d[1] * half_h],
            [W - 1 - d[2] * half_w, d[3] * half_h],
            [W - 1 - d[4] * half_w, H - 1 - d[5] * half_h],
            [d[6] * half_w, H - 1 - d[7] * half_h],
        ]
    )
    start = np.array([[0, 0], [W - 1, 0], [W - 1, H - 1], [0, H - 1]], np.float64)
    A = np.zeros((8, 8))
    b = start.reshape(-1)
    for i in range(4):
        x, y = end[i]
        u, v = start[i]
        A[2 * i] = [x, y, 1, 0, 0, 0, -u * x, -u * y]
        A[2 * i + 1] = [0, 0, 0, x, y, 1, -v * x, -v * y]
    h = np.linalg.solve(A, b)
    return np.concatenate([h, [1.0]]).reshape(3, 3)


def draw_channel_homographies(
    rs: np.random.Generator,
    n_channels: int,
    H: int,
    W: int,
    transforms: Sequence[str],
) -> np.ndarray:
    """(C, 3, 3) inverse homographies, one independent RandomOrder
    composition per channel (reference per_channel_transform)."""
    names = [t for t in transforms if t != "none"]
    if "all" in names:
        names = ["vflip", "hflip", "affine", "perspective"]
    mats = np.tile(np.eye(3), (n_channels, 1, 1))
    if not names:
        return mats
    for c in range(n_channels):
        ms = []
        for n in names:
            if n == "hflip":
                ms.append(_hflip_inv(H, W) if rs.uniform() < 0.5 else np.eye(3))
            elif n == "vflip":
                ms.append(_vflip_inv(H, W) if rs.uniform() < 0.5 else np.eye(3))
            elif n == "affine":
                ms.append(_affine_inv(rs, H, W))
            elif n == "perspective":
                m = _perspective_inv(rs, H, W)
                ms.append(m if rs.uniform() < 0.5 else np.eye(3))
            else:
                raise ValueError(n)
        order = rs.permutation(len(ms))
        out = ms[order[0]]
        for i in order[1:]:
            out = out @ ms[i]
        mats[c] = out
    return mats


def warp_labels_at_original(
    labels: np.ndarray,  # (H0, W0) uint8 label map at ORIGINAL resolution
    mats: np.ndarray,  # (C, 3, 3) inverse homographies at original res
    load_size: int,
) -> np.ndarray:
    """Fused per-channel PIL-NEAREST warp at original resolution + torch
    nearest resize to load_size.  Returns (load, load, C) uint8 multi-hot
    (channels transform independently, so the result is no longer a
    single-label map)."""
    H0, W0 = labels.shape
    C = mats.shape[0]
    L = load_size
    # torch nearest resize source indices: floor(dst * in / out)
    qx = (np.arange(L) * W0 // L).astype(np.float64)
    qy = (np.arange(L) * H0 // L).astype(np.float64)
    # PIL samples at output pixel centers
    gx = np.broadcast_to(qx[None, :] + 0.5, (L, L))
    gy = np.broadcast_to(qy[:, None] + 0.5, (L, L))
    ones = np.ones((L, L))
    pts = np.stack([gx, gy, ones])  # (3, L, L)
    src = np.einsum("cij,jhw->cihw", mats, pts)  # (C, 3, L, L)
    with np.errstate(divide="ignore", invalid="ignore"):
        X = src[:, 0] / src[:, 2]
        Y = src[:, 1] / src[:, 2]
    # PIL validity: coord in (-1, size); truncation toward zero
    valid = (X > -1) & (X < W0) & (Y > -1) & (Y < H0)
    valid &= np.isfinite(X) & np.isfinite(Y)
    ix = np.clip(np.trunc(np.nan_to_num(X)).astype(np.int64), 0, W0 - 1)
    iy = np.clip(np.trunc(np.nan_to_num(Y)).astype(np.int64), 0, H0 - 1)
    sampled = labels[iy, ix]  # (C, L, L)
    chans = np.arange(C, dtype=labels.dtype)[:, None, None]
    out = ((sampled == chans) & valid).astype(np.uint8)
    return np.transpose(out, (1, 2, 0))  # (L, L, C)


def augment_labels_at_original(
    rs: np.random.Generator,
    labels: np.ndarray,
    n_channels: int,
    load_size: int,
    transforms: Sequence[str],
) -> np.ndarray:
    """Draw per-channel homographies at the label map's original
    resolution and return the (load, load, C) uint8 multi-hot input."""
    H0, W0 = labels.shape
    mats = draw_channel_homographies(rs, n_channels, H0, W0, transforms)
    return warp_labels_at_original(labels, mats, load_size)
