"""Sparse cloth-segmentation codec — the warp->texture interchange format.

The reference stores cloth segmentations as scipy sparse matrices in .npz
(values = label ids) and expands them to dense one-hot on the CPU inside
DataLoader workers (reference: datasets/data_utils.py:298-343).

TPU-native split: the host only decodes npz -> a dense (H, W) uint8 label
map (tiny); the one-hot expansion to (H, W, 19) happens **on device** as
part of the jitted input pipeline (``labels_to_onehot`` — a trivial XLA
compare-broadcast).  File format stays byte-compatible with scipy so
reference datasets and our warp-stage outputs interchange freely.
"""

from __future__ import annotations

import numpy as np
from scipy import sparse


def decompress_cloth_labels(fname: str) -> np.ndarray:
    """Load a scipy sparse npz -> dense (H, W) uint8 label map."""
    try:
        m = sparse.load_npz(fname)
    except Exception:
        print("Could not decompress cloth segment:", fname)
        raise
    return np.asarray(m.todense(), dtype=np.uint8)


def decompress_cloth_labels_resized(fname: str, size: int) -> np.ndarray:
    """Fused decode + nearest resize via the native C++ kernel when the
    file is CSC (the reference's write format); numpy fallback otherwise."""
    with np.load(fname) as z:
        fmt = z["format"].item()
        fmt = fmt.decode() if isinstance(fmt, bytes) else str(fmt)
        if fmt == "csc":
            from swapnet_tpu.data import native

            rows, cols = (int(v) for v in z["shape"])
            out = native.csc_to_dense_resized(
                z["data"], z["indices"], z["indptr"], rows, cols, size, size
            )
            if out is not None:
                return out
    labels = decompress_cloth_labels(fname)
    from swapnet_tpu.data.image_io import resize_labels_nearest

    return resize_labels_nearest(labels, size)


def labels_to_onehot(labels, n_labels: int = 19, dtype=None):
    """Dense (..., H, W) int labels -> (..., H, W, n_labels) one-hot.

    Works on numpy or jax arrays; under jit this is a fused iota-compare.
    NOTE the scipy sparse round-trip drops explicit zeros, so label 0
    pixels one-hot to channel 0 — identical to the reference's
    to_onehot_tensor behavior for background.
    """
    import jax.numpy as jnp

    xp = jnp if not isinstance(labels, np.ndarray) else np
    if dtype is None:
        dtype = xp.float32
    eye = xp.arange(n_labels, dtype=xp.uint8)
    return (labels[..., None] == eye).astype(dtype)


def compress_and_save_cloth(cloth_onehot: np.ndarray, fname: str) -> None:
    """One-hot (H, W, C) -> argmax -> CSC sparse npz (reference
    compress_and_save_cloth, data_utils.py:311-327; channel-last here)."""
    assert cloth_onehot.ndim == 3, (
        "can only compress 1 tensor at a time. remove the preceding batch size"
    )
    labels = np.asarray(cloth_onehot).argmax(axis=-1)
    sparse.save_npz(fname, sparse.csc_matrix(labels))
