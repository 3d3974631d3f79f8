"""Host-side image IO helpers (PIL decode -> numpy uint8, NHWC)."""

from __future__ import annotations

import numpy as np
from PIL import Image


def load_rgb(path: str) -> np.ndarray:
    """Decode an image file -> (H, W, 3) uint8."""
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def resize_rgb(img: np.ndarray, size: int) -> np.ndarray:
    """Bilinear resize to (size, size) uint8 (PIL, matching torchvision
    Resize semantics for the square case the reference uses)."""
    if img.shape[0] == size and img.shape[1] == size:
        return img
    return np.asarray(Image.fromarray(img).resize((size, size), Image.BILINEAR))


def resize_labels_nearest(labels: np.ndarray, size: int) -> np.ndarray:
    """Nearest resize of a (H, W) label map with torch F.interpolate
    semantics: src = floor(dst * in/out)."""
    h, w = labels.shape
    if (h, w) == (size, size):
        return labels
    ridx = np.arange(size) * h // size
    cidx = np.arange(size) * w // size
    return labels[np.ix_(ridx, cidx)]


def save_rgb(img: np.ndarray, path: str) -> None:
    Image.fromarray(np.asarray(img, dtype=np.uint8)).save(path)
