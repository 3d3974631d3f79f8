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


def load_rgb_resized(
    path: str, size: int, backend: str = "pil"
) -> tuple:
    """Fused decode + bilinear resize -> ((size, size, 3) uint8, orig_width).

    backend "native" routes JPEG/PNG through the C++ kernels
    (native/decoder.cpp: libjpeg/libpng + PIL-compatible triangle
    resample, ±1/255 vs PIL); "draft" additionally enables libjpeg
    DCT-scaled decode (decodes 1/2..1/8-scale when the target is small —
    fastest, slightly different pixels).  Unknown formats or a missing
    native lib fall back to PIL."""
    if backend in ("native", "draft"):
        from swapnet_tpu.data import native

        try:
            with open(path, "rb") as f:
                data = f.read()
            res = native.decode_rgb_resized(
                data, size, jpeg_draft=(backend == "draft"), with_dims=True
            )
        except OSError:
            res = None
        if res is not None:
            img, (w, _h) = res
            return img, w
    img = load_rgb(path)
    return resize_rgb(img, size), img.shape[1]


def save_rgb(img: np.ndarray, path: str) -> None:
    Image.fromarray(np.asarray(img, dtype=np.uint8)).save(path)
