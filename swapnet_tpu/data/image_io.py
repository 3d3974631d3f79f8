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


def load_rgb_resized_many(
    paths, size: int, backend: str = "pil", nthreads: int = 0
) -> dict:
    """Batched fused decode+resize -> {path: ((size,size,3) u8, orig_w)}.

    With backend "native"/"draft" the whole batch is decoded by the C++
    thread pool in ONE ctypes call (native.decode_rgb_resized_batch) —
    the torch-DataLoader-worker analog for multi-core hosts; items the
    native path can't handle (exotic formats) fall back to PIL per item.
    With backend "pil" (or no native lib) every item goes through
    ``load_rgb_resized`` serially — callers that hold a thread pool
    should prefer per-item calls in that case."""
    paths = list(paths)
    if backend in ("native", "draft"):
        from swapnet_tpu.data import native

        blobs, readable = [], []
        for p in paths:
            try:
                with open(p, "rb") as f:
                    blobs.append(f.read())
                readable.append(p)
            except OSError:
                pass
        if blobs:
            res = native.decode_rgb_resized_batch(
                blobs, size, jpeg_draft=(backend == "draft"),
                nthreads=nthreads, with_dims=True,
            )
            if res is not None:
                arr, failed, whs = res
                bad = set(failed)
                out = {
                    p: (arr[i], int(whs[i, 0]))
                    for i, p in enumerate(readable)
                    if i not in bad
                }
                for p in paths:
                    if p not in out:
                        # these items just failed (or were unreadable by) the
                        # native path — go straight to PIL, don't retry native
                        out[p] = load_rgb_resized(p, size, "pil")
                return out
    return {p: load_rgb_resized(p, size, backend) for p in paths}


def save_rgb(img: np.ndarray, path: str) -> None:
    Image.fromarray(np.asarray(img, dtype=np.uint8)).save(path)
