"""Host-side datasets — lightweight decode only; transforms run on device.

TPU-native split of the reference datasets (warp_dataset.py,
texture_dataset.py): the host decodes files into small uint8 arrays and
the jitted device pipelines (swapnet_tpu.data.pipelines) do one-hot
expansion, normalization, augmentation and cropping.  This removes the
reference's CPU bottleneck (19 per-channel PIL transforms per sample in
DataLoader workers) and shrinks host->HBM traffic 4x (uint8 vs float32).

Divergence note: the reference augments cloth channels at the *original*
resolution and then resizes (warp_dataset.py:110-160); we resize first
and augment at load_size on device.  Same augmentation semantics, cheaper,
not bit-identical.
"""

from __future__ import annotations

import os
import random
from typing import Dict, Optional

import numpy as np

from swapnet_tpu.data.codec import (
    decompress_cloth_labels,
    decompress_cloth_labels_resized,
)
from swapnet_tpu.data.host_aug import augment_labels_at_original
from swapnet_tpu.data.files import (
    IMG_EXTENSIONS,
    find_valid_files,
    get_corresponding_file,
    get_dir_file_extension,
    remove_extension,
    remove_prefix,
)
from swapnet_tpu.data.image_io import (
    load_rgb,
    load_rgb_resized,
    load_rgb_resized_many,
    resize_rgb,
)
from swapnet_tpu.data.rois import load_rois_csv
from swapnet_tpu.data.stats import get_norm_stats


class _DecodeCache:
    """Thread-safe memoization of file -> decoded uint8 array (--cache_data).

    Caches the *decode* (post-resize uint8), never the item: random
    frame pairing (video mode) and augmentation happen downstream, so
    epochs after the first skip disk/zlib/JPEG work without changing
    training semantics.  ~64 KB/item at 128px: 80k items ~ 5 GB.
    """

    def __init__(self):
        import threading

        self._store: Dict[str, object] = {}  # array or (array, meta) tuple
        self._lock = threading.Lock()

    def get(self, key: str, compute):
        with self._lock:
            hit = self._store.get(key)
        if hit is not None:
            return hit
        val = compute()
        with self._lock:
            self._store[key] = val
        return val

    def peek(self, key: str):
        with self._lock:
            return self._store.get(key)


def _maybe_cache(opt) -> Optional[_DecodeCache]:
    return _DecodeCache() if getattr(opt, "cache_data", False) else None


def _batch_rgb_memo(paths, opt, cache, size) -> dict:
    """Pre-decode a batch's RGB files in one C++ thread-pool call
    (image_io.load_rgb_resized_many) -> {path: (u8 image, orig_w)}.

    Active only for --decode_backend native/draft; already-cached paths
    are skipped.  With backend pil this returns {} so the caller's
    Python thread pool keeps doing per-item PIL decode as before.

    --batch_decode auto (default) enables the batch call only on
    multi-core hosts: the C++ pool's win is real thread parallelism.
    On a single core the one long GIL-released decode burst per batch
    interleaves WORSE with the consumer's device dispatch than per-item
    decodes through the Python pool (measured: 337 -> 264 loader-fed
    train img/s on the 1-core tunnel host), so auto falls back to
    per-item there; "on"/"off" force either path."""
    backend = getattr(opt, "decode_backend", "pil")
    if backend not in ("native", "draft"):
        return {}
    mode = getattr(opt, "batch_decode", "auto")
    if mode == "off" or (mode == "auto" and (os.cpu_count() or 1) < 2):
        return {}
    need, seen = [], set()
    for p in paths:
        if p in seen or (cache is not None and cache.peek(p) is not None):
            continue
        seen.add(p)
        need.append(p)
    if not need:
        return {}
    return load_rgb_resized_many(need, size, backend)


class WarpDataset:
    """Stage-1 dataset (reference datasets/warp_dataset.py:23-183).

    Item (numpy):
      body_paths    str
      bodys_u8      (load, load, 3) uint8   — raw RGB, normalized on device
      cloth_paths   str
      input_labels  (load, load) uint8      — augmented on device at train
      target_labels (load, load) uint8
    """

    def __init__(self, opt, cloth_dir: Optional[str] = None, body_dir: Optional[str] = None):
        self.opt = opt
        self.is_train = opt.is_train
        self.cloth_dir = cloth_dir or os.path.join(opt.dataroot, "cloth")
        extensions = [".npz"] if opt.cloth_representation == "labels" else None
        self.cloth_files = find_valid_files(self.cloth_dir, extensions)
        if not opt.shuffle_data:
            self.cloth_files.sort()

        self.body_dir = body_dir or os.path.join(opt.dataroot, "body")
        if not self.is_train:
            self.body_files = find_valid_files(self.body_dir)
            if not opt.shuffle_data:
                self.body_files.sort()
        self.body_norm_stats = get_norm_stats(os.path.dirname(self.body_dir), "body")
        opt.body_norm_stats = self.body_norm_stats
        self.cache = _maybe_cache(opt)

    def __len__(self):
        if not self.is_train:
            return min(len(self.cloth_files), len(self.body_files))
        return len(self.cloth_files)

    def _labels(self, path: str, size: int) -> np.ndarray:
        if self.cache is not None:
            return self.cache.get(path, lambda: decompress_cloth_labels_resized(path, size))
        return decompress_cloth_labels_resized(path, size)

    def _rgb(self, path: str, size: int, memo: Optional[dict] = None) -> np.ndarray:
        # NO-MUTATION CONTRACT: returned arrays may be views into a shared
        # (n, size, size, 3) batch buffer (memo hits) or cache entries shared
        # across epochs; consumers must treat dataset items as read-only.
        # default_collate's np.stack copies before anything touches device.
        if memo is not None and path in memo:
            img = memo[path][0]
            if self.cache is not None:
                return self.cache.get(path, lambda: img)
            return img
        backend = getattr(self.opt, "decode_backend", "pil")
        if self.cache is not None:
            return self.cache.get(
                path, lambda: load_rgb_resized(path, size, backend)[0]
            )
        return load_rgb_resized(path, size, backend)[0]

    def _body_file(self, index: int) -> str:
        if self.is_train:
            return get_corresponding_file(self.cloth_files[index], self.body_dir)
        return self.body_files[index]

    def getitems(self, indices, pool=None):
        """Batch fetch: body RGBs decode in one C++ thread-pool call
        (no GIL, no per-item Python dispatch); label npz assembly runs in
        the caller's Python pool as before.  Falls back to per-item
        behavior for --decode_backend pil or a missing native lib."""
        size = self.opt.load_size
        memo = _batch_rgb_memo(
            [self._body_file(i) for i in indices], self.opt, self.cache, size
        )
        fetch = lambda i: self.__getitem__(i, _rgb_memo=memo)
        if pool is not None:
            return list(pool.map(fetch, indices))
        return [fetch(i) for i in indices]

    def _labels_original(self, path: str) -> np.ndarray:
        """(H0, W0) uint8 label map at the file's original resolution
        (--aug_at_original compat path)."""
        if self.cache is not None:
            return self.cache.get(
                path + "#orig", lambda: decompress_cloth_labels(path)
            )
        return decompress_cloth_labels(path)

    def __getitem__(
        self, index: int, _rgb_memo: Optional[dict] = None
    ) -> Dict[str, np.ndarray]:
        size = self.opt.load_size
        cloth_file = self.cloth_files[index]
        target_labels = self._labels(cloth_file, size)
        aug_orig = self.is_train and getattr(self.opt, "aug_at_original", False)

        input_file = cloth_file
        if self.is_train:
            if self.opt.dataset_mode == "image":
                input_labels = target_labels
            elif self.opt.dataset_mode == "video":
                # temporal augmentation: a random other frame as the input
                input_file = self.cloth_files[random.randint(0, len(self) - 1)]
                input_labels = None if aug_orig else self._labels(input_file, size)
            else:
                raise ValueError(self.opt.dataset_mode)
        else:
            input_labels = target_labels
        body_file = self._body_file(index)

        body = self._rgb(body_file, size, memo=_rgb_memo)
        item = {
            "body_paths": body_file,
            "bodys_u8": body,
            "cloth_paths": cloth_file,
            "target_labels": target_labels,
        }
        if aug_orig:
            # reference-exact order of operations: augment the input's
            # one-hot channels at ORIGINAL resolution, then nearest-resize
            # (host_aug.py; reference warp_dataset.py:110-166).  Emits a
            # multi-hot (load, load, C) instead of a label map — channels
            # transform independently, so it is no longer single-label.
            rs = np.random.default_rng(random.getrandbits(63))
            transforms = self.opt.input_transforms
            if isinstance(transforms, str):
                transforms = (transforms,)
            item["input_onehot_u8"] = augment_labels_at_original(
                rs,
                self._labels_original(input_file),
                self.opt.cloth_channels,
                size,
                transforms,
            )
        else:
            item["input_labels"] = input_labels
        return item


class TextureDataset:
    """Stage-2 dataset (reference datasets/texture_dataset.py:26-160).

    Item (numpy):
      texture_paths   str
      textures_u8     (load, load, 3) uint8 — target RGB; the randomly
                      flipped *input* copy is created on device
      rois            (12, 4) float32, scaled to load_size
      cloth_paths     str
      cloth_labels    (load, load) uint8
    """

    def __init__(self, opt, texture_dir: Optional[str] = None, cloth_dir: Optional[str] = None):
        self.opt = opt
        self.is_train = opt.is_train
        self.texture_dir = texture_dir or os.path.join(opt.dataroot, "texture")
        self.texture_files = find_valid_files(self.texture_dir, IMG_EXTENSIONS)
        if not opt.shuffle_data:
            # index-paired with the sorted cloth_files at inference; unsorted
            # os.walk order would pair cloth/texture nondeterministically
            # (latent reference bug: it never sorts texture_files)
            self.texture_files.sort()

        self.texture_norm_stats = get_norm_stats(
            os.path.dirname(self.texture_dir), "texture"
        )
        opt.texture_norm_stats = self.texture_norm_stats

        self.cloth_dir = cloth_dir or os.path.join(opt.dataroot, "cloth")
        self.cloth_ext = get_dir_file_extension(self.cloth_dir)
        if not self.is_train:
            self.cloth_files = find_valid_files(self.cloth_dir, extensions=".npz")
            if not opt.shuffle_data:
                self.cloth_files.sort()

        self.rois = load_rois_csv(os.path.join(opt.dataroot, "rois.csv"))
        self.cache = _maybe_cache(opt)

    def __len__(self):
        if self.is_train:
            return len(self.texture_files)
        return min(len(self.texture_files), len(self.cloth_files))

    def _texture(self, path: str, size: int, memo: Optional[dict] = None):
        """(resized uint8, original width) — cached together because the
        ROI scale needs the pre-resize width."""
        if memo is not None and path in memo:
            val = memo[path]
            if self.cache is not None:
                return self.cache.get(path, lambda: val)
            return val

        def compute():
            # PIL width convention (reference texture_dataset.py:116)
            return load_rgb_resized(
                path, size, getattr(self.opt, "decode_backend", "pil")
            )

        if self.cache is not None:
            return self.cache.get(path, compute)
        return compute()

    def getitems(self, indices, pool=None):
        """Batch fetch: texture RGBs decode in one C++ thread-pool call
        (with pre-resize widths for ROI scaling); label npz assembly runs
        in the caller's Python pool.  Per-item fallback for backend pil."""
        size = self.opt.load_size
        memo = _batch_rgb_memo(
            [self.texture_files[i] for i in indices], self.opt, self.cache, size
        )
        fetch = lambda i: self.__getitem__(i, _rgb_memo=memo)
        if pool is not None:
            return list(pool.map(fetch, indices))
        return [fetch(i) for i in indices]

    def __getitem__(
        self, index: int, _rgb_memo: Optional[dict] = None
    ) -> Dict[str, np.ndarray]:
        size = self.opt.load_size
        texture_file = self.texture_files[index]
        texture_u8, original_size = self._texture(texture_file, size, memo=_rgb_memo)

        file_id = remove_prefix(
            remove_extension(texture_file), self.texture_dir + "/"
        )
        cloth_file = (
            os.path.join(self.cloth_dir, file_id + self.cloth_ext)
            if self.is_train
            else self.cloth_files[index]
        )
        if self.cache is not None:
            cloth_labels = self.cache.get(
                cloth_file, lambda: decompress_cloth_labels_resized(cloth_file, size)
            )
        else:
            cloth_labels = decompress_cloth_labels_resized(cloth_file, size)

        scale = float(size) / original_size
        rois = np.rint(self.rois[file_id] * scale).astype(np.float32)

        return {
            "texture_paths": texture_file,
            "textures_u8": texture_u8,
            "rois": rois,
            "cloth_paths": cloth_file,
            "cloth_labels": cloth_labels,
        }
