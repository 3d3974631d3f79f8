"""File discovery and cross-directory pairing (reference data_utils.py:91-166,
warp_dataset.py:186-215)."""

from __future__ import annotations

import os
from collections import Counter
from typing import List, Optional, Sequence, Union

IMG_EXTENSIONS = [
    ".jpg", ".JPG", ".jpeg", ".JPEG",
    ".png", ".PNG", ".ppm", ".PPM", ".bmp", ".BMP",
]
NP_EXTENSIONS = [".npz"]


def in_extensions(filename: str, extensions: Sequence[str]) -> bool:
    return any(filename.endswith(ext) for ext in extensions)


def find_valid_files(
    dir: str,
    extensions: Optional[Union[str, Sequence[str]]] = None,
    max_dataset_size: float = float("inf"),
) -> List[str]:
    """Recursively list files under dir with the given extensions."""
    if isinstance(extensions, str):
        extensions = [extensions]
    assert os.path.isdir(dir), f"{dir} is not a valid directory"
    files = []
    # sort fnames too: os.walk yields readdir (hash) order, which would make
    # index-paired datasets nondeterministic across machines/runs
    for root, _, fnames in sorted(os.walk(dir, followlinks=True)):
        for fname in sorted(fnames):
            if in_extensions(fname, extensions if extensions else IMG_EXTENSIONS):
                files.append(os.path.join(root, fname))
    return files[: int(min(max_dataset_size, len(files)))]


def get_dir_file_extension(dir: str, check: int = 5) -> str:
    """Guess the most common file extension in a directory."""
    exts = []
    for root, _, fnames in os.walk(dir, followlinks=True):
        for fname in fnames[:check]:
            ext = os.path.splitext(fname)[1]
            if ext:
                exts.append(ext)
    if not exts:
        raise ValueError(f"did not find any files under dir: {dir}")
    return Counter(exts).most_common(1)[0][0]


def remove_top_dir(path: str, n: int = 1) -> str:
    parts = path.split(os.path.sep)
    return os.path.sep.join(parts[n:])


def remove_extension(fname: str) -> str:
    return os.path.splitext(fname)[0]


def remove_prefix(text: str, prefix: str) -> str:
    return text[len(prefix):] if text.startswith(prefix) else text


def get_corresponding_file(original: str, target_dir: str, target_ext: Optional[str] = None) -> str:
    """Map dataroot/x/body/ID.png -> dataroot/x/cloth/ID.npz etc."""
    num_top_parts = len(target_dir.split(os.path.sep))
    top_removed = remove_top_dir(original, num_top_parts)
    target_file = os.path.join(target_dir, top_removed)
    if not target_ext:
        target_ext = get_dir_file_extension(target_dir)
    return remove_extension(target_file) + target_ext
