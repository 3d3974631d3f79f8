"""Jitted device-side batch preparation — host uint8 -> model-ready batches.

Completes the TPU-native input pipeline split (see datasets.py): each
``prepare_*`` function is a pure jittable map from the host collated batch
(uint8 images / label maps) to the float batch the training systems
consume, fusing one-hot expansion, normalization, augmentation and
center-cropping into one XLA program that runs on-device, overlapped with
the previous step via the prefetching loader.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from swapnet_tpu.data.codec import labels_to_onehot
from swapnet_tpu.data.transforms import (
    crop_rois,
    crop_tensors,
    normalize,
    per_channel_random_warp,
    random_image_roi_flip,
    resolve_crop_bounds,
)


@dataclasses.dataclass(frozen=True)
class WarpPipelineConfig:
    cloth_channels: int = 19
    load_size: int = 128
    crop_size: int = 128
    body_norm_stats: Tuple[Tuple[float, ...], Tuple[float, ...]] = (
        (0.0, 0.0, 0.0), (1.0, 1.0, 1.0),
    )
    input_transforms: Sequence[str] = ("hflip", "vflip", "affine", "perspective")
    per_channel_transform: bool = True
    # --aug_at_original: the host already augmented at original resolution
    # (data/host_aug.py) and the batch carries a multi-hot input_onehot_u8;
    # skip the device-side warp
    aug_at_original: bool = False
    train: bool = True
    # explicit ((xmin,ymin),(xmax,ymax)); only active when crop_size >=
    # load_size (reference base_dataset.py:51-58)
    crop_bounds: Optional[Tuple[Tuple[int, int], Tuple[int, int]]] = None


def prepare_warp_batch(cfg: WarpPipelineConfig, rng: Optional[jax.Array], batch):
    """{bodys_u8, input_labels, target_labels} -> warp model batch."""
    bodys = batch["bodys_u8"].astype(jnp.float32) / 255.0
    bodys = normalize(bodys, *cfg.body_norm_stats)
    targets = labels_to_onehot(batch["target_labels"], cfg.cloth_channels)

    if cfg.train and cfg.aug_at_original:
        inputs = batch["input_onehot_u8"].astype(jnp.float32)
    else:
        inputs = labels_to_onehot(batch["input_labels"], cfg.cloth_channels)
        if cfg.train and rng is not None:
            if cfg.per_channel_transform:
                inputs = per_channel_random_warp(rng, inputs, cfg.input_transforms)
            else:
                raise NotImplementedError("per_channel_transform must be true")

    bounds = resolve_crop_bounds(cfg.load_size, cfg.crop_size, cfg.crop_bounds)
    if bounds is not None:
        bodys = crop_tensors(bodys, bounds)
        inputs = crop_tensors(inputs, bounds)
        targets = crop_tensors(targets, bounds)
    return {"bodys": bodys, "input_cloths": inputs, "target_cloths": targets}


def make_warp_preprocessor(cfg: WarpPipelineConfig):
    return jax.jit(partial(prepare_warp_batch, cfg))


@dataclasses.dataclass(frozen=True)
class TexturePipelineConfig:
    cloth_channels: int = 19
    load_size: int = 128
    crop_size: int = 128
    texture_norm_stats: Tuple[Tuple[float, ...], Tuple[float, ...]] = (
        (0.0, 0.0, 0.0), (1.0, 1.0, 1.0),
    )
    input_transforms: Sequence[str] = ("hflip", "vflip")
    train: bool = True
    crop_bounds: Optional[Tuple[Tuple[int, int], Tuple[int, int]]] = None


def prepare_texture_batch(cfg: TexturePipelineConfig, rng: Optional[jax.Array], batch):
    """{textures_u8, rois, cloth_labels} -> texture model batch.

    The input texture is a randomly flipped copy of the target with ROIs
    flipped in lockstep (reference texture_dataset.py:121-134).
    """
    targets = batch["textures_u8"].astype(jnp.float32) / 255.0
    targets = normalize(targets, *cfg.texture_norm_stats)
    cloths = labels_to_onehot(batch["cloth_labels"], cfg.cloth_channels)
    rois = batch["rois"].astype(jnp.float32)

    inputs = targets
    if cfg.train and rng is not None:
        hp = 0.5 if any(t in cfg.input_transforms for t in ("hflip", "all")) else 0.0
        vp = 0.5 if any(t in cfg.input_transforms for t in ("vflip", "all")) else 0.0
        inputs, rois = random_image_roi_flip(rng, targets, rois, vp=vp, hp=hp)

    bounds = resolve_crop_bounds(cfg.load_size, cfg.crop_size, cfg.crop_bounds)
    if bounds is not None:
        inputs = crop_tensors(inputs, bounds)
        targets = crop_tensors(targets, bounds)
        cloths = crop_tensors(cloths, bounds)
        rois = crop_rois(rois, bounds)

    return {
        "input_textures": inputs,
        "rois": rois,
        "cloths": cloths,
        "target_textures": targets,
    }


def make_texture_preprocessor(cfg: TexturePipelineConfig):
    return jax.jit(partial(prepare_texture_batch, cfg))
