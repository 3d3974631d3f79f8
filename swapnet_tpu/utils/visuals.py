"""Visualization helpers: label-palette decode, ROI overlays, tensor->image.

TPU-native rework of util/decode_labels.py (its pixel-by-pixel PIL loop
becomes a single palette gather) and util/draw_rois.py (seaborn palette
hard-coded to drop the dependency).  NHWC throughout.
"""

from __future__ import annotations

import colorsys

import numpy as np
from PIL import Image, ImageDraw

# LIP 19-label palette (reference util/decode_labels.py:7-21, sunglasses
# removed).
LABEL_COLOURS = np.asarray(
    [
        (0, 0, 0),        # 0  Background
        (128, 0, 0),      # 1  Hat
        (255, 0, 0),      # 2  Hair
        (0, 85, 0),       # 3  Glove
        (255, 85, 0),     # 4  UpperClothes (sunglasses removed upstream)
        (0, 0, 85),       # 5  Dress
        (0, 119, 221),    # 6  Coat
        (85, 85, 0),      # 7  Socks
        (0, 85, 85),      # 8  Pants
        (85, 51, 0),      # 9  Jumpsuits
        (52, 86, 128),    # 10 Scarf
        (0, 128, 0),      # 11 Skirt
        (0, 0, 255),      # 12 Face
        (51, 170, 221),   # 13 LeftArm
        (0, 255, 255),    # 14 RightArm
        (85, 255, 170),   # 15 LeftLeg
        (170, 255, 85),   # 16 RightLeg
        (255, 255, 0),    # 17 LeftShoe
        (255, 170, 0),    # 18 RightShoe
    ],
    dtype=np.uint8,
)

NUM_BODY_LABELS = 12


def _hls_palette(n: int) -> np.ndarray:
    """seaborn.color_palette("hls", n) without seaborn: evenly spaced hues
    at l=0.6, s=0.65 (seaborn defaults)."""
    cols = [
        colorsys.hls_to_rgb((i / n) % 1.0, 0.6, 0.65) for i in range(n)
    ]
    return (np.asarray(cols) * 255).astype(np.uint8)


BODY_COLORS = _hls_palette(NUM_BODY_LABELS)


def decode_cloth_labels(onehot_or_labels, num_classes: int = 19) -> np.ndarray:
    """(B,H,W,C) one-hot / logits or (B,H,W) labels -> (B,H,W,3) uint8 RGB.

    One vectorized palette gather (the reference loops pixels in PIL,
    decode_labels.py:24-55).
    """
    x = np.asarray(onehot_or_labels)
    labels = x.argmax(axis=-1) if x.ndim == 4 else x
    labels = np.clip(labels, 0, num_classes - 1).astype(np.int32)
    return LABEL_COLOURS[labels]


def tensor2im(x, mean=None, std=None) -> np.ndarray:
    """(B,H,W,3) float in [-1,1] (or normalized by stats) -> (B,H,W,3) uint8.

    Matches util/util.py:9-32: if stats given, unnormalize; else map
    [-1,1] -> [0,255].
    """
    x = np.asarray(x, dtype=np.float32)
    if mean is not None:
        x = x * np.asarray(std, np.float32) + np.asarray(mean, np.float32)
        x = np.clip(x, 0.0, 1.0)
    else:
        x = (x + 1.0) / 2.0
        x = np.clip(x, 0.0, 1.0)
    return (x * 255.0).round().astype(np.uint8)


def draw_rois_on_texture(rois, textures_uint8: np.ndarray, width_factor: float = 0.01) -> np.ndarray:
    """Draw the 12 body-part ROI rectangles (reference draw_rois.py:16-47).

    rois (B,12,4), textures (B,H,W,3) uint8 -> (B,H,W,3) uint8.
    """
    rois = np.asarray(rois)
    out = []
    for roi_batch, img in zip(rois, textures_uint8):
        im = Image.fromarray(np.asarray(img, np.uint8))
        draw = ImageDraw.Draw(im)
        w = int(round(width_factor * im.size[0]))
        for i, r in enumerate(roi_batch):
            x1, y1, x2, y2 = [float(v) for v in r]
            if x2 < x1:
                x1, x2 = x2, x1
            if y2 < y1:
                y1, y2 = y2, y1
            draw.rectangle((x1, y1, x2, y2), outline=tuple(BODY_COLORS[i]), width=w)
        out.append(np.asarray(im))
    return np.stack(out)
