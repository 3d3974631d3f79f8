"""Device-side batched input transforms (jitted augmentation).

The reference's hottest CPU path is per-channel augmentation: 19
independent PIL affine/perspective/flip transforms per sample inside
DataLoader workers (reference: datasets/data_utils.py:346-361,
datasets/__init__.py:88-110).  TPU-native rework: every one of
{hflip, vflip, affine, perspective} is a homography, so a random
composition of them (torchvision RandomOrder semantics) collapses into
ONE 3x3 matrix per (batch, channel).  The augmentation is then a single
batched nearest-neighbour projective warp under jit — (B, C) matrices,
one gather — instead of B*19 Python/PIL round trips.

Parameter distributions match the reference's torchvision config:
  RandomVerticalFlip(p=.5), RandomHorizontalFlip(p=.5),
  RandomAffine(degrees=10, translate=(.1,.1), scale=(.8,1.2), shear=20),
  RandomPerspective(distortion_scale=.5, p=.5), applied in random order.

Also hosts normalization and the joint image+ROI flips used by the
texture dataset (reference data_utils.py:237-295).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------


def normalize(x, mean, std):
    """(x - mean) / std over the trailing channel dim (NHWC)."""
    mean = jnp.asarray(mean, dtype=x.dtype)
    std = jnp.asarray(std, dtype=x.dtype)
    return (x - mean) / std


def unnormalize(x, mean, std, clamp: bool = True):
    mean = jnp.asarray(mean, dtype=x.dtype)
    std = jnp.asarray(std, dtype=x.dtype)
    y = x * std + mean
    return jnp.clip(y, 0.0, 1.0) if clamp else y


def scale_tensor(x, scale_each: bool = False):
    """Min-max scale to [0,1] for visuals (reference data_utils.py:61-88)."""
    if scale_each:
        axes = tuple(range(1, x.ndim))
        mn = jnp.min(x, axis=axes, keepdims=True)
        mx = jnp.max(x, axis=axes, keepdims=True)
    else:
        mn, mx = jnp.min(x), jnp.max(x)
    return (x - mn) / (mx - mn + 1e-5)


# ---------------------------------------------------------------------------
# homography builders (inverse maps: output pixel -> input pixel)
# ---------------------------------------------------------------------------


def _identity():
    return jnp.eye(3, dtype=jnp.float32)


def _hflip_inv(H, W):
    return jnp.asarray([[-1, 0, W - 1], [0, 1, 0], [0, 0, 1]], jnp.float32)


def _vflip_inv(H, W):
    return jnp.asarray([[1, 0, 0], [0, -1, H - 1], [0, 0, 1]], jnp.float32)


def _affine_inv(rng, H, W, degrees=10.0, translate=(0.1, 0.1), scale=(0.8, 1.2), shear=20.0):
    r_ang, r_tx, r_ty, r_sc, r_sh = jax.random.split(rng, 5)
    ang = jnp.deg2rad(jax.random.uniform(r_ang, (), minval=-degrees, maxval=degrees))
    tx = jax.random.uniform(r_tx, (), minval=-translate[0] * W, maxval=translate[0] * W)
    ty = jax.random.uniform(r_ty, (), minval=-translate[1] * H, maxval=translate[1] * H)
    s = jax.random.uniform(r_sc, (), minval=scale[0], maxval=scale[1])
    sh = jnp.deg2rad(jax.random.uniform(r_sh, (), minval=-shear, maxval=shear))

    cx, cy = (W - 1) * 0.5, (H - 1) * 0.5
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    # forward linear part: scale * rotation @ x-shear
    lin = s * jnp.asarray(
        [[cos, -sin], [sin, cos]], jnp.float32
    ) @ jnp.asarray([[1.0, jnp.tan(sh)], [0.0, 1.0]], jnp.float32)
    fwd = jnp.eye(3, dtype=jnp.float32)
    fwd = fwd.at[:2, :2].set(lin)
    center = jnp.asarray([cx, cy], jnp.float32)
    fwd = fwd.at[:2, 2].set(center + jnp.asarray([tx, ty]) - lin @ center)
    return jnp.linalg.inv(fwd)


def _perspective_inv(rng, H, W, distortion_scale=0.5):
    """torchvision RandomPerspective: corners pulled inward by up to
    distortion_scale/2; the PIL coefficient solve maps output->input, i.e.
    the homography taking the distorted corners back to the originals."""
    half_w = distortion_scale * W // 2
    half_h = distortion_scale * H // 2
    d = jax.random.uniform(rng, (8,))
    # endpoints (distorted corners), same corner order as torchvision:
    # topleft, topright, botright, botleft
    end = jnp.asarray(
        [
            [d[0] * half_w, d[1] * half_h],
            [W - 1 - d[2] * half_w, d[3] * half_h],
            [W - 1 - d[4] * half_w, H - 1 - d[5] * half_h],
            [d[6] * half_w, H - 1 - d[7] * half_h],
        ],
        jnp.float32,
    )
    start = jnp.asarray(
        [[0, 0], [W - 1, 0], [W - 1, H - 1], [0, H - 1]], jnp.float32
    )
    # solve for h: start = P(end) with P a homography (8 unknowns)
    def rows(e, s):
        x, y = e
        u, v = s
        return jnp.asarray(
            [
                [x, y, 1, 0, 0, 0, -u * x, -u * y],
                [0, 0, 0, x, y, 1, -v * x, -v * y],
            ],
            jnp.float32,
        )

    A = jnp.concatenate([rows(end[i], start[i]) for i in range(4)], axis=0)
    b = start.reshape(-1)
    h = jnp.linalg.solve(A, b)
    return jnp.concatenate([h, jnp.ones(1, jnp.float32)]).reshape(3, 3)


_BUILDERS = {
    "hflip": lambda rng, H, W: jnp.where(
        jax.random.bernoulli(rng), _hflip_inv(H, W), _identity()
    ),
    "vflip": lambda rng, H, W: jnp.where(
        jax.random.bernoulli(rng), _vflip_inv(H, W), _identity()
    ),
    "affine": lambda rng, H, W: _affine_inv(rng, H, W),
    "perspective": lambda rng, H, W: jnp.where(
        jax.random.bernoulli(jax.random.fold_in(rng, 1)),
        _perspective_inv(rng, H, W),
        _identity(),
    ),
}


def random_homography(rng: jax.Array, H: int, W: int, transforms: Sequence[str]):
    """One inverse homography composing the requested transforms in random
    order (torchvision RandomOrder).  Returns (3, 3) float32."""
    names = [t for t in transforms if t != "none"]
    if "all" in names:
        names = ["vflip", "hflip", "affine", "perspective"]
    if not names:
        return _identity()
    r_perm, *r_ts = jax.random.split(rng, len(names) + 1)
    mats = jnp.stack([_BUILDERS[n](r, H, W) for n, r in zip(names, r_ts)])
    perm = jax.random.permutation(r_perm, len(names))
    mats = mats[perm]
    # applied first => innermost; inverse map composes in application order
    out = mats[0]
    for i in range(1, len(names)):
        out = out @ mats[i]
    return out


# ---------------------------------------------------------------------------
# warping
# ---------------------------------------------------------------------------


def warp_nearest(img: jax.Array, M_inv: jax.Array) -> jax.Array:
    """Projective warp of one (H, W) plane with nearest sampling, 0 fill
    (PIL default for label images)."""
    H, W = img.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    denom = M_inv[2, 0] * xs + M_inv[2, 1] * ys + M_inv[2, 2]
    sx = (M_inv[0, 0] * xs + M_inv[0, 1] * ys + M_inv[0, 2]) / denom
    sy = (M_inv[1, 0] * xs + M_inv[1, 1] * ys + M_inv[1, 2]) / denom
    rx = jnp.round(sx).astype(jnp.int32)
    ry = jnp.round(sy).astype(jnp.int32)
    valid = (rx >= 0) & (rx < W) & (ry >= 0) & (ry < H)
    idx = jnp.clip(ry, 0, H - 1) * W + jnp.clip(rx, 0, W - 1)
    out = jnp.take(img.reshape(-1), idx.reshape(-1)).reshape(H, W)
    return jnp.where(valid, out, 0)


def per_channel_random_warp(
    rng: jax.Array,
    onehot: jax.Array,  # (B, H, W, C)
    transforms: Sequence[str] = ("hflip", "vflip", "affine", "perspective"),
) -> jax.Array:
    """Independent random homography per (batch, channel) — the device-side
    replacement for the reference's per_channel_transform.  Jit this."""
    B, H, W, C = onehot.shape
    keys = jax.random.split(rng, B * C).reshape(B, C)
    mats = jax.vmap(
        jax.vmap(lambda k: random_homography(k, H, W, transforms))
    )(keys)  # (B, C, 3, 3)
    planes = jnp.transpose(onehot, (0, 3, 1, 2))  # (B, C, H, W)
    warped = jax.vmap(jax.vmap(warp_nearest))(planes, mats)
    return jnp.transpose(warped, (0, 2, 3, 1))


# ---------------------------------------------------------------------------
# joint image + ROI flips (texture stage)
# ---------------------------------------------------------------------------


def flip_rois(rois: jax.Array, axis: int, center: int) -> jax.Array:
    """Reflect ROI min/max coords about center (reference flip_rois_,
    data_utils.py:263-295).  rois (..., 4) = [x1, y1, x2, y2]."""
    if axis == 0:  # vertical flip -> y coords (indices 1, 3)
        mn, mx = 1, 3
    elif axis == 1:  # horizontal flip -> x coords (indices 0, 2)
        mn, mx = 0, 2
    else:
        raise ValueError(f"axis must be 0 or 1, received {axis}")
    new_max = 2 * center - rois[..., mn]
    new_min = 2 * center - rois[..., mx]
    out = rois
    out = out.at[..., mn].set(new_min)
    out = out.at[..., mx].set(new_max)
    return out


def random_image_roi_flip(
    rng: jax.Array,
    img: jax.Array,  # (B, H, W, C)
    rois: jax.Array,  # (B, R, 4)
    vp: float = 0.5,
    hp: float = 0.5,
) -> Tuple[jax.Array, jax.Array]:
    """Per-sample random flips applied to image and ROIs in lockstep
    (reference random_image_roi_flip, data_utils.py:237-260)."""
    B, H, W, _ = img.shape
    r_v, r_h = jax.random.split(rng)
    do_v = jax.random.uniform(r_v, (B,)) < vp
    do_h = jax.random.uniform(r_h, (B,)) < hp

    img = jnp.where(do_v[:, None, None, None], jnp.flip(img, axis=1), img)
    rois = jnp.where(
        do_v[:, None, None], flip_rois(rois, 0, int(H / 2)), rois
    )
    img = jnp.where(do_h[:, None, None, None], jnp.flip(img, axis=2), img)
    rois = jnp.where(
        do_h[:, None, None], flip_rois(rois, 1, int(W / 2)), rois
    )
    return img, rois


# ---------------------------------------------------------------------------
# cropping (center crop bounds, reference base_dataset.py:51-58)
# ---------------------------------------------------------------------------


def center_crop_bounds(load_size: int, crop_size: int):
    if crop_size < load_size:
        minimum = int((load_size - crop_size) / 2)
        maximum = load_size - minimum
        return (minimum, minimum), (maximum, maximum)
    return None


def parse_crop_bounds(value):
    """Parse a ``--crop_bounds`` value into ((xmin,ymin),(xmax,ymax)).

    The reference evals the raw CLI string (base_dataset.py:57); here it's
    ast.literal_eval (no code execution) and accepts an already-structured
    tuple/list (e.g. round-tripped through args.json).  Returns None for
    falsy input; raises ValueError on malformed bounds.
    """
    if not value:
        return None
    if isinstance(value, str):
        import ast

        try:
            value = ast.literal_eval(value)
        except (ValueError, SyntaxError) as e:
            raise ValueError(f"malformed --crop_bounds {value!r}") from e
    try:
        (x_min, y_min), (x_max, y_max) = value
        bounds = (int(x_min), int(y_min)), (int(x_max), int(y_max))
    except (TypeError, ValueError) as e:
        raise ValueError(
            f"--crop_bounds must be ((xmin, ymin), (xmax, ymax)), got {value!r}"
        ) from e
    if bounds[0][0] >= bounds[1][0] or bounds[0][1] >= bounds[1][1]:
        raise ValueError(f"--crop_bounds min must be < max, got {bounds}")
    return bounds


def resolve_crop_bounds(load_size: int, crop_size: int, crop_bounds=None):
    """Reference precedence (base_dataset.py:51-58): a center crop derived
    from crop_size < load_size wins; otherwise explicit crop_bounds."""
    centered = center_crop_bounds(load_size, crop_size)
    if centered is not None:
        return centered
    return parse_crop_bounds(crop_bounds)


def crop_tensors(x: jax.Array, crop_bounds) -> jax.Array:
    """Crop NHWC tensors to ((x_min, y_min), (x_max, y_max))."""
    (x_min, y_min), (x_max, y_max) = crop_bounds
    return x[:, y_min:y_max, x_min:x_max, :]


def crop_rois(rois, crop_bounds):
    """Clip + shift ROI coords into the crop (reference data_utils.py:197-234)."""
    if crop_bounds is None:
        return rois
    (x_min, y_min), (x_max, y_max) = crop_bounds
    xs = jnp.clip(rois[..., 0::2], x_min, x_max - 1) - x_min
    ys = jnp.clip(rois[..., 1::2], y_min, y_max - 1) - y_min
    return jnp.stack([xs[..., 0], ys[..., 0], xs[..., 1], ys[..., 1]], axis=-1)
