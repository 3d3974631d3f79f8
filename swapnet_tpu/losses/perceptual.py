"""VGG16 perceptual (content + style) loss as a pure function.

Functional rework of the reference PerceptualLoss
(reference: modules/losses/perceptual.py:13-79):

  * inputs are mapped [0,1] -> [-1,1] before feature extraction
  * content: MSE between L2-normalized (over channels) features of the
    5 VGG taps, summed (a cosine loss in feature space)
  * style: MSE between Gram matrices.

NOTE the reference computes the Gram matrices of the raw *images* inside
the feature loop — five copies of the same image-gram MSE — instead of
the tap features (perceptual.py:61-63).  The correct feature-gram style
loss is the default here; ``compat_image_gram=True`` reproduces the
reference behavior exactly for checkpoint-parity validation.

The whole thing fuses into the generator loss under jit: target features
are wrapped in stop_gradient (the torch version uses no_grad).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PerceptualLossConfig:
    normalize: bool = True
    use_style: bool = False
    compat_image_gram: bool = False


def _gram(x: jax.Array) -> jax.Array:
    """Gram matrix over flattened spatial dims, NHWC input.

    Matches reference gram_matrix (perceptual.py:6-10): the torch version
    flattens (B, C, H, W) -> (B*C, H*W) and computes one (B*C, B*C) gram.
    """
    B, H, W, C = x.shape
    flat = jnp.transpose(x, (0, 3, 1, 2)).reshape(B * C, H * W).astype(jnp.float32)
    return flat @ flat.T


def perceptual_loss(
    vgg_apply,  # callable x -> list of tap features (params already bound)
    output: jax.Array,  # (B, H, W, 3) generated image
    target: jax.Array,  # (B, H, W, 3) ground truth
    cfg: PerceptualLossConfig = PerceptualLossConfig(),
):
    """Returns (content_loss, style_loss) scalars."""

    def get_features(x):
        feats = vgg_apply(2.0 * x - 1.0)
        if cfg.normalize:
            feats = [
                f
                * jax.lax.rsqrt(
                    jnp.sum(jnp.square(f.astype(jnp.float32)), axis=-1, keepdims=True)
                    + 1e-8 ** 2
                ).astype(f.dtype)
                for f in feats
            ]
        return feats

    out_f = get_features(output)
    tgt_f = [jax.lax.stop_gradient(f) for f in get_features(target)]

    content = jnp.float32(0.0)
    style = jnp.float32(0.0)
    for o, t in zip(out_f, tgt_f):
        content += jnp.mean(jnp.square(o.astype(jnp.float32) - t.astype(jnp.float32)))
        if cfg.use_style:
            if cfg.compat_image_gram:
                go, gt = _gram(output), _gram(target)
            else:
                go, gt = _gram(o), _gram(t)
            style += jnp.mean(jnp.square(go - jax.lax.stop_gradient(gt)))
    return content, style
