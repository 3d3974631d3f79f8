"""VGG16 perceptual (content + style) loss as a pure function.

Functional rework of the reference PerceptualLoss
(reference: modules/losses/perceptual.py:13-79):

  * inputs are mapped [0,1] -> [-1,1] before feature extraction
  * content: MSE between L2-normalized (over channels) features of the
    5 VGG taps, summed (a cosine loss in feature space)
  * style: MSE between Gram matrices.

NOTE the reference computes the Gram matrices of the raw *images* inside
the feature loop — five copies of the same image-gram MSE — instead of
the tap features (perceptual.py:61-63).  The feature-gram style loss
(standard Gatys form, grams of the raw tap features) is the default
here; ``compat_image_gram=True`` reproduces the reference behavior
exactly for checkpoint-parity validation.

The whole thing fuses into the generator loss under jit: target features
are wrapped in stop_gradient (the torch version uses no_grad).

Perf note (profiler-driven, round 3): the normalized-feature MSE is
computed in *cosine form* — three channel reductions per pixel
(sum o^2, sum t^2, sum o*t) instead of materializing the two normalized
feature tensors and re-reading them for the MSE.  At the 128^2 batch-8
texture step the first VGG tap alone is 2x16 MB bf16; the materializing
form cost two extra write+read passes over every tap (and their VJPs),
showing up as ~1.25 ms/step of multiply+reduce fusions in the trace.
The cosine form is algebraically identical to the materialized
normalized-MSE with eps^2 folded inside the norm:
  sum_c (o_hat - t_hat)^2 = |o|^2/(|o|^2+e) + |t|^2/(|t|^2+e)
                            - 2<o,t>/sqrt((|o|^2+e)(|t|^2+e)).
HONESTY NOTE vs the reference: the reference places eps OUTSIDE the
sqrt — x / (sqrt(sum x^2) + 1e-8), modules/losses/perceptual.py:75 —
so the two agree only where feature norms are >> 1e-8 (always true for
real VGG activations, but not bit-identical for exactly-zero feature
columns).  ``compat_eps_outside=True`` reproduces the reference form
exactly for parity tests.
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
    # Exact reference eps placement for parity validation.  The reference
    # normalizes features as x / (sqrt(sum_c x^2) + 1e-8) — eps OUTSIDE the
    # sqrt (reference modules/losses/perceptual.py:75); the fast cosine form
    # below folds eps^2 INSIDE (rsqrt(sum + 1e-16)).  The two differ only
    # for features with |x| within a few orders of magnitude of 1e-8 —
    # negligible for real VGG activations, but not bit-identical.  True
    # materializes the normalized tensors exactly as the reference does
    # (slower: two extra write+read passes per tap).
    compat_eps_outside: bool = False
    # Tap 0 arrives width-packed [B,H,W/2,2C] (VGG16Features.block1_s2d):
    # reshape to [...,2,C] so the channel normalization runs over each
    # true pixel's own C channels — numerically identical to the
    # unpacked loss (the pixel mean is permutation-invariant).
    tap1_s2d: bool = False


def _gram(x: jax.Array) -> jax.Array:
    """Gram matrix over flattened spatial dims, NHWC input.

    Matches reference gram_matrix (perceptual.py:6-10): the torch version
    flattens (B, C, H, W) -> (B*C, H*W) and computes one (B*C, B*C) gram.

    Computed as a direct dot_general contraction over (H, W) — no NHWC ->
    NCHW transpose materialization (trace-measured copies at the 128^2
    step) — in the tap's own dtype with f32 accumulation, so bf16 training
    grams ride the MXU at full rate instead of paying the f32 matmul rate.
    """
    B, H, W, C = x.shape
    g = jax.lax.dot_general(
        x, x,
        dimension_numbers=(((1, 2), (1, 2)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, C, B, C), same (b, c)-major ordering as the (B*C, H*W) reshape
    return g.reshape(B * C, B * C)


_EPS2 = jnp.float32(1e-8**2)


# Layout note (round 4, measured): expressing these channel sums as
# dot_general-with-ones (hoping the contraction's minor-dim preference
# would keep taps channel-minor) compiles to the IDENTICAL program —
# XLA's algebraic simplifier canonicalizes dot-by-ones back to reduce.
# A slice-halving tree avoided the reduce but LOST 44% (ROADMAP.md).
# The actual tap-layout pinner was the feature-gram style loss, removed
# from the default config (compat_image_gram=True is reference parity).


def _normalized_mse(o: jax.Array, t: jax.Array) -> jax.Array:
    """mean over all elements of (o_hat - t_hat)^2 with o_hat = o * rsqrt(
    sum_c o^2 + eps^2), in cosine form: no normalized tensors materialized,
    just three f32 channel reductions XLA fuses into one read of each tap."""
    o32 = o.astype(jnp.float32)
    t32 = t.astype(jnp.float32)
    so = jnp.sum(jnp.square(o32), axis=-1)
    st = jnp.sum(jnp.square(t32), axis=-1)
    ot = jnp.sum(o32 * t32, axis=-1)
    den_o = so + _EPS2
    den_t = st + _EPS2
    per_pixel = (
        so / den_o + st / den_t - 2.0 * ot * jax.lax.rsqrt(den_o * den_t)
    )
    return jnp.mean(per_pixel) / o.shape[-1]


def perceptual_loss(
    vgg_apply,  # callable x -> list of tap features (params already bound)
    output: jax.Array,  # (B, H, W, 3) generated image
    target: jax.Array,  # (B, H, W, 3) ground truth
    cfg: PerceptualLossConfig = PerceptualLossConfig(),
):
    """Returns (content_loss, style_loss) scalars."""

    out_f = vgg_apply(2.0 * output - 1.0)
    tgt_f = [jax.lax.stop_gradient(f) for f in vgg_apply(2.0 * target - 1.0)]

    content = jnp.float32(0.0)
    style = jnp.float32(0.0)
    for i, (o, t) in enumerate(zip(out_f, tgt_f)):
        if i == 0 and cfg.tap1_s2d:
            # unpack the phase axis so axis=-1 is one true pixel's channels
            o = o.reshape(*o.shape[:-1], 2, o.shape[-1] // 2)
            t = t.reshape(*t.shape[:-1], 2, t.shape[-1] // 2)
        if cfg.normalize and cfg.compat_eps_outside:
            o32, t32 = o.astype(jnp.float32), t.astype(jnp.float32)
            o_hat = o32 / (
                jnp.sqrt(jnp.sum(jnp.square(o32), axis=-1, keepdims=True)) + 1e-8
            )
            t_hat = t32 / (
                jnp.sqrt(jnp.sum(jnp.square(t32), axis=-1, keepdims=True)) + 1e-8
            )
            content += jnp.mean(jnp.square(o_hat - t_hat))
        elif cfg.normalize:
            content += _normalized_mse(o, t)
        else:
            content += jnp.mean(
                jnp.square(o.astype(jnp.float32) - t.astype(jnp.float32))
            )
        if cfg.use_style:
            if cfg.compat_image_gram:
                go, gt = _gram(output), _gram(target)
            else:
                if cfg.tap1_s2d:
                    raise ValueError(
                        "feature-gram style loss needs unpacked taps; "
                        "tap1_s2d supports compat_image_gram only")
                # Standard Gatys style loss: grams of the raw tap features.
                go, gt = _gram(o), _gram(t)
            style += jnp.mean(jnp.square(go - jax.lax.stop_gradient(gt)))
    return content, style
