"""Loss-family tests: GAN modes vs torch, gradient penalty, SSIM/Charbonnier,
perceptual loss structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from swapnet_tpu.losses import GANLossConfig, gan_loss, gradient_penalty
from swapnet_tpu.losses.extra import l1_charbonnier, ssim, ssim_loss
from swapnet_tpu.losses.perceptual import PerceptualLossConfig, perceptual_loss
from swapnet_tpu.models.vgg import VGG16Features


@pytest.fixture
def pred():
    return np.random.RandomState(0).randn(2, 6, 6, 1).astype(np.float32)


def test_vanilla_bce_matches_torch(pred):
    cfg = GANLossConfig(gan_mode="vanilla", smooth_labels=False)
    ours_real = gan_loss(jnp.asarray(pred), True, cfg)
    ours_fake = gan_loss(jnp.asarray(pred), False, cfg)
    t = torch.from_numpy(pred)
    ref_real = torch.nn.BCEWithLogitsLoss()(t, torch.ones_like(t))
    ref_fake = torch.nn.BCEWithLogitsLoss()(t, torch.zeros_like(t))
    np.testing.assert_allclose(float(ours_real), float(ref_real), rtol=1e-5)
    np.testing.assert_allclose(float(ours_fake), float(ref_fake), rtol=1e-5)


def test_lsgan_matches_torch(pred):
    cfg = GANLossConfig(gan_mode="lsgan", smooth_labels=False)
    ours = gan_loss(jnp.asarray(pred), True, cfg)
    t = torch.from_numpy(pred)
    ref = torch.nn.MSELoss()(t, torch.ones_like(t))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_wgan_sign(pred):
    cfg = GANLossConfig(gan_mode="wgan", smooth_labels=False)
    assert float(gan_loss(jnp.asarray(pred), True, cfg)) == pytest.approx(
        -pred.mean(), rel=1e-5
    )
    assert float(gan_loss(jnp.asarray(pred), False, cfg)) == pytest.approx(
        pred.mean(), rel=1e-5
    )


def test_smooth_labels_ranges(pred):
    cfg = GANLossConfig(gan_mode="vanilla", smooth_labels=True)
    # different keys -> different targets -> different losses
    l1 = float(gan_loss(jnp.asarray(pred), True, cfg, jax.random.key(0)))
    l2 = float(gan_loss(jnp.asarray(pred), True, cfg, jax.random.key(1)))
    assert l1 != l2


def test_smooth_fake_label_bug_compat(pred):
    """compat flag reproduces the reference bug: fake labels drawn from the
    REAL range (modules/loss.py:101-102)."""
    k = jax.random.key(42)
    buggy = GANLossConfig(gan_mode="vanilla", compat_fake_label_bug=True)
    correct = GANLossConfig(gan_mode="vanilla")
    fake_buggy = float(gan_loss(jnp.asarray(pred), False, buggy, k))
    fake_correct = float(gan_loss(jnp.asarray(pred), False, correct, k))
    real = float(gan_loss(jnp.asarray(pred), True, buggy, k))
    assert fake_buggy == pytest.approx(real)  # same rng, same (real) range
    assert fake_buggy != fake_correct


@pytest.mark.parametrize("mode", ["wgan-gp", "wgan-lp", "dragan-gp", "dragan-lp",
                                  "mescheder-r1-gp", "mescheder-r2-gp"])
def test_gradient_penalty_modes(mode):
    d = lambda x: jnp.sum(x ** 2, axis=(1, 2, 3), keepdims=True)
    r = np.random.RandomState(0)
    real = jnp.asarray(r.randn(4, 8, 8, 3).astype(np.float32))
    fake = jnp.asarray(r.randn(4, 8, 8, 3).astype(np.float32))
    gp = gradient_penalty(d, real, fake, mode, jax.random.key(0))
    assert np.isfinite(float(gp))
    assert float(gp) >= 0


def test_gradient_penalty_zero_for_plain_modes():
    d = lambda x: x.sum()
    z = jnp.zeros((2, 4, 4, 1))
    for mode in ("vanilla", "lsgan", "wgan"):
        assert float(gradient_penalty(d, z, z, mode, jax.random.key(0))) == 0.0


def test_gp_is_differentiable_wrt_d_params():
    """grad-of-grad: penalty must backprop to discriminator params."""
    w = jnp.asarray(np.random.RandomState(1).randn(3, 1).astype(np.float32))

    def loss(w_):
        d = lambda x: jnp.einsum("bhwc,co->bo", x, w_[:, :1] * w_.sum())
        real = jnp.ones((2, 4, 4, 3))
        fake = jnp.zeros((2, 4, 4, 3))
        return gradient_penalty(d, real, fake, "wgan-gp", jax.random.key(0))

    g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_ssim_identity_and_bounds():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32))
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)
    y = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 3).astype(np.float32))
    s = float(ssim(x, y))
    assert -1.0 <= s < 0.9
    assert float(ssim_loss(x, x)) == pytest.approx(0.0, abs=1e-5)


def test_charbonnier_close_to_l1():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32))
    y = jnp.asarray(np.random.RandomState(1).rand(2, 8, 8, 3).astype(np.float32))
    c = float(l1_charbonnier(x, y))
    l1 = float(jnp.mean(jnp.abs(x - y)))
    assert c == pytest.approx(l1, rel=0.05)


def test_perceptual_loss_structure():
    vgg = VGG16Features()
    variables = vgg.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    apply = lambda x: vgg.apply(variables, x)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32))
    y = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3).astype(np.float32))
    content, style = perceptual_loss(apply, x, y, PerceptualLossConfig(use_style=True))
    assert float(content) > 0 and float(style) > 0
    c_same, s_same = perceptual_loss(apply, x, x, PerceptualLossConfig(use_style=True))
    assert float(c_same) == pytest.approx(0.0, abs=1e-8)
    assert float(s_same) == pytest.approx(0.0, abs=1e-4)
    # image-gram compat mode reproduces the reference bug (gram of raw
    # images, perceptual.py:61-63): style becomes independent of features
    _, s_compat = perceptual_loss(
        apply, x, y, PerceptualLossConfig(use_style=True, compat_image_gram=True)
    )
    assert float(s_compat) > 0


def test_bounded_onehot_ce_matches_optax():
    """The dot-form CE (losses/extra.py) must equal torch/optax CE exactly
    for bounded (post-tanh) logits, values AND gradients — it is the warp
    stage's training loss (reference warp_model.py:146-149)."""
    import optax

    from swapnet_tpu.losses.extra import softmax_cross_entropy_bounded_onehot

    r = np.random.RandomState(0)
    logits = jnp.asarray(np.tanh(r.randn(2, 16, 16, 19)).astype(np.float32))
    onehot = jnp.asarray(
        np.eye(19, dtype=np.float32)[r.randint(0, 19, (2, 16, 16))]
    )
    want = optax.softmax_cross_entropy_with_integer_labels(
        logits, jnp.argmax(onehot, -1)
    ).mean()
    got = softmax_cross_entropy_bounded_onehot(logits, onehot)
    assert float(got) == pytest.approx(float(want), rel=1e-6)

    g_want = jax.grad(
        lambda l: optax.softmax_cross_entropy_with_integer_labels(
            l, jnp.argmax(onehot, -1)
        ).mean()
    )(logits)
    g_got = jax.grad(
        lambda l: softmax_cross_entropy_bounded_onehot(l, onehot)
    )(logits)
    np.testing.assert_allclose(
        np.asarray(g_got), np.asarray(g_want), atol=1e-8
    )


def test_vgg_block1_s2d_loss_parity():
    """VGG block 1 width-packed (block1_s2d) + tap1_s2d loss handling is
    numerically identical to the unpacked pipeline: same param tree, same
    content loss, same gradients w.r.t. the image."""
    import jax
    import jax.numpy as jnp

    from swapnet_tpu.losses.perceptual import (
        PerceptualLossConfig, perceptual_loss)
    from swapnet_tpu.models.vgg import VGG16Features

    ref = VGG16Features()
    s2d = VGG16Features(block1_s2d=True)
    x = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3))
    t = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3))
    v = ref.init(jax.random.key(2), x)
    assert jax.tree.structure(
        s2d.init(jax.random.key(2), x)) == jax.tree.structure(v)

    def content(mod, cfg):
        def f(img):
            c, _ = perceptual_loss(
                lambda y: mod.apply(v, y), img, t, cfg)
            return c
        return f

    c_ref = content(ref, PerceptualLossConfig())
    c_s2d = content(s2d, PerceptualLossConfig(tap1_s2d=True))
    l_ref, g_ref = jax.value_and_grad(c_ref)(x)
    l_s2d, g_s2d = jax.value_and_grad(c_s2d)(x)
    assert abs(float(l_ref) - float(l_s2d)) < 1e-6
    assert float(jnp.max(jnp.abs(g_ref - g_s2d))) < 1e-5

    # pool re-entry parity: taps 1..4 must be identical arrays
    taps_ref = ref.apply(v, x)
    taps_s2d = s2d.apply(v, x)
    for a, b in zip(taps_ref[1:], taps_s2d[1:]):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-5
    # tap 0: unpack and compare
    p = taps_s2d[0]
    B, H, W2, C2 = p.shape
    unpacked = p.reshape(B, H, W2, 2, C2 // 2).reshape(B, H, 2 * W2, C2 // 2)
    assert float(jnp.max(jnp.abs(taps_ref[0] - unpacked))) < 1e-5
