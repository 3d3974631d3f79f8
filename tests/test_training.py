"""End-to-end training-step tests: warp (ce/gan) and texture systems,
including data-parallel execution over the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swapnet_tpu.losses import GANLossConfig
from swapnet_tpu.parallel import batch_sharding, create_mesh, replicated_sharding, shard_batch
from swapnet_tpu.training import TextureSystem, WarpSystem
from swapnet_tpu.training.optimizers import OptimizerConfig

SIZE = 32  # small images for test speed (architectures are fully conv)
WARP_SIZE = 64  # WarpModule minimum: its 6-level cloth encoder halves 6x


def warp_batch(b=2, size=WARP_SIZE, seed=0):
    r = np.random.RandomState(seed)
    onehot = np.eye(19, dtype=np.float32)[r.randint(0, 19, (b, size, size))]
    return {
        "bodys": jnp.asarray(r.randn(b, size, size, 3).astype(np.float32)),
        "input_cloths": jnp.asarray(onehot),
        "target_cloths": jnp.asarray(onehot),
    }


def texture_batch(b=2, size=SIZE, seed=0):
    r = np.random.RandomState(seed)
    rois = r.uniform(2, size - 2, (b, 12, 4)).astype(np.float32)
    rois[..., 2:] = np.minimum(rois[..., :2] + 8, size - 1)
    onehot = np.eye(19, dtype=np.float32)[r.randint(0, 19, (b, size, size))]
    return {
        "input_textures": jnp.asarray(r.randn(b, size, size, 3).astype(np.float32)),
        "rois": jnp.asarray(rois),
        "cloths": jnp.asarray(onehot),
        "target_textures": jnp.asarray(r.randn(b, size, size, 3).astype(np.float32)),
    }


def _loss_decreases(system, batch, key, n=4):
    state = system.init_state(jax.random.key(0), batch)
    step = jax.jit(system.train_step, donate_argnums=0)
    losses = []
    for _ in range(n):
        state, metrics = step(state, batch)
        losses.append(float(metrics[key]))
    assert all(np.isfinite(losses)), losses
    return losses, state


def test_warp_ce_mode_trains():
    """Minimum end-to-end slice: warp in --warp_mode ce (no discriminator)."""
    sys_ = WarpSystem(warp_mode="ce", g_opt=OptimizerConfig(lr=1e-3))
    losses, state = _loss_decreases(sys_, warp_batch(), "loss_G", n=5)
    assert losses[-1] < losses[0], losses
    assert state.d_params is None
    assert int(state.step) == 5


def test_warp_gan_mode_trains():
    sys_ = WarpSystem(warp_mode="gan")
    batch = warp_batch()
    state = sys_.init_state(jax.random.key(0), batch)
    step = jax.jit(sys_.train_step, donate_argnums=0)
    state, m = step(state, batch)
    for k in ("loss_D", "loss_D_real", "loss_D_fake", "loss_G", "loss_G_gan", "loss_G_ce"):
        assert k in m, f"missing metric {k}"
        assert np.isfinite(float(m[k])), (k, m[k])


def test_warp_gan_with_gradient_penalty():
    sys_ = WarpSystem(warp_mode="gan", gan_cfg=GANLossConfig(gan_mode="dragan-gp"))
    batch = warp_batch()
    state = sys_.init_state(jax.random.key(0), batch)
    state, m = jax.jit(sys_.train_step)(state, batch)
    assert "loss_D_gp" in m
    assert np.isfinite(float(m["loss_D_gp"]))


def test_warp_wgan_clamps_weights():
    sys_ = WarpSystem(warp_mode="gan", gan_cfg=GANLossConfig(gan_mode="wgan", smooth_labels=False))
    batch = warp_batch()
    state = sys_.init_state(jax.random.key(0), batch)
    # blow up a weight; the step must clamp before the D update
    state = state.replace(
        d_params=jax.tree.map(lambda p: p + 5.0, state.d_params)
    )
    state, _ = jax.jit(sys_.train_step)(state, batch)
    max_w = max(float(jnp.max(jnp.abs(p))) for p in jax.tree.leaves(state.d_params))
    # clamped to 0.01 cube, then one optimizer step of movement
    assert max_w < 0.1, max_w


def test_warp_adafactor_trains_and_checkpoints(tmp_path):
    """--optimizer_G Adafactor (TPU-native addition): factored second moment
    + bf16 momentum.  The optimizer state must be substantially smaller than
    the f32 params (AdamW's bf16-mu + f32-nu state is ~1.5x params), training
    must still converge, and the state must survive the reference-layout
    checkpoint round-trip."""
    from swapnet_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg = OptimizerConfig(name="Adafactor", lr=1e-3)
    sys_ = WarpSystem(warp_mode="ce", g_opt=cfg)
    losses, state = _loss_decreases(sys_, warp_batch(), "loss_G", n=5)
    assert losses[-1] < losses[0], losses

    opt_bytes = sum(x.nbytes for x in jax.tree.leaves(state.g_opt_state))
    param_bytes = sum(x.nbytes for x in jax.tree.leaves(state.g_params))
    assert opt_bytes < 0.8 * param_bytes, (opt_bytes, param_bytes)

    save_checkpoint(state, str(tmp_path), "latest")
    st2 = WarpSystem(warp_mode="ce", g_opt=cfg).init_state(
        jax.random.key(1), warp_batch()
    )
    st2 = load_checkpoint(st2, str(tmp_path), "latest")
    for a, b in zip(jax.tree.leaves(state.g_opt_state), jax.tree.leaves(st2.g_opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_adafactor_weight_decay_is_lr_scaled():
    """--weight_decay must mean the same thing under Adafactor as under
    AdamW (effective per-step decay = lr * wd); optax.adafactor's raw
    weight_decay_rate is applied after lr scaling, so it must be
    pre-multiplied by lr."""
    from swapnet_tpu.training.optimizers import define_optimizer

    lr, wd = 4e-4, 0.01
    tx = define_optimizer(OptimizerConfig(name="Adafactor", lr=lr, weight_decay=wd))
    params = {"w": jnp.ones((256, 256))}
    opt_state = tx.init(params)
    updates, _ = tx.update(jax.tree.map(jnp.zeros_like, params), opt_state, params)
    # zero grads -> the only update is the decay term
    np.testing.assert_allclose(
        np.asarray(updates["w"]), -lr * wd * np.ones((256, 256)), rtol=1e-5
    )


def test_texture_gan_trains():
    sys_ = TextureSystem(img_size=SIZE)
    batch = texture_batch()
    state = sys_.init_state(jax.random.key(0), batch)
    step = jax.jit(sys_.train_step, donate_argnums=0)
    state, m = step(state, batch)
    for k in ("loss_D", "loss_G", "loss_G_gan", "loss_G_l1", "loss_G_content", "loss_G_style"):
        assert k in m, f"missing metric {k}"
        assert np.isfinite(float(m[k])), (k, float(m[k]))
    fakes = sys_.eval_step(state, batch)
    assert fakes.shape == batch["target_textures"].shape


def test_texture_unet128_variant():
    """--netG unet_128 uses batch norm -> exercises mutable batch_stats."""
    sys_ = TextureSystem(img_size=128, netG="unet_128", lambda_content=0, lambda_style=0)
    batch = texture_batch(b=2, size=128)
    state = sys_.init_state(jax.random.key(0), batch)
    assert "batch_stats" in state.g_extra
    before = jax.tree.leaves(state.g_extra["batch_stats"])[0].copy()
    state, m = jax.jit(sys_.train_step)(state, batch)
    after = jax.tree.leaves(state.g_extra["batch_stats"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after)), "running stats must update"
    assert np.isfinite(float(m["loss_G"]))


def test_warp_ce_data_parallel_8dev():
    """DP over the 8-device mesh: batch sharded, params replicated."""
    mesh = create_mesh(space=1)
    sys_ = WarpSystem(warp_mode="ce")
    batch = warp_batch(b=8)
    state = sys_.init_state(jax.random.key(0), batch)

    state = jax.device_put(state, replicated_sharding(mesh))
    sharded = shard_batch(batch, mesh)
    assert sharded["bodys"].sharding.spec == batch_sharding(mesh).spec

    step = jax.jit(
        sys_.train_step,
        in_shardings=(replicated_sharding(mesh), batch_sharding(mesh)),
        donate_argnums=0,
    )
    state, m = step(state, sharded)
    assert np.isfinite(float(m["loss_G"]))

    # gradient all-reduce check: DP result == single-device result
    sys2 = WarpSystem(warp_mode="ce")
    state2 = sys2.init_state(jax.random.key(0), batch)
    state2, m2 = jax.jit(sys2.train_step)(state2, batch)
    np.testing.assert_allclose(float(m["loss_G"]), float(m2["loss_G"]), rtol=1e-4)
    # reduction-order noise on near-zero grads can flip Adam's sign, moving
    # a param by up to 2*lr = 2e-4; anything beyond that is a real bug.
    p1 = jax.tree.leaves(state.g_params)[0]
    p2 = jax.tree.leaves(state2.g_params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=3e-4)


def test_warp_ce_model_sharded_params_8dev():
    """(data=4, model=2) mesh: batch sharded on "data", parameters +
    optimizer moments split over "model" (FSDP/ZeRO-3 analog).  Must
    reproduce the single-device step: XLA inserts the weight all-gathers /
    grad reduce-scatters itself."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from swapnet_tpu.parallel import state_sharding

    mesh = create_mesh(data=4, model=2)
    sys_ = WarpSystem(warp_mode="ce")
    batch = warp_batch(b=4)
    state = sys_.init_state(jax.random.key(0), batch)

    state_sh = state_sharding(mesh, state)
    # spot-check the rule: conv kernels split their channel axis, the step
    # counter stays replicated
    kernel_sh = [
        s for x, s in zip(jax.tree.leaves(state.g_params), jax.tree.leaves(state_sh))
        if getattr(x, "ndim", 0) == 4
    ]
    assert any(s.spec == P(None, None, None, "model") for s in kernel_sh)
    assert jax.tree.leaves(state_sharding(mesh, {"step": state.step}))[0].spec == P()
    state = jax.device_put(state, state_sh)

    img_sh = NamedSharding(mesh, P("data"))
    batch_shs = {k: img_sh for k in batch}
    sharded = {k: jax.device_put(v, img_sh) for k, v in batch.items()}

    step = jax.jit(
        sys_.train_step, in_shardings=(state_sh, batch_shs), donate_argnums=0
    )
    state, m = step(state, sharded)
    assert np.isfinite(float(m["loss_G"]))

    sys2 = WarpSystem(warp_mode="ce")
    state2 = sys2.init_state(jax.random.key(0), batch)
    state2, m2 = jax.jit(sys2.train_step)(state2, batch)
    np.testing.assert_allclose(float(m["loss_G"]), float(m2["loss_G"]), rtol=1e-4)
    p1 = jax.tree.leaves(state.g_params)[0]
    p2 = jax.tree.leaves(state2.g_params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=3e-4)


def test_space_plus_model_mesh_refused():
    """XLA SPMD miscompiles H-sharded convs with channel-sharded weights
    (wrong numerics, forward and vjp — repro documented in
    parallel/mesh.py); the mesh factory must refuse the combination
    instead of returning wrong math."""
    with pytest.raises(ValueError, match="space.*model|model.*space"):
        create_mesh(data=2, space=2, model=2)


def test_init_state_survives_donated_sibling():
    """Two states from ONE system: donating the first into train_step must
    not delete the second's frozen aux buffers (regression: shared
    _vgg_variables were deleted by donation)."""
    import jax

    from swapnet_tpu.training import TextureSystem

    batch = texture_batch(b=2, size=64)
    system = TextureSystem(img_size=64, lambda_style=0.0)  # perceptual on
    s1 = system.init_state(jax.random.key(0), batch)
    step = jax.jit(system.train_step, donate_argnums=0)
    s1, metrics = step(s1, batch)
    assert jnp.isfinite(metrics["loss_G"])

    s2 = system.init_state(jax.random.key(1), batch)
    s2, metrics2 = step(s2, batch)  # would raise "Array has been deleted" before
    assert jnp.isfinite(metrics2["loss_G"])
