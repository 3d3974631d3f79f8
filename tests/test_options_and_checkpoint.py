"""Options-surface and checkpoint round-trip tests."""

import jax
import numpy as np
import pytest

from swapnet_tpu.options import TrainOptions, TestOptions, load_options
from swapnet_tpu.training import WarpSystem
from swapnet_tpu.training.optimizers import adabound
from swapnet_tpu.utils import checkpoint as ckpt

import jax.numpy as jnp


def _parse_train(extra, store=False):
    return TrainOptions().parse(
        print_options=False, store_options=store,
        args=["--model", "warp", "--dataroot", "/tmp/x"] + extra,
    )


@pytest.mark.smoke
def test_reference_defaults():
    """Key defaults must match the reference CLI (BASELINE.md row 4)."""
    opt = _parse_train([])
    assert opt.load_size == 128 and opt.crop_size == 128
    assert opt.batch_size == 8
    assert opt.n_epochs == 20
    assert opt.lr == 1e-4  # base_gan overrides train default for GAN models
    assert opt.d_lr == 4e-4
    assert opt.b1 == 0.9 and opt.b2 == 0.999
    assert opt.gan_mode == "vanilla"
    assert opt.gan_label_mode == "smooth"
    assert opt.warp_mode == "gan"
    assert opt.lambda_ce == 100
    assert opt.init_type == "kaiming"
    assert opt.cloth_channels == 19 and opt.body_channels == 12
    assert opt.input_transforms == ("hflip", "vflip", "affine", "perspective")
    assert opt.display_ncols == 4  # warp plugin set_defaults


def test_texture_defaults():
    opt = TrainOptions().parse(
        print_options=False, store_options=False,
        args=["--model", "texture", "--dataroot", "/tmp/x"],
    )
    assert opt.netG == "swapnet"
    assert opt.lambda_l1 == 10 and opt.lambda_content == 20
    assert opt.lambda_style == 1e-8
    assert opt.display_ncols == 5
    assert opt.input_transforms == ("hflip", "vflip")


def test_alias_flags():
    opt = _parse_train(["--g_lr", "0.002", "--opt_D", "AdaBound", "--wt_decay", "0.1"])
    assert opt.lr == 0.002
    assert opt.optimizer_D == "AdaBound"
    assert opt.final_lr == 0.1  # adabound modifier kicked in
    assert opt.weight_decay == 0.1


def test_crop_size_validation():
    with pytest.raises(AssertionError):
        _parse_train(["--crop_size", "256", "--load_size", "128"])


def test_test_options_validation():
    with pytest.raises(ValueError, match="warp_checkpoint or texture_checkpoint"):
        TestOptions().parse(
            print_options=False, store_options=False,
            args=["--dataroot", "/tmp/x"],
        )


@pytest.mark.smoke
def test_args_json_roundtrip(tmp_path):
    opt = TrainOptions().parse(
        print_options=False, store_options=True,
        args=["--model", "warp", "--dataroot", "/tmp/x", "--lambda_ce", "55",
              "--checkpoints_dir", str(tmp_path), "--name", "exp"],
    )
    assert (tmp_path / "exp" / "args.json").exists()
    fresh = _parse_train([])
    loaded = load_options(fresh, str(tmp_path / "exp" / "args.json"),
                          user_overrides=False)
    assert loaded.lambda_ce == 55
    assert loaded.name == "exp"


def _tiny_batch(size=64):
    r = np.random.RandomState(0)
    onehot = np.eye(19, dtype=np.float32)[r.randint(0, 19, (2, size, size))]
    return {
        "bodys": jnp.asarray(r.randn(2, size, size, 3).astype(np.float32)),
        "input_cloths": jnp.asarray(onehot),
        "target_cloths": jnp.asarray(onehot),
    }


def test_checkpoint_roundtrip(tmp_path):
    # not smoke-marked: the 64px warp init pushed the smoke suite past its
    # advertised <5 min (the marker text promises options/codec/roi_align/
    # e2e-train, not checkpoint IO)
    system = WarpSystem(warp_mode="gan")
    batch = _tiny_batch()
    state = system.init_state(jax.random.key(0), batch)
    state, _ = jax.jit(system.train_step)(state, batch)
    ckpt.save_checkpoint(state, str(tmp_path), "latest")

    fresh = system.init_state(jax.random.key(1), batch)
    restored = ckpt.load_checkpoint(fresh, str(tmp_path), "latest")
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(state.g_params), jax.tree.leaves(restored.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.d_opt_state), jax.tree.leaves(restored.d_opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # rng restored -> identical next step
    s1, m1 = jax.jit(system.train_step)(state, batch)
    s2, m2 = jax.jit(system.train_step)(restored, batch)
    np.testing.assert_allclose(float(m1["loss_G"]), float(m2["loss_G"]), rtol=1e-6)


def test_orbax_checkpoint_roundtrip(tmp_path):
    """--ckpt_backend orbax: tensorstore layout, full-state round trip, and
    restore-onto-sharding (the restored arrays land on the template's
    devices/sharding — the point of the backend at multi-host scale)."""
    from swapnet_tpu.parallel import create_mesh, replicated_sharding

    system = WarpSystem(warp_mode="gan")
    batch = _tiny_batch()
    state = system.init_state(jax.random.key(0), batch)
    state, _ = jax.jit(system.train_step)(state, batch)
    ckpt.save_checkpoint(state, str(tmp_path), "latest", backend="orbax")
    assert (tmp_path / "orbax" / "latest").is_dir()

    mesh = create_mesh(space=1)
    fresh = system.init_state(jax.random.key(1), batch)
    fresh = jax.device_put(fresh, replicated_sharding(mesh))
    restored = ckpt.load_checkpoint(fresh, str(tmp_path), "latest", backend="orbax")
    assert int(restored.step) == 1
    leaf = jax.tree.leaves(restored.g_params)[0]
    assert leaf.sharding == replicated_sharding(mesh), leaf.sharding
    for a, b in zip(jax.tree.leaves(state.g_params), jax.tree.leaves(restored.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.d_opt_state), jax.tree.leaves(restored.d_opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # rng restored -> identical next step
    s1, m1 = jax.jit(system.train_step)(state, batch)
    s2, m2 = jax.jit(system.train_step)(restored, batch)
    np.testing.assert_allclose(float(m1["loss_G"]), float(m2["loss_G"]), rtol=1e-6)

    # generator-only restore path (inference) from the orbax layout
    g_params, _ = ckpt.load_generator_weights(
        str(tmp_path), "latest", jax.device_get(state.g_params)
    )
    for a, b in zip(jax.tree.leaves(state.g_params), jax.tree.leaves(g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_cross_mode_tolerant_restore(tmp_path):
    """Resuming a --warp_mode ce checkpoint (no discriminator) into a
    gan-mode state must restore G and leave the fresh D untouched, matching
    the msgpack backend's optional-component tolerance (checkpoint.py:150-159)."""
    batch = _tiny_batch()
    ce_state = WarpSystem(warp_mode="ce").init_state(jax.random.key(0), batch)
    ce_state, _ = jax.jit(WarpSystem(warp_mode="ce").train_step)(ce_state, batch)
    assert ce_state.d_params is None
    ckpt.save_checkpoint(ce_state, str(tmp_path), "latest", backend="orbax")

    gan_system = WarpSystem(warp_mode="gan")
    gan_state = gan_system.init_state(jax.random.key(1), batch)
    restored = ckpt.load_checkpoint(gan_state, str(tmp_path), "latest", backend="orbax")
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(ce_state.g_params), jax.tree.leaves(restored.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # discriminator kept from the fresh init (not on disk)
    for a, b in zip(jax.tree.leaves(gan_state.d_params), jax.tree.leaves(restored.d_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the merged state trains
    _, metrics = jax.jit(gan_system.train_step)(restored, batch)
    assert np.isfinite(float(metrics["loss_G"]))


def test_orbax_overwrite_is_atomic(tmp_path):
    """Re-saving 'latest' must never delete the old checkpoint before the
    new one is committed; an interrupted swap (dir parked at .old.latest)
    must still be loadable."""
    import os

    system = WarpSystem(warp_mode="ce")
    batch = _tiny_batch()
    state = system.init_state(jax.random.key(0), batch)
    ckpt.save_checkpoint(state, str(tmp_path), "latest", backend="orbax")
    state, _ = jax.jit(system.train_step)(state, batch)
    ckpt.save_checkpoint(state, str(tmp_path), "latest", backend="orbax")  # overwrite
    fresh = system.init_state(jax.random.key(1), batch)
    restored = ckpt.load_checkpoint(fresh, str(tmp_path), "latest", backend="orbax")
    assert int(restored.step) == 1
    assert not (tmp_path / "orbax" / ".tmp.latest").exists()
    assert not (tmp_path / "orbax" / ".old.latest").exists()

    # simulate a crash between the two renames of the swap
    os.rename(tmp_path / "orbax" / "latest", tmp_path / "orbax" / ".old.latest")
    restored = ckpt.load_checkpoint(fresh, str(tmp_path), "latest", backend="orbax")
    assert int(restored.step) == 1
    g_params, _ = ckpt.load_generator_weights(
        str(tmp_path), "latest", jax.device_get(state.g_params)
    )
    for a, b in zip(jax.tree.leaves(state.g_params), jax.tree.leaves(g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_async_commit_closure(tmp_path):
    """save_checkpoint_orbax(wait=False) returns a commit closure; the
    checkpoint appears at its label only after commit() (the loop runs the
    closure on the AsyncCheckpointer worker thread)."""
    system = WarpSystem(warp_mode="ce")
    batch = _tiny_batch()
    state = system.init_state(jax.random.key(0), batch)
    commit = ckpt.save_checkpoint_orbax(state, str(tmp_path), "latest", wait=False)
    assert commit is not None
    commit()
    assert (tmp_path / "orbax" / "latest").is_dir()
    fresh = system.init_state(jax.random.key(1), batch)
    restored = ckpt.load_checkpoint(fresh, str(tmp_path), "latest", backend="orbax")
    for a, b in zip(jax.tree.leaves(state.g_params), jax.tree.leaves(restored.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_adabound_optimizer_steps():
    tx = adabound(lr=1e-3, final_lr=0.1)
    params = {"w": jnp.ones((4, 4))}
    opt_state = tx.init(params)
    import optax

    for _ in range(3):
        grads = {"w": jnp.full((4, 4), 0.5)}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
    assert np.isfinite(np.asarray(params["w"])).all()
    assert float(params["w"][0, 0]) < 1.0
