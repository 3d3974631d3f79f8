"""Checkpointing — file-per-network layout matching the reference.

Reference layout (models/base_model.py:149-213):
  {checkpoints_dir}/{name}/{label}_net_{generator|discriminator}.pth
  {checkpoints_dir}/{name}/{label}_optim_{G|D}.pth
with label in {epoch number, "latest", "iter_N"} and args.json alongside.

Here the same layout with flax msgpack payloads (.msgpack) plus a small
{label}_state.json for step/rng.  ``load_generator_weights`` restores just
the generator for inference, like the reference's load_model_weights.

``--ckpt_backend orbax`` switches to orbax/tensorstore directories
({ckpt_dir}/orbax/{label}/) — at multi-host scale each process writes and
reads only its own array shards, and restore places arrays directly onto
the template state's shardings.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from swapnet_tpu.training.state import GANTrainState


def _write(path: str, tree) -> None:
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))


def _read(path: str, template):
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def _orbax_dir(ckpt_dir: str, label) -> str:
    return os.path.join(os.path.abspath(ckpt_dir), "orbax", str(label))


def _orbax_payload(state: GANTrainState) -> dict:
    """Flat dict-of-pytrees view of the state for orbax (PRNG keys are not
    serializable directly; store the raw key data)."""
    payload = {
        "g_params": state.g_params,
        "g_opt_state": state.g_opt_state,
        "step": state.step,
        "rng": jax.random.key_data(state.rng),
    }
    if state.g_extra:
        payload["g_extra"] = state.g_extra
    if state.d_params is not None:
        payload["d_params"] = state.d_params
        payload["d_opt_state"] = state.d_opt_state
        if state.d_extra:
            payload["d_extra"] = state.d_extra
    if state.frozen is not None:
        payload["frozen"] = state.frozen
    return payload


_ORBAX_CP = None


def _orbax_checkpointer():
    """One process-wide StandardCheckpointer, reused across saves/restores.
    Constructing one per call would spin up (and in multi-process mode,
    barrier-sync) orbax's async machinery every checkpoint; reusing it also
    lets saves overlap training — ``save`` returns once the per-process
    array shards are copied to host, and tensorstore IO completes in the
    background (``wait_until_finished`` / the returned commit closure)."""
    global _ORBAX_CP
    if _ORBAX_CP is None:
        import atexit

        import orbax.checkpoint as ocp

        _ORBAX_CP = ocp.StandardCheckpointer()
        atexit.register(_ORBAX_CP.wait_until_finished)
    return _ORBAX_CP


def _orbax_swap_into_place(ckpt_dir: str, label) -> None:
    """Move {orbax}/.tmp.{label} over {orbax}/{label} without ever deleting
    the old checkpoint before the new one is fully committed (orbax's own
    ``force=True`` rmtree's first — a preemption mid-write would then leave
    NO recoverable 'latest').  Crash windows here leave either the old dir
    at its name or at .old.{label}, both of which the loaders accept."""
    import shutil

    tmp, final = _orbax_dir(ckpt_dir, f".tmp.{label}"), _orbax_dir(ckpt_dir, label)
    stale = _orbax_dir(ckpt_dir, f".old.{label}")
    if os.path.isdir(stale):
        shutil.rmtree(stale)
    if os.path.isdir(final):
        os.rename(final, stale)
    os.rename(tmp, final)
    if os.path.isdir(stale):
        shutil.rmtree(stale)


def _orbax_find(ckpt_dir: str, label) -> Optional[str]:
    """Resolve a label to its orbax directory, falling back to the
    .old.{label} crash-window copy left by an interrupted swap."""
    final = _orbax_dir(ckpt_dir, label)
    if os.path.isdir(final):
        return final
    stale = _orbax_dir(ckpt_dir, f".old.{label}")
    if os.path.isdir(stale):
        return stale
    return None


def save_checkpoint_orbax(state: GANTrainState, ckpt_dir: str, label, wait: bool = True):
    """Orbax backend (--ckpt_backend orbax): one directory per label with
    tensorstore array files.  At multi-host scale each process writes only
    its own shards of a sharded array — the msgpack backend would gather
    everything to host 0 — so ``state`` must be passed with its device
    arrays intact (no ``jax.device_get``).  Layout: {ckpt_dir}/orbax/{label}/
    alongside the reference-layout files' location.

    The write is crash-safe: it lands in .tmp.{label} and is swapped over
    the previous {label} only after orbax commits.  With ``wait=False`` the
    call returns a commit closure once device shards are snapshotted to
    host; the caller runs the closure (IO wait + swap) off-thread."""
    import shutil

    tmp = _orbax_dir(ckpt_dir, f".tmp.{label}")
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)  # leftover from a crashed earlier attempt
    cp = _orbax_checkpointer()
    cp.wait_until_finished()  # serialize with any in-flight save
    payload = _orbax_payload(state)
    if jax.process_count() == 1:
        # Single process: gather to host ourselves — it's the same D2H
        # orbax's snapshot would do, and orbax's own background-thread
        # copy deadlocks on the experimental axon runtime (verified: a
        # 4 MB device array never completes).  Multi-process keeps the
        # device arrays so each process writes only its own shards.
        payload = jax.device_get(payload)
    cp.save(tmp, payload)

    def commit() -> None:
        cp.wait_until_finished()
        _orbax_swap_into_place(ckpt_dir, label)

    if wait:
        commit()
        return None
    return commit


def load_checkpoint_orbax(state: GANTrainState, ckpt_dir: str, label) -> GANTrainState:
    """Restore from the orbax layout into the (template) ``state``.  The
    template's array shardings are preserved (via per-leaf restore args):
    restored arrays land directly on the template's devices.

    Tolerant of optional-component mismatch like the msgpack path: only the
    top-level entries present BOTH on disk and in the template are restored
    (e.g. resuming a --warp_mode ce checkpoint into a gan-mode state leaves
    the fresh d_params/d_opt_state untouched)."""
    import orbax.checkpoint as ocp

    path = _orbax_find(ckpt_dir, label)
    if path is None:
        raise FileNotFoundError(_orbax_dir(ckpt_dir, label))
    cp = _orbax_checkpointer()
    cp.wait_until_finished()
    disk_keys = set(cp.metadata(path).item_metadata.keys())
    template = {k: v for k, v in _orbax_payload(state).items() if k in disk_keys}
    restore_args = ocp.checkpoint_utils.construct_restore_args(template)
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as loader:
        restored = loader.restore(
            path,
            args=ocp.args.PyTreeRestore(
                item=template, restore_args=restore_args, partial_restore=True
            ),
        )
    updates = dict(
        g_params=restored["g_params"],
        g_opt_state=restored["g_opt_state"],
        step=jnp.asarray(restored["step"], jnp.int32),
        rng=jax.random.wrap_key_data(jnp.asarray(restored["rng"], jnp.uint32)),
    )
    if "g_extra" in restored:
        updates["g_extra"] = restored["g_extra"]
    if "d_params" in restored and state.d_params is not None:
        updates["d_params"] = restored["d_params"]
        updates["d_opt_state"] = restored["d_opt_state"]
        if "d_extra" in restored:
            updates["d_extra"] = restored["d_extra"]
    if "frozen" in restored and state.frozen is not None:
        updates["frozen"] = restored["frozen"]
    return state.replace(**updates)


def save_checkpoint(
    state: GANTrainState, ckpt_dir: str, label, backend: str = "msgpack"
) -> None:
    if backend == "orbax":
        return save_checkpoint_orbax(state, ckpt_dir, label)
    os.makedirs(ckpt_dir, exist_ok=True)
    state = jax.device_get(state)
    _write(os.path.join(ckpt_dir, f"{label}_net_generator.msgpack"), state.g_params)
    if state.g_extra:
        _write(os.path.join(ckpt_dir, f"{label}_stats_generator.msgpack"), state.g_extra)
    _write(os.path.join(ckpt_dir, f"{label}_optim_G.msgpack"), state.g_opt_state)
    if state.d_params is not None:
        _write(os.path.join(ckpt_dir, f"{label}_net_discriminator.msgpack"), state.d_params)
        if state.d_extra:
            _write(os.path.join(ckpt_dir, f"{label}_stats_discriminator.msgpack"), state.d_extra)
        _write(os.path.join(ckpt_dir, f"{label}_optim_D.msgpack"), state.d_opt_state)
    if state.frozen is not None:
        _write(os.path.join(ckpt_dir, f"{label}_frozen.msgpack"), state.frozen)
    meta = {
        "step": int(state.step),
        "rng": np.asarray(jax.random.key_data(state.rng)).tolist(),
    }
    with open(os.path.join(ckpt_dir, f"{label}_state.json"), "w") as f:
        json.dump(meta, f)


def checkpoint_exists(ckpt_dir: str, label, backend: str = "msgpack") -> bool:
    """True when a restorable checkpoint with this label is present —
    the --auto_resume probe (preemption-elastic restart: resume when a
    prior run left state, start fresh otherwise)."""
    if backend == "orbax":
        return _orbax_find(ckpt_dir, label) is not None
    return os.path.exists(os.path.join(ckpt_dir, f"{label}_net_generator.msgpack"))


def load_checkpoint(
    state: GANTrainState, ckpt_dir: str, label, backend: str = "msgpack"
) -> GANTrainState:
    """Restore a full training state into the (template) ``state``."""
    if backend == "orbax":
        return load_checkpoint_orbax(state, ckpt_dir, label)
    g_params = _read(
        os.path.join(ckpt_dir, f"{label}_net_generator.msgpack"), state.g_params
    )
    g_extra = state.g_extra
    stats_path = os.path.join(ckpt_dir, f"{label}_stats_generator.msgpack")
    if state.g_extra and os.path.exists(stats_path):
        g_extra = _read(stats_path, state.g_extra)
    g_opt_state = _read(
        os.path.join(ckpt_dir, f"{label}_optim_G.msgpack"), state.g_opt_state
    )
    updates = dict(g_params=g_params, g_extra=g_extra, g_opt_state=g_opt_state)

    if state.d_params is not None:
        d_net = os.path.join(ckpt_dir, f"{label}_net_discriminator.msgpack")
        if os.path.exists(d_net):
            updates["d_params"] = _read(d_net, state.d_params)
            updates["d_opt_state"] = _read(
                os.path.join(ckpt_dir, f"{label}_optim_D.msgpack"), state.d_opt_state
            )
            d_stats = os.path.join(ckpt_dir, f"{label}_stats_discriminator.msgpack")
            if state.d_extra and os.path.exists(d_stats):
                updates["d_extra"] = _read(d_stats, state.d_extra)

    if state.frozen is not None:
        frozen_path = os.path.join(ckpt_dir, f"{label}_frozen.msgpack")
        if os.path.exists(frozen_path):
            updates["frozen"] = _read(frozen_path, state.frozen)

    meta_path = os.path.join(ckpt_dir, f"{label}_state.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        updates["step"] = jnp.asarray(meta["step"], jnp.int32)
        updates["rng"] = jax.random.wrap_key_data(
            jnp.asarray(meta["rng"], jnp.uint32)
        )
    return state.replace(**updates)


def load_generator_weights(ckpt_dir: str, label, g_params_template, g_extra_template=None):
    """Generator-only restore for inference (reference load_model_weights)."""
    path = os.path.join(ckpt_dir, f"{label}_net_generator.msgpack")
    # torch checkpoint? port it instead (params AND batch-norm stats)
    if not os.path.exists(path):
        pth = os.path.join(ckpt_dir, f"{label}_net_generator.pth")
        if os.path.exists(pth):
            from swapnet_tpu.utils import porter

            return porter.port_generator_pth(pth, g_params_template, g_extra_template)
        orbax_path = _orbax_find(ckpt_dir, label)
        if orbax_path is not None:
            import orbax.checkpoint as ocp

            # partial restore of ONLY the generator subtrees — pulling the
            # full training state (both optimizer moments, discriminator,
            # frozen VGG) would read hundreds of extra MB at inference
            # cold-start just to throw them away
            cp = _orbax_checkpointer()
            cp.wait_until_finished()
            disk_keys = set(cp.metadata(orbax_path).item_metadata.keys())
            template = {"g_params": g_params_template}
            if g_extra_template and "g_extra" in disk_keys:
                template["g_extra"] = g_extra_template
            restore_args = ocp.checkpoint_utils.construct_restore_args(template)
            with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as loader:
                restored = loader.restore(
                    orbax_path,
                    args=ocp.args.PyTreeRestore(
                        item=template,
                        restore_args=restore_args,
                        partial_restore=True,
                    ),
                )
            return restored["g_params"], restored.get("g_extra", g_extra_template)
        raise FileNotFoundError(path)
    g_params = _read(path, g_params_template)
    g_extra = g_extra_template
    stats_path = os.path.join(ckpt_dir, f"{label}_stats_generator.msgpack")
    if g_extra_template and os.path.exists(stats_path):
        g_extra = _read(stats_path, g_extra_template)
    return g_params, g_extra
