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


def save_checkpoint_orbax(state: GANTrainState, ckpt_dir: str, label) -> None:
    """Orbax backend (--ckpt_backend orbax): one directory per label with
    tensorstore array files.  At multi-host scale each process writes only
    its own shards of a sharded array — the msgpack backend would gather
    everything to host 0.  Layout: {ckpt_dir}/orbax/{label}/ alongside the
    reference-layout files' location."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as cp:
        cp.save(_orbax_dir(ckpt_dir, label), _orbax_payload(state), force=True)


def load_checkpoint_orbax(state: GANTrainState, ckpt_dir: str, label) -> GANTrainState:
    """Restore from the orbax layout into the (template) ``state``.  The
    template's array shardings are preserved: restored arrays land directly
    on the template's devices."""
    import orbax.checkpoint as ocp

    template = _orbax_payload(state)
    with ocp.StandardCheckpointer() as cp:
        restored = cp.restore(_orbax_dir(ckpt_dir, label), template)
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
        if os.path.isdir(_orbax_dir(ckpt_dir, label)):
            import orbax.checkpoint as ocp

            # template-free restore: we only need g_params/g_extra and the
            # full state template (opt states etc.) is not available here
            with ocp.StandardCheckpointer() as cp:
                restored = cp.restore(_orbax_dir(ckpt_dir, label))
            return restored["g_params"], restored.get("g_extra", g_extra_template)
        raise FileNotFoundError(path)
    g_params = _read(path, g_params_template)
    g_extra = g_extra_template
    stats_path = os.path.join(ckpt_dir, f"{label}_stats_generator.msgpack")
    if g_extra_template and os.path.exists(stats_path):
        g_extra = _read(stats_path, g_extra_template)
    return g_params, g_extra
