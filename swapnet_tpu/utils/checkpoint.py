"""Checkpointing — file-per-network layout matching the reference.

Reference layout (models/base_model.py:149-213):
  {checkpoints_dir}/{name}/{label}_net_{generator|discriminator}.pth
  {checkpoints_dir}/{name}/{label}_optim_{G|D}.pth
with label in {epoch number, "latest", "iter_N"} and args.json alongside.

Here the same layout with flax msgpack payloads (.msgpack) plus a small
{label}_state.json for step/rng.  ``load_generator_weights`` restores just
the generator for inference, like the reference's load_model_weights.
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


def save_checkpoint(state: GANTrainState, ckpt_dir: str, label) -> None:
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


def load_checkpoint(state: GANTrainState, ckpt_dir: str, label) -> GANTrainState:
    """Restore a full training state into the (template) ``state``."""
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
        raise FileNotFoundError(path)
    g_params = _read(path, g_params_template)
    g_extra = g_extra_template
    stats_path = os.path.join(ckpt_dir, f"{label}_stats_generator.msgpack")
    if g_extra_template and os.path.exists(stats_path):
        g_extra = _read(stats_path, g_extra_template)
    return g_params, g_extra
