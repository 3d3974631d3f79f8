"""Training state — one pytree holding both adversaries.

The reference scatters state across mutable nn.Module attributes and two
torch optimizers (models/base_gan.py:130-176); here it is a single
immutable pytree that a fused train step consumes and returns (donated
under jit, so the update is in-place in HBM).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp


class GANTrainState(flax.struct.PyTreeNode):
    step: jax.Array
    rng: jax.Array
    g_params: Any
    g_opt_state: Any
    g_extra: Any  # e.g. {'batch_stats': ...} for batch-norm generators
    d_params: Optional[Any] = None
    d_opt_state: Optional[Any] = None
    d_extra: Optional[Any] = None
    # frozen aux params (e.g. the VGG feature extractor) — carried as a
    # traced argument, NEVER closed over: closure constants get serialized
    # into every XLA compile request (60MB+ -> HTTP 413 on remote compile)
    frozen: Optional[Any] = None

    @classmethod
    def create(cls, rng, g_params, g_opt_state, g_extra=None,
               d_params=None, d_opt_state=None, d_extra=None, frozen=None):
        return cls(
            step=jnp.zeros([], jnp.int32),
            rng=rng,
            g_params=g_params,
            g_opt_state=g_opt_state,
            g_extra=g_extra or {},
            d_params=d_params,
            d_opt_state=d_opt_state,
            d_extra=d_extra if d_extra is not None else ({} if d_params is not None else None),
            frozen=frozen,
        )
