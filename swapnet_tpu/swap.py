"""Fused two-stage swap — warp + texture as ONE jitted program.

The reference chains the stages through the filesystem (warp writes .npz,
texture re-reads it; inference.py:140-180).  For production serving the
handoff must stay in HBM: this module fuses

    warped = WarpModule(body, cloth)
    onehot = one_hot(argmax(warped))          # the npz round-trip, on-device
    out    = TextureModule(texture, rois, onehot)

into a single XLA program, jitted once at batch 1 for low latency and at
batch N for throughput.  The argmax->one_hot matches the compress/
decompress semantics of the npz interchange (datasets/data_utils.py:
298-343) so fused results equal the two-program pipeline exactly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from swapnet_tpu.models.texture import TextureModule
from swapnet_tpu.models.warp import WarpModule


class FusedSwap:
    """Holds the two generators and exposes jitted swap callables."""

    def __init__(
        self,
        warp_module: WarpModule,
        warp_variables,
        texture_module: TextureModule,
        texture_variables,
    ):
        self.warp = warp_module
        # pin weights in HBM NOW: checkpoint loads hand back host numpy
        # trees, and passing those to a jitted call re-uploads ~800 MB per
        # dispatch (measured 15-30 s/swap over the axon tunnel)
        self.warp_variables = jax.device_put(warp_variables)
        self.texture = texture_module
        self.texture_variables = jax.device_put(texture_variables)
        self._fn = jax.jit(self._swap)

    def _swap(self, warp_vars, tex_vars, body, cloth, texture, rois):
        warped = self.warp.apply(warp_vars, body, cloth, False)
        # npz interchange semantics: argmax -> one-hot
        labels = jnp.argmax(warped, axis=-1)
        onehot = jax.nn.one_hot(labels, warped.shape[-1], dtype=warped.dtype)
        return self.texture.apply(tex_vars, texture, rois, onehot, False)

    def __call__(self, body, cloth, texture, rois):
        """body (B,H,W,3) normalized, cloth (B,H,W,19) one-hot,
        texture (B,H,W,3) normalized, rois (B,12,4) -> (B,H,W,3)."""
        return self._fn(
            self.warp_variables, self.texture_variables, body, cloth, texture, rois
        )

    def warm_up(self, batch: int, size: int) -> None:
        out = self(
            jnp.zeros((batch, size, size, self.warp.body_channels)),
            jnp.zeros((batch, size, size, self.warp.cloth_channels)),
            jnp.zeros((batch, size, size, self.texture.texture_channels)),
            jnp.zeros((batch, self.texture.num_roi, 4)),
        )
        jax.block_until_ready(out)
