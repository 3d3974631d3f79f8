"""Device mesh + sharding rules — the framework's parallelism surface.

The reference is strictly single-process single-GPU (SURVEY.md §2:
"Parallelism & distributed communication"); this module is green-field,
designed for ICI-connected TPU slices (e.g. v5p-8):

  * axis "data"  — batch data parallelism: inputs sharded on batch,
    params replicated, gradients all-reduced by XLA (psum inserted
    automatically from the sharding annotations under jit).
  * axis "space" — optional spatial sharding of the H axis for high-res
    (512^2) texture training; XLA inserts halo exchanges for the conv
    stencils (the "context-parallel" analog for conv GANs).

Everything goes through jax.sharding.NamedSharding; no pmap, no manual
collectives in the model code.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    space: int = 1,
) -> Mesh:
    """Create a ("data", "space") mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // space
    assert data * space == n, f"mesh {data}x{space} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, space)
    return Mesh(dev_array, axis_names=("data", "space"))


def batch_sharding(mesh: Mesh, spatial_axis: Optional[int] = None) -> NamedSharding:
    """Shard dim 0 over "data" (and optionally one spatial dim over "space")."""
    if spatial_axis is None:
        return NamedSharding(mesh, P("data"))
    spec = ["data"] + [None] * 3
    spec[spatial_axis] = "space"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch (pytree of arrays) batch-sharded onto the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
