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
  * axis "model" — optional parameter/optimizer-state sharding (the
    FSDP / ZeRO-3 analog): each weight tensor's channel axis is split
    across the axis, XLA all-gathers weights into the convs and
    reduce-scatters gradients.  For conv GANs this is the memory lever
    (the 137M-param warp generator + Adam moments is ~2.2 GB replicated);
    channel-TP of 3x3 convs would move the same collectives into every
    layer's activations for no byte win.  NOT combinable with "space"
    on current XLA (see create_mesh).

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
    model: int = 1,
) -> Mesh:
    """Create a ("data", "space", "model") mesh over the given (default:
    all) devices.  Unused axes default to size 1 (a pure-DP mesh is
    ``create_mesh()``); "model" shards parameters/optimizer state
    (see ``state_sharding``), "space" shards image height."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // (space * model)
    assert data * space * model == n, f"mesh {data}x{space}x{model} != {n} devices"
    if space > 1 and model > 1:
        # XLA's SPMD partitioner MISCOMPILES convs whose input is H-sharded
        # while the kernel is channel-sharded (wrong numerics, forward AND
        # vjp, any channel axis — reproduced on the CPU backend, see
        # docs/DESIGN.md "Known partitioner limit").  Each axis is exact in
        # isolation; refuse the combination rather than return wrong math.
        raise ValueError(
            "space>1 and model>1 cannot be combined: XLA SPMD produces "
            "incorrect conv results for spatially-sharded activations with "
            "channel-sharded weights. Use one or the other per run."
        )
    dev_array = np.asarray(devices).reshape(data, space, model)
    return Mesh(dev_array, axis_names=("data", "space", "model"))


def batch_sharding(mesh: Mesh, spatial_axis: Optional[int] = None) -> NamedSharding:
    """Shard dim 0 over "data" (and optionally one spatial dim over "space")."""
    if spatial_axis is None:
        return NamedSharding(mesh, P("data"))
    spec = ["data"] + [None] * 3
    spec[spatial_axis] = "space"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def state_sharding(mesh: Mesh, state):
    """Per-leaf shardings for a training state with parameters and
    optimizer moments sharded over the "model" axis (FSDP / ZeRO-3
    analog; reference is single-GPU so this is green-field).

    Rule: split a leaf's trailing (channel) axis over "model" when it
    divides evenly — conv kernels HWIO/HWOI split their last channel
    axis, per-channel norm scales/biases split their only axis; scalars,
    step counters, and awkward sizes (e.g. the final RGB conv's 3-channel
    bias) stay replicated.  XLA turns these annotations into weight
    all-gathers before each conv and gradient reduce-scatters — no
    manual collectives.  With model=1 every leaf is replicated and this
    degenerates to the DP placement."""
    n = mesh.shape["model"]

    def rule(x):
        shape = getattr(x, "shape", ())
        if len(shape) and n > 1 and shape[-1] % n == 0 and shape[-1] >= n:
            spec = [None] * len(shape)
            spec[-1] = "model"
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, state)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch (pytree of arrays) batch-sharded onto the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
