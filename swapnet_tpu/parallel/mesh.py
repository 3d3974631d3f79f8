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
  * axis "slice" — multi-slice (DCN) data parallelism.  Only present
    when ``create_mesh(slices=N)`` with N > 1: the outermost mesh axis
    maps to TPU slice boundaries (chips within a slice talk over ICI;
    slices talk over the much slower data-center network).  The ONLY
    collective that rides DCN is the once-per-step gradient all-reduce
    over ("slice", "data") — everything bandwidth-hungry (conv halo
    exchanges on "space", FSDP weight all-gathers on "model") stays
    inside a slice on ICI.  On real hardware the device order comes from
    ``mesh_utils.create_hybrid_device_mesh`` (slice_index-aware) so the
    hierarchy is physical, not cosmetic; off-TPU (tests, dryrun) a plain
    reshape stands in.

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
    slices: int = 1,
) -> Mesh:
    """Create a ("data", "space", "model") mesh over the given (default:
    all) devices.  Unused axes default to size 1 (a pure-DP mesh is
    ``create_mesh()``); "model" shards parameters/optimizer state
    (see ``state_sharding``), "space" shards image height.

    ``slices > 1`` prepends a "slice" axis for multi-slice (DCN) data
    parallelism: ``data``/``space``/``model`` then describe the layout
    WITHIN one ICI-connected slice and the global batch is sharded over
    ("slice", "data") (see ``batch_sharding``).  With slices == 1 the
    mesh has no "slice" axis, so all single-slice PartitionSpecs are
    unchanged."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // (slices * space * model)
    assert slices * data * space * model == n, (
        f"mesh {slices}x{data}x{space}x{model} != {n} devices"
    )
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
    if slices == 1:
        dev_array = np.asarray(devices).reshape(data, space, model)
        return Mesh(dev_array, axis_names=("data", "space", "model"))
    dev_array = _hybrid_device_array(devices, slices, (data, space, model))
    return Mesh(dev_array, axis_names=("slice", "data", "space", "model"))


def _hybrid_device_array(devices, slices: int, ici_shape) -> np.ndarray:
    """Order devices so the "slice" axis follows physical slice boundaries.

    Real multi-slice TPU devices carry ``slice_index``; group by it so
    intra-slice axes ride ICI and only "slice" crosses DCN (the layout
    ``mesh_utils.create_hybrid_device_mesh`` produces).  CPU/test devices
    have no slice_index — fall back to contiguous grouping, which is the
    same communication pattern logically (and exact numerically)."""
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    if len(slice_ids) == slices and None not in slice_ids:
        from jax.experimental import mesh_utils

        return mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, *ici_shape),
            dcn_mesh_shape=(slices, 1, 1, 1),
            devices=devices,
        )
    return np.asarray(devices).reshape(slices, *ici_shape)


def data_axes(mesh: Mesh):
    """The mesh axes the batch dim is sharded over — ("slice", "data") on
    a multi-slice mesh, "data" otherwise.  Gradient psums run over these."""
    return ("slice", "data") if "slice" in mesh.axis_names else "data"


def batch_sharding(mesh: Mesh, spatial_axis: Optional[int] = None) -> NamedSharding:
    """Shard dim 0 over the data axes (and optionally one spatial dim
    over "space")."""
    if spatial_axis is None:
        return NamedSharding(mesh, P(data_axes(mesh)))
    spec = [data_axes(mesh)] + [None] * 3
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
