"""Multi-host input sharding (SURVEY.md §7 item 9).

On a multi-host slice every process loads only its local shard of the
global batch; ``global_batch_from_local`` assembles a global jax.Array
from per-process data (DCN never sees the raw batch).  Single-host it
degenerates to a plain device_put, so the same training loop runs
anywhere.  Untestable beyond single-host in this environment — exercised
in its degenerate form by the training loop.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def local_batch_slice(global_len: int) -> slice:
    """The half-open [start, stop) range of the global batch this process
    should load."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_len // n
    assert per * n == global_len, (
        f"global batch {global_len} must divide process count {n}"
    )
    return slice(i * per, (i + 1) * per)


def global_batch_from_local(local_batch, mesh: Mesh, spec: P = None):
    """Assemble a global batch-sharded array pytree from process-local
    numpy data (jax.make_array_from_process_local_data).  Default spec
    shards dim 0 over the mesh's data axes (("slice","data") when the
    mesh is multi-slice, else "data")."""
    if spec is None:
        from swapnet_tpu.parallel.mesh import data_axes

        spec = P(data_axes(mesh))
    sharding = NamedSharding(mesh, spec)

    def put(x):
        if not isinstance(x, np.ndarray):
            return x
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, local_batch)
