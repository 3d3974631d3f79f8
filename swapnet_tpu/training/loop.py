"""Training driver — the reference train.py loop, TPU-native.

Differences from the reference loop (train.py:31-119):
  * the whole optimization step is ONE jitted program with donated state;
    metrics stay on device and are only fetched at print_freq boundaries
    so the step pipeline never stalls,
  * batches are device_put batch-sharded over the ("data",) mesh axis
    before the jitted preprocessor (one-hot, normalize, augment) runs
    on-device,
  * checkpoint cadence and filenames match the reference
    (latest_checkpoint_freq iters / checkpoint_freq epochs ->
    {label}_net_{...}; models/base_model.py:149-173, train.py:93-116).
"""

from __future__ import annotations

import os
import threading
import time

import jax
import numpy as np

from swapnet_tpu.parallel import batch_sharding, create_mesh, replicated_sharding
from swapnet_tpu.training.registry import (
    compute_visuals,
    create_dataset,
    create_preprocessor,
    create_system,
)
from swapnet_tpu.utils import checkpoint as ckpt
from swapnet_tpu.utils.visualizer import Visualizer


from swapnet_tpu.data.loader import array_part as _array_part  # noqa: E402


class AsyncCheckpointer:
    """Overlap checkpoint serialization with training.  msgpack backend:
    device_get on the caller (cheap, one sync), file IO on a worker thread.
    orbax backend: the state is handed over with its device arrays intact;
    save_checkpoint_orbax gathers to host itself when single-process and
    keeps device arrays at multi-host scale (device_get would gather
    shards spanning non-addressable devices — a crash — and defeat
    orbax's per-process sharded IO).  The commit (tensorstore wait +
    atomic label swap) runs on the worker thread.  The reference
    round-trips every net through the CPU synchronously
    (models/base_model.py:149-173)."""

    def __init__(self, backend: str = "msgpack"):
        self._thread = None
        self.backend = backend

    def save(self, state, ckpt_dir: str, label) -> None:
        from swapnet_tpu.utils import checkpoint as ckpt

        self.wait()
        if self.backend == "orbax":
            commit = ckpt.save_checkpoint_orbax(state, ckpt_dir, label, wait=False)
            self._thread = threading.Thread(target=commit, daemon=True)
        else:
            host_state = jax.device_get(state)
            self._thread = threading.Thread(
                target=ckpt.save_checkpoint,
                args=(host_state, ckpt_dir, label, self.backend),
                daemon=True,
            )
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None


def build_tick(system, preprocess, grad_accum: int = 1):
    """ONE jitted program per training iteration: rng advance + device-side
    preprocess (one-hot/normalize/augment) + fused GAN step.  Collapsing
    the per-step host->device dispatches (split, preprocess, step) to a
    single call matters under high-latency runtimes (the axon tunnel costs
    ~ms per dispatch; benchmarks/input_pipeline.py measures the effect).

    ``grad_accum`` > 1 splits the (augmented) batch into that many
    micro-batches and runs the accumulated step (train_step_accum): same
    effective batch, one micro-batch of activations live.

    The rng argument is NOT donated so the caller can re-derive the
    preprocess key (split(rng)[1]) to rebuild the displayed batch.
    """
    import jax as _jax

    def tick(state, rng, arrays):
        rng2, r_pre = _jax.random.split(rng)
        batch = preprocess(r_pre, arrays)
        if grad_accum > 1:
            batch = _jax.tree.map(
                lambda x: x.reshape(
                    (grad_accum, x.shape[0] // grad_accum) + x.shape[1:]
                ),
                batch,
            )
            state, metrics = system.train_step_accum(state, batch)
        else:
            state, metrics = system.train_step(state, batch)
        return state, rng2, metrics

    return _jax.jit(tick, donate_argnums=0)


def train(opt):
    dataset, loader = create_dataset(opt)
    print(f"The number of training images = {len(loader):d}")

    # stamp the run's step horizon for LR schedules before the optimizers
    # are built (optimizers.from_options reads schedule_total_steps)
    steps_per_epoch = max(1, len(loader) // opt.batch_size)
    opt.schedule_total_steps = steps_per_epoch * max(
        1, opt.n_epochs - opt.start_epoch
    )
    system = create_system(opt)
    preprocess = create_preprocessor(opt, dataset)
    visualizer = Visualizer(opt)
    ckpt_dir = os.path.join(opt.checkpoints_dir, opt.name)

    n_slice = min(max(1, getattr(opt, "dcn_slices", 1)), len(jax.devices()))
    n_model = min(max(1, getattr(opt, "shard_params", 1)),
                  len(jax.devices()) // n_slice)
    n_space = min(max(1, getattr(opt, "shard_space", 1)),
                  len(jax.devices()) // (n_slice * n_model))
    n_dp = opt.data_parallel or len(jax.devices()) // (n_model * n_slice * n_space)
    n_dp = max(1, min(n_dp, len(jax.devices()) // (n_model * n_slice * n_space)))
    # batch dim is sharded over slice*data devices
    while n_dp > 1 and opt.batch_size % (n_dp * n_slice):
        n_dp -= 1
    if opt.batch_size % (n_dp * n_slice):
        raise ValueError(
            f"--batch_size {opt.batch_size} not divisible by "
            f"--dcn_slices {n_slice}"
        )
    if n_space > 1 and getattr(opt, "cache_device", False):
        raise ValueError(
            "--shard_space with --cache_device is not supported: the "
            "device-resident gather produces batch-sharded arrays only"
        )
    mesh = create_mesh(
        jax.devices()[: n_slice * n_dp * n_space * n_model],
        data=n_dp, space=n_space, model=n_model, slices=n_slice,
    )
    repl = replicated_sharding(mesh)
    data_sh = batch_sharding(mesh)
    # spatial placement for image-shaped arrays (H == load_size on axis 1):
    # the 512^2 texture lever — activations split over "space", XLA inserts
    # the conv halo exchanges (validated in benchmarks/space_shard.py).
    # P(da, "space") with no trailing entries fits both (B,H,W) label maps
    # and (B,H,W,C) images.
    from jax.sharding import NamedSharding, PartitionSpec as P

    from swapnet_tpu.parallel import data_axes

    spatial_sh = (
        NamedSharding(mesh, P(data_axes(mesh), "space")) if n_space > 1 else data_sh
    )

    def _is_spatial(v) -> bool:
        return (
            n_space > 1
            and getattr(v, "ndim", 0) >= 3
            and v.shape[1] == opt.load_size
        )

    def put_batch(arrays):
        return {
            k: jax.device_put(v, spatial_sh if _is_spatial(v) else data_sh)
            for k, v in arrays.items()
        }

    rng = jax.random.key(getattr(opt, "seed", 0))

    resident = None
    if getattr(opt, "cache_device", False):
        from swapnet_tpu.data.device_cache import DeviceDataset

        resident = DeviceDataset(
            dataset,
            max_items=len(loader),
            num_workers=opt.num_workers,
            sharding=repl,
        )
        print(f"device-resident dataset: {resident.n} items, "
              f"{resident.nbytes() / 1e6:.1f} MB in HBM")

    # init from the first batch's shapes
    if resident is not None:
        first_idx = next(resident.epoch_batches(opt.batch_size))["indices"]
        first_arrays = resident.gather(jax.device_put(first_idx, data_sh))
    else:
        first = next(iter(loader))
        first_arrays = put_batch(_array_part(first))
    rng, r_pre, r_init = jax.random.split(rng, 3)
    model_batch = preprocess(r_pre, first_arrays)
    state = system.init_state(r_init, model_batch)
    if n_model > 1:
        from swapnet_tpu.parallel import state_sharding

        state = jax.device_put(state, state_sharding(mesh, state))
    else:
        state = jax.device_put(state, repl)

    for net, count in system.param_counts(state).items():
        print(f"[Network {net}] Total number of parameters : {count / 1e6:.3f} M")

    ckpt_backend = getattr(opt, "ckpt_backend", "msgpack")
    resume = getattr(opt, "continue_train", False)
    if not resume and getattr(opt, "auto_resume", False):
        # preemption-elastic restart: resume when a prior run left a
        # checkpoint with this label, start fresh otherwise — the same
        # command line works for launch and for every requeue
        resume = ckpt.checkpoint_exists(ckpt_dir, opt.load_epoch, ckpt_backend)
        if resume:
            print(f"auto-resume: found '{opt.load_epoch}' checkpoint in {ckpt_dir}")
    if resume:
        state = ckpt.load_checkpoint(state, ckpt_dir, opt.load_epoch, ckpt_backend)
        print(f"loaded checkpoint '{opt.load_epoch}' from {ckpt_dir} (step {int(state.step)})")
        if n_model > 1:
            # msgpack restore returns host arrays; re-pin them onto the
            # model-sharded placement so the jitted step doesn't fall back
            # to XLA's default (replicated) layout for restored leaves
            from swapnet_tpu.parallel import state_sharding

            state = jax.device_put(state, state_sharding(mesh, state))

    grad_accum = max(1, getattr(opt, "grad_accum", 1))
    if grad_accum > 1 and opt.batch_size % grad_accum:
        raise ValueError(
            f"--batch_size {opt.batch_size} not divisible by "
            f"--grad_accum {grad_accum}"
        )
    if resident is not None:
        from swapnet_tpu.data.device_cache import build_resident_tick

        step_fn = build_resident_tick(system, preprocess, resident, grad_accum)
    else:
        step_fn = build_tick(system, preprocess, grad_accum)
    saver = AsyncCheckpointer(ckpt_backend)

    profile_dir = getattr(opt, "profile_dir", None)
    profile_steps = getattr(opt, "profile_steps", 0)

    # box the state so the KeyboardInterrupt handler sees the latest value
    box = {"state": state, "rng": rng}
    try:
        _train_epochs(
            opt, loader, system, preprocess, visualizer, ckpt_dir,
            box, step_fn, saver, put_batch, profile_dir, profile_steps,
            resident=resident,
        )
    except KeyboardInterrupt:
        # graceful preemption: persist the latest state before exiting.
        # If the interrupt landed between dispatching a donated step and
        # rebinding box["state"], the buffers may already be consumed —
        # degrade to a warning rather than masking the interrupt.
        print("interrupted — saving latest checkpoint")
        saver.wait()
        try:
            ckpt.save_checkpoint(box["state"], ckpt_dir, "latest", ckpt_backend)
        except RuntimeError as e:
            print(f"could not save interrupt checkpoint ({e}); "
                  "state buffers were in flight")
        raise

    saver.wait()
    return box["state"]


def _train_epochs(
    opt, loader, system, preprocess, visualizer, ckpt_dir,
    box, step_fn, saver, put_batch, profile_dir, profile_steps,
    resident=None,
):
    state, rng = box["state"], box["rng"]
    eval_fn = jax.jit(system.eval_step)  # display path must not run eagerly
    profiling = False
    total_iters = 0
    for epoch in range(opt.start_epoch + 1, opt.n_epochs + 1):
        epoch_iter = 0
        iter_data_time = time.time()
        source = (
            resident.epoch_batches(
                opt.batch_size, opt.shuffle_data,
                getattr(opt, "seed", 0), epoch,
            )
            if resident is not None
            else loader
        )
        for batch in source:
            iter_start_time = time.time()
            t_data = iter_start_time - iter_data_time
            visualizer.reset()
            total_iters += opt.batch_size
            epoch_iter += opt.batch_size

            if (
                profile_dir and not profiling
                and total_iters >= max(profile_steps, 1) * opt.batch_size
            ):
                jax.profiler.start_trace(profile_dir)
                profiling = True
                profile_stop_at = total_iters + 3 * opt.batch_size
            arrays = put_batch(_array_part(batch))
            rng_prev = rng
            state, rng, metrics = step_fn(state, rng, arrays)
            box["state"], box["rng"] = state, rng
            if profiling and total_iters >= profile_stop_at:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                profiling = False
                profile_dir = None  # one trace per run
                print("profiler trace written")

            if opt.print_freq and total_iters % opt.print_freq == 0:
                # fetch (sync point) only at print boundaries
                fetched = {k: float(v) for k, v in metrics.items()}
                t_comp = (time.time() - iter_start_time) / opt.batch_size
                visualizer.print_current_losses(
                    epoch, epoch_iter, fetched, t_comp, t_data
                )

            # freq 0 disables a channel (the reference would divide by zero)
            if opt.display_freq and total_iters % opt.display_freq == 0:
                save_result = (
                    opt.update_html_freq
                    and total_iters % opt.update_html_freq == 0
                )
                # rebuild the exact batch the tick trained on: same key
                _, r_pre = jax.random.split(rng_prev)
                raw = (
                    resident.gather(arrays["indices"])
                    if resident is not None else arrays
                )
                model_batch = preprocess(r_pre, raw)
                fakes = eval_fn(state, model_batch)
                visuals = compute_visuals(opt, jax.device_get(model_batch), np.asarray(fakes))
                visualizer.display_current_results(visuals, epoch, save_result)

            if (
                opt.latest_checkpoint_freq
                and total_iters % opt.latest_checkpoint_freq == 0
            ):
                label = f"iter_{total_iters}" if opt.save_by_iter else "latest"
                print(f"saving the latest model (epoch {epoch}, total_iters {total_iters})")
                saver.save(state, ckpt_dir, label)

            iter_data_time = time.time()

        if opt.checkpoint_freq and epoch % opt.checkpoint_freq == 0:
            print(f"saving the model at the end of epoch {epoch}, iters {total_iters}")
            saver.wait()
            ckpt.save_checkpoint(state, ckpt_dir, "latest", saver.backend)
            ckpt.save_checkpoint(state, ckpt_dir, epoch, saver.backend)

    if profiling:  # run ended before the stop step
        jax.profiler.stop_trace()
        print("profiler trace written")
    saver.wait()
    return state
