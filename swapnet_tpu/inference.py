"""Two-stage swap inference (reference inference.py).

warp stage:    cloth seg + body seg -> warped cloth seg, stored as
               compressed sparse .npz named "{cloth}_to_{body}.npz"
               (reference :140-149) — the interchange format the texture
               stage re-reads, kept for API parity.
texture stage: warped cloth + source texture ROIs -> final RGB, with an
               HTML gallery per stage.

TPU notes: each stage compiles ONE jitted generator program (static
shapes; batch_size configurable instead of the reference's hard 1).  The
model is rebuilt from the args.json stored next to the checkpoint, with
"CLI wins" override semantics (reference _rebuild_from_checkpoint :50-79).
"""

from __future__ import annotations

import copy
import os
from typing import Callable, Optional

import jax
import numpy as np

from swapnet_tpu.data.codec import compress_and_save_cloth
from swapnet_tpu.data.files import remove_extension
from swapnet_tpu.options.base_options import load_options
from swapnet_tpu.training.registry import (
    compute_visuals,
    create_dataset,
    create_preprocessor,
    create_system,
)
from swapnet_tpu.utils import checkpoint as ckpt
from swapnet_tpu.utils.html import HTML
from swapnet_tpu.utils.visualizer import save_images

WARP_SUBDIR = "warp"
TEXTURE_SUBDIR = "texture"


def get_out_dir(opt, subfolder):
    return os.path.join(opt.results_dir, subfolder)


def _setup(opt, subfolder, create_webpage=True):
    out_dir = get_out_dir(opt, subfolder)
    os.makedirs(out_dir, exist_ok=True)
    webpage = None
    if create_webpage:
        webpage = HTML(
            out_dir,
            f"Experiment = {opt.name}, Phase = {subfolder} inference, "
            f"Loaded Epoch = {opt.load_epoch}",
        )
    return out_dir, webpage


def override_namespace(namespace, **kwargs):
    for k, v in kwargs.items():
        setattr(namespace, k, v)


def _label_from_checkpoint(path: str) -> str:
    base = os.path.basename(path)
    return base.split("_net_")[0] if "_net_" in base else "latest"


def _rebuild_from_checkpoint(opt, checkpoint_file, same_crop_load_size=False, **ds_kwargs):
    """Load args.json next to the checkpoint, force inference attributes,
    build system + dataset + generator weights."""
    checkpoint_dir = os.path.dirname(checkpoint_file)
    loaded_opt = load_options(
        copy.deepcopy(opt), os.path.join(checkpoint_dir, "args.json")
    )
    override_namespace(
        loaded_opt,
        is_train=False,
        batch_size=getattr(opt, "batch_size", 1) or 1,
        shuffle_data=opt.shuffle_data,
        results_dir=opt.results_dir,
        max_dataset_size=opt.max_dataset_size,
    )
    if same_crop_load_size:
        loaded_opt.load_size = loaded_opt.crop_size

    system = create_system(loaded_opt)
    dataset, loader = create_dataset(loaded_opt, **ds_kwargs)
    preprocess = create_preprocessor(loaded_opt, dataset)

    # init a params template from the first batch, then restore weights
    from swapnet_tpu.data.loader import array_part

    first = next(iter(loader))
    model_batch = preprocess(None, array_part(first))
    state = system.init_state(jax.random.key(0), model_batch)
    label = _label_from_checkpoint(checkpoint_file)
    g_params, g_extra = ckpt.load_generator_weights(
        checkpoint_dir, label, state.g_params, state.g_extra
    )
    state = state.replace(g_params=g_params, g_extra=g_extra or {})
    # pin restored weights in HBM once: load_generator_weights returns host
    # numpy, and a jitted eval re-uploads numpy args on EVERY batch
    # (same bug class as FusedSwap round 2; ~0.5 GB/batch over the tunnel)
    state = jax.device_put(state)
    return system, state, loaded_opt, dataset, loader, preprocess


def _run_test_loop(
    opt, system, state, loader, preprocess, webpage=None,
    iteration_post_hook: Optional[Callable] = None,
):
    # state must be a traced ARGUMENT: closing over it would embed all
    # generator params as XLA constants (catastrophic compile times)
    forward = jax.jit(system.eval_step)
    total = loader.num_batches()
    done = 0
    from swapnet_tpu.data.loader import array_part

    for i, batch in enumerate(loader):
        if i >= total:
            break
        model_batch = preprocess(None, array_part(batch))
        fakes = np.asarray(forward(state, model_batch))

        if "cloth_paths" in batch and "body_paths" in batch:
            image_paths = list(zip(batch["cloth_paths"], batch["body_paths"]))
        else:
            image_paths = list(zip(batch["cloth_paths"], batch["texture_paths"]))

        if webpage is not None:
            visuals = compute_visuals(opt, jax.device_get(model_batch), fakes)
            for b in range(fakes.shape[0]):
                row = {k: v[b] for k, v in visuals.items()}
                save_images(
                    webpage, row, image_paths[b][0],
                    width=getattr(opt, "display_winsize", 256),
                )
        if iteration_post_hook:
            iteration_post_hook(fakes=fakes, image_paths=image_paths)
        done += fakes.shape[0]

    if webpage is not None:
        webpage.save()
    return done


def run_warp(opt):
    warp_out, webpage = _setup(opt, WARP_SUBDIR, create_webpage=not opt.skip_intermediates)

    print(f"Rebuilding warp from {opt.warp_checkpoint}")
    system, state, loaded_opt, dataset, loader, preprocess = _rebuild_from_checkpoint(
        opt, opt.warp_checkpoint, cloth_dir=opt.cloth_dir, body_dir=opt.body_dir
    )
    loaded_opt.model = "warp"

    def save_cloths_npz(fakes, image_paths):
        for b in range(fakes.shape[0]):
            name = "_to_".join(
                remove_extension(os.path.basename(p)) for p in image_paths[b]
            )
            compress_and_save_cloth(fakes[b], os.path.join(warp_out, name))

    print(f"Warping cloth to match body segmentations in {opt.body_dir}...")
    try:
        _run_test_loop(
            loaded_opt, system, state, loader, preprocess, webpage,
            iteration_post_hook=save_cloths_npz,
        )
    except KeyboardInterrupt:
        print("Ending warp early.")
    print(f"Warp results stored in {warp_out}")


def run_texture(opt):
    texture_out, webpage = _setup(opt, TEXTURE_SUBDIR, create_webpage=True)

    cloth_dir = get_out_dir(opt, WARP_SUBDIR) if opt.warp_checkpoint else opt.cloth_dir

    print(f"Rebuilding texture from {opt.texture_checkpoint}")
    system, state, loaded_opt, dataset, loader, preprocess = _rebuild_from_checkpoint(
        opt,
        opt.texture_checkpoint,
        same_crop_load_size=bool(opt.warp_checkpoint),
        texture_dir=opt.texture_dir,
        cloth_dir=cloth_dir,
    )
    loaded_opt.model = "texture"

    print(f"Texturing cloth segmentations in {cloth_dir}...")
    try:
        _run_test_loop(loaded_opt, system, state, loader, preprocess, webpage)
    except KeyboardInterrupt:
        print("Ending texture early.")
    print(f"Textured results stored in {texture_out}")


def main(opt):
    if opt.checkpoint:
        if not opt.warp_checkpoint:
            opt.warp_checkpoint = os.path.join(
                opt.checkpoint, "warp", f"{opt.load_epoch}_net_generator.msgpack"
            )
            print("Set warp_checkpoint to", opt.warp_checkpoint)
        if not opt.texture_checkpoint:
            opt.texture_checkpoint = os.path.join(
                opt.checkpoint, "texture", f"{opt.load_epoch}_net_generator.msgpack"
            )
            print("Set texture_checkpoint to", opt.texture_checkpoint)

    for subdir in ("body", "cloth", "texture"):
        attribute = f"{subdir}_dir"
        if not getattr(opt, attribute) and opt.dataroot:
            setattr(opt, attribute, os.path.join(opt.dataroot, subdir))

    if opt.warp_checkpoint:
        print("Running warp inference...")
        run_warp(opt)

    if opt.texture_checkpoint:
        print("Running texture inference...")
        run_texture(opt)

    print("\nDone!")
