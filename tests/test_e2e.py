"""End-to-end: synthetic dataroot -> CLI-parsed training (warp + texture)
-> checkpoints -> two-stage swap inference producing npz intermediates and
HTML galleries (the reference's full product path, SURVEY.md §3.1/§3.3)."""

import json
import os

import jax
import numpy as np
import pytest
from PIL import Image
from scipy import sparse

from swapnet_tpu.options import TestOptions, TrainOptions
from swapnet_tpu.training.loop import train
from swapnet_tpu.inference import main as inference_main

SIZE = 64  # warp needs >= 64 (cloth encoder downsamples 6x)
N_ITEMS = 4


@pytest.fixture(scope="module")
def dataroot(tmp_path_factory):
    root = tmp_path_factory.mktemp("deep_fashion")
    r = np.random.RandomState(0)
    for sub in ("cloth", "body", "texture"):
        os.makedirs(root / sub)

    rois_rows = []
    for i in range(N_ITEMS):
        fid = f"img{i:02d}"
        labels = r.randint(0, 19, (SIZE, SIZE)).astype(np.uint8)
        sparse.save_npz(str(root / "cloth" / f"{fid}.npz"), sparse.csc_matrix(labels))
        Image.fromarray(
            r.randint(0, 255, (SIZE, SIZE, 3), dtype=np.uint8)
        ).save(root / "body" / f"{fid}.png")
        Image.fromarray(
            r.randint(0, 255, (SIZE, SIZE, 3), dtype=np.uint8)
        ).save(root / "texture" / f"{fid}.jpg")
        for _ in range(12):
            x1, y1 = r.randint(0, SIZE // 2, 2)
            rois_rows.append(
                f"{fid},{x1},{y1},{x1 + r.randint(4, SIZE // 2)},{y1 + r.randint(4, SIZE // 2)}"
            )

    with open(root / "rois.csv", "w") as f:
        f.write("id,xmin,ymin,xmax,ymax\n" + "\n".join(rois_rows) + "\n")
    with open(root / "normalization_stats.json", "w") as f:
        f.write(json.dumps({"path": "body", "means": [0.5] * 3, "stds": [0.25] * 3}) + "\n")
        f.write(json.dumps({"path": "texture", "means": [0.5] * 3, "stds": [0.25] * 3}) + "\n")
    return root


@pytest.fixture(scope="module")
def checkpoints(dataroot, tmp_path_factory):
    ckpts = tmp_path_factory.mktemp("checkpoints")
    common = [
        "--dataroot", str(dataroot),
        "--checkpoints_dir", str(ckpts),
        "--load_size", str(SIZE), "--crop_size", str(SIZE),
        "--batch_size", "2", "--n_epochs", "1", "--checkpoint_freq", "1",
        "--latest_checkpoint_freq", "2",
        "--print_freq", "2", "--display_freq", "2", "--update_html_freq", "2",
        "--num_workers", "2", "--compute_dtype", "float32",
    ]
    warp_opt = TrainOptions().parse(
        print_options=False,
        args=["--model", "warp", "--name", "warp", "--warp_mode", "ce"] + common,
    )
    train(warp_opt)
    texture_opt = TrainOptions().parse(
        print_options=False,
        args=["--model", "texture", "--name", "texture",
              "--lambda_content", "0", "--lambda_style", "0"] + common,
    )
    train(texture_opt)
    return ckpts


@pytest.mark.smoke
def test_training_writes_reference_layout(checkpoints):
    warp_dir = checkpoints / "warp"
    assert (warp_dir / "args.json").exists()
    assert (warp_dir / "latest_net_generator.msgpack").exists()
    assert (warp_dir / "1_net_generator.msgpack").exists()
    assert (warp_dir / "latest_optim_G.msgpack").exists()
    # ce mode has no discriminator (reference warp_model.py:68-76)
    assert not (warp_dir / "latest_net_discriminator.msgpack").exists()
    assert (warp_dir / "loss_log.txt").exists()
    assert (warp_dir / "web" / "index.html").exists()

    tex_dir = checkpoints / "texture"
    assert (tex_dir / "latest_net_generator.msgpack").exists()
    assert (tex_dir / "latest_net_discriminator.msgpack").exists()
    assert (tex_dir / "latest_optim_D.msgpack").exists()


@pytest.mark.smoke
def test_two_stage_inference(checkpoints, dataroot, tmp_path_factory):
    results = tmp_path_factory.mktemp("results")
    config = TestOptions()
    opt = config.parse(
        print_options=False, store_options=False,
        args=[
            "--checkpoint", str(checkpoints),
            "--dataroot", str(dataroot),
            "--results_dir", str(results),
            "--batch_size", "2",
        ],
    )
    inference_main(opt)

    warp_out = results / "warp"
    npzs = sorted(p for p in os.listdir(warp_out) if p.endswith(".npz"))
    assert len(npzs) == N_ITEMS
    assert npzs[0] == "img00_to_img00.npz"
    m = sparse.load_npz(warp_out / npzs[0])
    assert m.shape == (SIZE, SIZE)
    assert (warp_out / "index.html").exists()

    tex_out = results / "texture"
    assert (tex_out / "index.html").exists()
    images = os.listdir(tex_out / "images")
    assert any("fakes" in i for i in images)
    # one gallery row per warped npz
    assert len([i for i in images if i.endswith("_fakes.png")]) == N_ITEMS


def test_texture_only_inference(checkpoints, dataroot, tmp_path_factory):
    """Single-stage path: --texture_checkpoint without the warp stage
    consumes the user-specified cloth dir directly (reference
    inference.py:169-180)."""
    results = tmp_path_factory.mktemp("results_tex_only")
    opt = TestOptions().parse(
        print_options=False, store_options=False,
        args=[
            "--texture_checkpoint",
            str(checkpoints / "texture" / "latest_net_generator.msgpack"),
            "--dataroot", str(dataroot),
            "--results_dir", str(results),
            "--batch_size", "2",
        ],
    )
    inference_main(opt)
    assert not (results / "warp").exists()
    assert (results / "texture" / "index.html").exists()
    images = os.listdir(results / "texture" / "images")
    assert len([i for i in images if i.endswith("_fakes.png")]) == N_ITEMS


def test_cross_source_inference(checkpoints, dataroot, tmp_path_factory):
    """The README's dir-separated swap command: clothes/textures from a
    SOURCE tree onto bodies from a TARGET tree (reference README.md:195-200,
    inference.py --cloth_dir/--texture_dir/--body_dir).  Pairing is by
    sorted index across the dirs; npz names must cross source cloth ids
    with target body ids."""
    import shutil

    source = tmp_path_factory.mktemp("source")
    target = tmp_path_factory.mktemp("target")
    for sub in ("cloth", "texture"):
        os.makedirs(source / sub)
    os.makedirs(target / "body")
    # source: items 0-1 (cloth seg + texture); target: items 2-3 (bodies)
    for i in (0, 1):
        fid = f"img{i:02d}"
        shutil.copy(dataroot / "cloth" / f"{fid}.npz", source / "cloth")
        shutil.copy(dataroot / "texture" / f"{fid}.jpg", source / "texture")
    for i in (2, 3):
        fid = f"img{i:02d}"
        shutil.copy(dataroot / "body" / f"{fid}.png", target / "body")
    shutil.copy(dataroot / "rois.csv", source)
    shutil.copy(dataroot / "normalization_stats.json", source)
    shutil.copy(dataroot / "normalization_stats.json", target)

    results = tmp_path_factory.mktemp("results_cross")
    opt = TestOptions().parse(
        print_options=False, store_options=False,
        args=[
            "--checkpoint", str(checkpoints),
            "--dataroot", str(source),
            "--cloth_dir", str(source / "cloth"),
            "--texture_dir", str(source / "texture"),
            "--body_dir", str(target / "body"),
            "--results_dir", str(results),
            "--batch_size", "2",
        ],
    )
    inference_main(opt)

    npzs = sorted(p for p in os.listdir(results / "warp") if p.endswith(".npz"))
    assert npzs == ["img00_to_img02.npz", "img01_to_img03.npz"], npzs
    images = os.listdir(results / "texture" / "images")
    assert len([i for i in images if i.endswith("_fakes.png")]) == 2, images


def test_continue_train(checkpoints, dataroot):
    opt = TrainOptions().parse(
        print_options=False, store_options=False,
        args=[
            "--model", "warp", "--name", "warp", "--warp_mode", "ce",
            "--dataroot", str(dataroot),
            "--checkpoints_dir", str(checkpoints),
            "--load_size", str(SIZE), "--crop_size", str(SIZE),
            "--batch_size", "2", "--n_epochs", "1", "--checkpoint_freq", "0",
            "--latest_checkpoint_freq", "0", "--print_freq", "1000",
            "--display_freq", "1000", "--compute_dtype", "float32",
            "--continue_train", "--load_epoch", "latest",
        ],
    )
    state = train(opt)
    # resumed from step 2 (2 batches of the first run) + 2 more batches
    assert int(state.step) == 4


def test_auto_resume(dataroot, tmp_path_factory):
    """--auto_resume: the SAME command line starts fresh on first launch
    and resumes from the checkpoint after a preemption/requeue."""
    ckpts = tmp_path_factory.mktemp("auto_resume_ckpts")
    args = [
        "--model", "warp", "--name", "warp_ar", "--warp_mode", "ce",
        "--dataroot", str(dataroot),
        "--checkpoints_dir", str(ckpts),
        "--load_size", str(SIZE), "--crop_size", str(SIZE),
        "--batch_size", "2", "--n_epochs", "1", "--checkpoint_freq", "0",
        "--latest_checkpoint_freq", "2", "--print_freq", "1000",
        "--display_freq", "1000", "--compute_dtype", "float32",
        "--auto_resume", "--load_epoch", "latest",
    ]
    # launch: no checkpoint exists -> fresh start
    state = train(TrainOptions().parse(print_options=False, args=args))
    assert int(state.step) == N_ITEMS // 2
    # requeue with the identical command line -> resumes
    state = train(
        TrainOptions().parse(print_options=False, store_options=False, args=args)
    )
    assert int(state.step) == N_ITEMS  # 2 resumed + 2 more


def test_orbax_backend_training_e2e(dataroot, tmp_path_factory):
    """--ckpt_backend orbax: the loop writes tensorstore checkpoint dirs
    (async saver + end-of-epoch saves) and --continue_train resumes from
    them."""
    ckpts = tmp_path_factory.mktemp("orbax_ckpts")
    common = [
        "--model", "warp", "--name", "warp", "--warp_mode", "ce",
        "--dataroot", str(dataroot),
        "--checkpoints_dir", str(ckpts),
        "--load_size", str(SIZE), "--crop_size", str(SIZE),
        "--batch_size", "2", "--n_epochs", "1", "--checkpoint_freq", "1",
        "--latest_checkpoint_freq", "2", "--print_freq", "1000",
        "--display_freq", "1000", "--compute_dtype", "float32",
        "--ckpt_backend", "orbax",
    ]
    opt = TrainOptions().parse(print_options=False, args=common)
    train(opt)
    warp_dir = ckpts / "warp"
    assert (warp_dir / "orbax" / "latest").is_dir()
    assert (warp_dir / "orbax" / "1").is_dir()
    assert not (warp_dir / "latest_net_generator.msgpack").exists()

    opt = TrainOptions().parse(
        print_options=False, store_options=False,
        args=common + ["--continue_train", "--load_epoch", "latest"],
    )
    state = train(opt)
    assert int(state.step) == 4  # resumed from 2 + 2 more batches


def test_video_mode_training(dataroot, tmp_path_factory):
    """--dataset_mode video trains end-to-end: the input cloth is a random
    other frame (temporal augmentation, reference warp_dataset.py:97-107)."""
    ckpts = tmp_path_factory.mktemp("video_ckpts")
    opt = TrainOptions().parse(
        print_options=False,
        args=[
            "--model", "warp", "--name", "warp_video", "--warp_mode", "ce",
            "--dataset_mode", "video",
            "--dataroot", str(dataroot),
            "--checkpoints_dir", str(ckpts),
            "--load_size", str(SIZE), "--crop_size", str(SIZE),
            "--batch_size", "2", "--n_epochs", "1", "--checkpoint_freq", "1",
            "--latest_checkpoint_freq", "0", "--print_freq", "2",
            "--display_freq", "0", "--num_workers", "2",
            "--compute_dtype", "float32",
        ],
    )
    state = train(opt)
    assert int(state.step) == N_ITEMS // 2
    assert (ckpts / "warp_video" / "latest_net_generator.msgpack").exists()


def test_cache_device_training_e2e(dataroot, tmp_path_factory):
    """--cache_device trains through the resident-tick path end-to-end."""
    ckpts = tmp_path_factory.mktemp("resident_ckpts")
    opt = TrainOptions().parse(
        print_options=False,
        args=[
            "--model", "warp", "--name", "warp_res", "--warp_mode", "ce",
            "--cache_device",
            "--dataroot", str(dataroot),
            "--checkpoints_dir", str(ckpts),
            "--load_size", str(SIZE), "--crop_size", str(SIZE),
            "--batch_size", "2", "--n_epochs", "2", "--checkpoint_freq", "2",
            "--latest_checkpoint_freq", "0", "--print_freq", "2",
            "--display_freq", "2", "--num_workers", "2",
            "--compute_dtype", "float32",
        ],
    )
    state = train(opt)
    assert int(state.step) == N_ITEMS  # 2 epochs x 2 steps
    assert (ckpts / "warp_res" / "latest_net_generator.msgpack").exists()


def test_cache_device_with_grad_accum_e2e(dataroot, tmp_path_factory):
    """--cache_device composed with --grad_accum (the lifted VERDICT r2
    incompatibility): the resident tick reshapes the gathered batch into
    micro-batches and runs the accumulated step."""
    ckpts = tmp_path_factory.mktemp("resident_accum_ckpts")
    opt = TrainOptions().parse(
        print_options=False,
        args=[
            "--model", "warp", "--name", "warp_res_acc", "--warp_mode", "ce",
            "--cache_device", "--grad_accum", "2",
            "--dataroot", str(dataroot),
            "--checkpoints_dir", str(ckpts),
            "--load_size", str(SIZE), "--crop_size", str(SIZE),
            "--batch_size", "2", "--n_epochs", "1", "--checkpoint_freq", "1",
            "--latest_checkpoint_freq", "0", "--print_freq", "2",
            "--display_freq", "2", "--num_workers", "2",
            "--compute_dtype", "float32",
        ],
    )
    state = train(opt)
    assert int(state.step) == 2  # 1 epoch x 2 steps (batch 2 = 2 micro x 1)
    assert (ckpts / "warp_res_acc" / "latest_net_generator.msgpack").exists()


def test_dcn_slices_training_e2e(dataroot, tmp_path_factory):
    """--dcn_slices 2 trains through the multi-slice mesh end-to-end on
    the 8-device CPU mesh (batch sharded over ("slice","data"), params
    replicated; the grad all-reduce over "slice" is the DCN hop on real
    hardware)."""
    ckpts = tmp_path_factory.mktemp("slice_ckpts")
    opt = TrainOptions().parse(
        print_options=False,
        args=[
            "--model", "warp", "--name", "warp_slice", "--warp_mode", "ce",
            "--dcn_slices", "2", "--data_parallel", "1",
            "--dataroot", str(dataroot),
            "--checkpoints_dir", str(ckpts),
            "--load_size", str(SIZE), "--crop_size", str(SIZE),
            "--batch_size", "2", "--n_epochs", "1", "--checkpoint_freq", "1",
            "--latest_checkpoint_freq", "0", "--print_freq", "2",
            "--display_freq", "0", "--num_workers", "2",
            "--compute_dtype", "float32",
        ],
    )
    state = train(opt)
    assert int(state.step) == N_ITEMS // 2
    assert (ckpts / "warp_slice" / "latest_net_generator.msgpack").exists()


def test_shard_space_training_e2e(dataroot, tmp_path_factory):
    """--shard_space 2 trains with image height sharded over the "space"
    axis end-to-end (XLA conv halo exchanges; batch over "data")."""
    ckpts = tmp_path_factory.mktemp("space_ckpts")
    opt = TrainOptions().parse(
        print_options=False,
        args=[
            "--model", "texture", "--name", "tex_space",
            "--lambda_content", "0", "--lambda_style", "0",
            "--shard_space", "2", "--data_parallel", "2",
            "--dataroot", str(dataroot),
            "--checkpoints_dir", str(ckpts),
            "--load_size", str(SIZE), "--crop_size", str(SIZE),
            "--batch_size", "2", "--n_epochs", "1", "--checkpoint_freq", "1",
            "--latest_checkpoint_freq", "0", "--print_freq", "2",
            "--display_freq", "0", "--num_workers", "2",
            "--compute_dtype", "float32",
        ],
    )
    state = train(opt)
    assert int(state.step) == N_ITEMS // 2
    assert (ckpts / "tex_space" / "latest_net_generator.msgpack").exists()


def test_shard_params_training_e2e(dataroot, tmp_path_factory):
    """--shard_params 2 trains through the FSDP placement end-to-end on the
    8-device CPU mesh (params + optimizer moments split over "model",
    batch over "data")."""
    ckpts = tmp_path_factory.mktemp("fsdp_ckpts")
    opt = TrainOptions().parse(
        print_options=False,
        args=[
            "--model", "warp", "--name", "warp_fsdp", "--warp_mode", "ce",
            "--shard_params", "2", "--data_parallel", "2",
            "--dataroot", str(dataroot),
            "--checkpoints_dir", str(ckpts),
            "--load_size", str(SIZE), "--crop_size", str(SIZE),
            "--batch_size", "2", "--n_epochs", "1", "--checkpoint_freq", "1",
            "--latest_checkpoint_freq", "0", "--print_freq", "2",
            "--display_freq", "0", "--num_workers", "2",
            "--compute_dtype", "float32",
        ],
    )
    state = train(opt)
    assert int(state.step) == N_ITEMS // 2
    # a sharded leaf really is split over the "model" axis
    k = next(x for x in jax.tree.leaves(state.g_params) if getattr(x, "ndim", 0) == 4)
    assert len(k.sharding.device_set) >= 2
    assert (ckpts / "warp_fsdp" / "latest_net_generator.msgpack").exists()


def test_aug_at_original_training(dataroot, tmp_path_factory):
    """--aug_at_original trains end-to-end: the host augments cloth
    channels at the file's original resolution before the resize
    (reference warp_dataset.py:110-166 order of operations) and the
    pipeline consumes the multi-hot input_onehot_u8 without the
    device-side warp (data/host_aug.py)."""
    ckpts = tmp_path_factory.mktemp("aug_orig_ckpts")
    opt = TrainOptions().parse(
        print_options=False,
        args=[
            "--model", "warp", "--name", "warp_aug_orig", "--warp_mode", "ce",
            "--aug_at_original",
            "--dataroot", str(dataroot),
            "--checkpoints_dir", str(ckpts),
            "--load_size", str(SIZE), "--crop_size", str(SIZE),
            "--batch_size", "2", "--n_epochs", "1", "--checkpoint_freq", "1",
            "--latest_checkpoint_freq", "0", "--print_freq", "2",
            "--display_freq", "0", "--num_workers", "2",
            "--compute_dtype", "float32",
        ],
    )
    state = train(opt)
    assert int(state.step) == N_ITEMS // 2
    assert (ckpts / "warp_aug_orig" / "latest_net_generator.msgpack").exists()
