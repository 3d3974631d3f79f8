"""Serving path: FusedSwap built from checkpoint dirs produced by training."""

import jax
import numpy as np
import pytest

from swapnet_tpu.serving import SwapService, build_fused_swap
from swapnet_tpu.training import TextureSystem, WarpSystem
from swapnet_tpu.utils import checkpoint as ckpt

SIZE = 64


@pytest.fixture(scope="module")
def ckpt_dirs(tmp_path_factory):
    import json
    import jax.numpy as jnp

    root = tmp_path_factory.mktemp("serve_ckpts")
    r = np.random.RandomState(0)
    onehot = np.eye(19, dtype=np.float32)[r.randint(0, 19, (1, SIZE, SIZE))]

    warp_dir = root / "warp"
    warp_dir.mkdir()
    wsys = WarpSystem(warp_mode="ce")
    wstate = wsys.init_state(jax.random.key(0), {
        "bodys": jnp.zeros((1, SIZE, SIZE, 3)),
        "input_cloths": jnp.asarray(onehot),
        "target_cloths": jnp.asarray(onehot),
    })
    ckpt.save_checkpoint(wstate, str(warp_dir), "latest")
    with open(warp_dir / "args.json", "w") as f:
        json.dump({"body_representation": "rgb", "cloth_representation": "labels",
                   "body_channels": 12, "cloth_channels": 19}, f)

    tex_dir = root / "texture"
    tex_dir.mkdir()
    tsys = TextureSystem(img_size=SIZE, lambda_content=0, lambda_style=0, is_train=False)
    rois = np.tile([4.0, 4.0, 40.0, 40.0], (1, 12, 1)).astype(np.float32)
    tstate = tsys.init_state(jax.random.key(1), {
        "input_textures": jnp.zeros((1, SIZE, SIZE, 3)),
        "rois": jnp.asarray(rois),
        "cloths": jnp.asarray(onehot),
        "target_textures": jnp.zeros((1, SIZE, SIZE, 3)),
    })
    ckpt.save_checkpoint(tstate, str(tex_dir), "latest")
    with open(tex_dir / "args.json", "w") as f:
        json.dump({"texture_channels": 3, "cloth_channels": 19,
                   "body_channels": 12, "crop_size": SIZE, "norm": "instance"}, f)
    return str(warp_dir), str(tex_dir)


def test_fused_swap_from_checkpoints(ckpt_dirs):
    import jax.numpy as jnp

    fused, targs = build_fused_swap(*ckpt_dirs, dtype=jnp.float32)
    svc = SwapService(fused, ([0.5] * 3, [0.25] * 3), ([0.5] * 3, [0.25] * 3))

    r = np.random.RandomState(2)
    out = svc.swap(
        r.randint(0, 255, (2, SIZE, SIZE, 3), dtype=np.uint8),
        r.randint(0, 19, (2, SIZE, SIZE)).astype(np.uint8),
        r.randint(0, 255, (2, SIZE, SIZE, 3), dtype=np.uint8),
        np.tile([4.0, 4.0, 40.0, 40.0], (2, 12, 1)).astype(np.float32),
    )
    assert out.shape == (2, SIZE, SIZE, 3)
    assert out.dtype == np.uint8
    assert out.min() >= 0 and out.max() <= 255


def test_exported_swap_artifact_round_trip(ckpt_dirs, tmp_path):
    """export_service -> ExportedSwapService.load replays the SAME program
    (StableHLO, weights as args) with byte-identical outputs."""
    import jax.numpy as jnp

    from swapnet_tpu.serving import ExportedSwapService, export_service

    fused, _ = build_fused_swap(*ckpt_dirs, dtype=jnp.float32)
    svc = SwapService(fused, ([0.5] * 3, [0.25] * 3), ([0.5] * 3, [0.25] * 3))

    out_dir = export_service(svc, str(tmp_path / "artifact"), batch_size=2)
    replay = ExportedSwapService.load(out_dir)
    assert replay.meta["img_size"] == SIZE
    assert replay.meta["batch_size"] == 2

    r = np.random.RandomState(3)
    args = (
        r.randint(0, 255, (2, SIZE, SIZE, 3), dtype=np.uint8),
        r.randint(0, 19, (2, SIZE, SIZE)).astype(np.uint8),
        r.randint(0, 255, (2, SIZE, SIZE, 3), dtype=np.uint8),
        np.tile([4.0, 4.0, 40.0, 40.0], (2, 12, 1)).astype(np.float32),
    )
    np.testing.assert_array_equal(replay.swap(*args), svc.swap(*args))


def test_single_dispatch_swap_matches_composed_path(ckpt_dirs):
    """SwapService's fused u8->u8 program must equal normalize ->
    FusedSwap -> tensor2im composed eagerly (util/util.py:9-32 math)."""
    import jax.numpy as jnp

    from swapnet_tpu.data.codec import labels_to_onehot
    from swapnet_tpu.data.transforms import normalize
    from swapnet_tpu.utils.visuals import tensor2im

    fused, _ = build_fused_swap(*ckpt_dirs, dtype=jnp.float32)
    svc = SwapService(fused, ([0.5] * 3, [0.25] * 3), ([0.5] * 3, [0.25] * 3))

    r = np.random.RandomState(7)
    body = r.randint(0, 255, (1, SIZE, SIZE, 3), dtype=np.uint8)
    labels = r.randint(0, 19, (1, SIZE, SIZE)).astype(np.uint8)
    tex = r.randint(0, 255, (1, SIZE, SIZE, 3), dtype=np.uint8)
    rois = np.tile([4.0, 4.0, 40.0, 40.0], (1, 12, 1)).astype(np.float32)

    got = svc.swap(body, labels, tex, rois)

    body_n = normalize(jnp.asarray(body, jnp.float32) / 255.0, [0.5] * 3, [0.25] * 3)
    cloth = labels_to_onehot(jnp.asarray(labels), 19)
    tex_n = normalize(jnp.asarray(tex, jnp.float32) / 255.0, [0.5] * 3, [0.25] * 3)
    want = tensor2im(np.asarray(fused(body_n, cloth, tex_n, jnp.asarray(rois))))

    assert got.dtype == np.uint8
    # identical math modulo one rounding ULP from fused association
    assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 1
