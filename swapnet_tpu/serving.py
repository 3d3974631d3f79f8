"""Serving: build the fused low-latency swap from trained checkpoints.

Production counterpart of the file-based inference.py pipeline: loads the
two generators from reference-layout checkpoint dirs (msgpack or ported
.pth), reconstructs their architectures from the stored args.json, and
returns a FusedSwap whose single jitted program does
warp -> argmax/one-hot -> texture entirely in HBM (0.9 ms device time per
pair at 128x128 bf16; see BENCH_DETAILS.json).

Host-side helpers handle the same preprocessing the datasets do
(normalization by stats, one-hot label decode), so a caller can go from
raw files to a swapped RGB image.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from swapnet_tpu.models.texture import TextureModule
from swapnet_tpu.models.warp import WarpModule
from swapnet_tpu.swap import FusedSwap
from swapnet_tpu.utils import checkpoint as ckpt


def _load_args(ckpt_dir: str) -> dict:
    with open(os.path.join(ckpt_dir, "args.json")) as f:
        return json.load(f)


def build_fused_swap(
    warp_ckpt_dir: str,
    texture_ckpt_dir: str,
    load_epoch: str = "latest",
    dtype: Any = jnp.bfloat16,
) -> Tuple[FusedSwap, dict]:
    """Returns (FusedSwap, texture args dict) from two checkpoint dirs."""
    wargs = _load_args(warp_ckpt_dir)
    targs = _load_args(texture_ckpt_dir)

    netG = targs.get("netG", "swapnet")
    if netG != "swapnet":
        raise ValueError(
            f"fused swap requires a TextureModule checkpoint (netG='swapnet'); "
            f"this checkpoint was trained with netG='{netG}'"
        )

    body_channels = wargs["body_channels"] if wargs["body_representation"] == "labels" else 3
    cloth_channels = wargs["cloth_channels"] if wargs["cloth_representation"] == "labels" else 3
    warp = WarpModule(
        body_channels=body_channels, cloth_channels=cloth_channels, dtype=dtype
    )
    size = targs["crop_size"]
    tex = TextureModule(
        texture_channels=targs["texture_channels"],
        cloth_channels=targs["cloth_channels"],
        num_roi=targs["body_channels"],
        img_size=size,
        norm_type=targs.get("norm", "instance"),
        dtype=dtype,
    )

    k = jax.random.key(0)
    body = jnp.zeros((1, size, size, body_channels))
    cloth = jnp.zeros((1, size, size, cloth_channels))
    tex_cloth = jnp.zeros((1, size, size, targs["cloth_channels"]))
    texture = jnp.zeros((1, size, size, targs["texture_channels"]))
    rois = jnp.zeros((1, targs["body_channels"], 4))

    wv_t = warp.init({"params": k, "dropout": k}, body, cloth, False)
    tv_t = tex.init({"params": k, "dropout": k}, texture, rois, tex_cloth, False)

    wp, wx = ckpt.load_generator_weights(
        warp_ckpt_dir, load_epoch, wv_t["params"],
        {k_: v for k_, v in wv_t.items() if k_ != "params"},
    )
    tp, tx = ckpt.load_generator_weights(
        texture_ckpt_dir, load_epoch, tv_t["params"],
        {k_: v for k_, v in tv_t.items() if k_ != "params"},
    )
    warp_vars = {"params": wp, **(wx or {})}
    tex_vars = {"params": tp, **(tx or {})}
    return FusedSwap(warp, warp_vars, tex, tex_vars), targs


class SwapService:
    """Raw-inputs wrapper: ONE jitted uint8-in/uint8-out program.

    Normalization, one-hot expansion, the fused warp->texture graph and
    the [-1,1]->uint8 decode (tensor2im math, util/util.py:9-32) all run
    inside a single dispatch — per-swap host work is one upload of the
    uint8 inputs and one download of the uint8 result.  Weights are
    HBM-resident (see FusedSwap.__init__)."""

    def __init__(self, fused: FusedSwap, body_norm_stats, texture_norm_stats,
                 cloth_channels: Optional[int] = None):
        self.fused = fused
        self.body_stats = body_norm_stats
        self.texture_stats = texture_norm_stats
        # derive from the loaded warp module unless explicitly overridden
        self.cloth_channels = cloth_channels or fused.warp.cloth_channels
        self._fn = jax.jit(self._swap_u8)

    def _swap_u8(self, wv, tv, body_u8, cloth_labels, texture_u8, rois):
        from swapnet_tpu.data.codec import labels_to_onehot
        from swapnet_tpu.data.transforms import normalize

        body = normalize(body_u8.astype(jnp.float32) / 255.0, *self.body_stats)
        cloth = labels_to_onehot(cloth_labels, self.cloth_channels)
        texture = normalize(
            texture_u8.astype(jnp.float32) / 255.0, *self.texture_stats
        )
        out = self.fused._swap(wv, tv, body, cloth, texture, rois)
        out = jnp.clip((out.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0)
        return jnp.round(out * 255.0).astype(jnp.uint8)

    def swap(
        self,
        body_u8: np.ndarray,  # (B, H, W, 3) uint8 body segmentation RGB
        cloth_labels: np.ndarray,  # (B, H, W) uint8 label map
        texture_u8: np.ndarray,  # (B, H, W, 3) uint8 source photo
        rois: np.ndarray,  # (B, 12, 4)
    ) -> np.ndarray:
        return np.asarray(
            self.swap_async(body_u8, cloth_labels, texture_u8, rois))

    def swap_async(self, body_u8, cloth_labels, texture_u8, rois):
        """Dispatch one swap and return the on-device result WITHOUT
        materializing it — ``np.asarray(...)`` the return value to fetch.
        Lets a serving loop overlap the next request's host-side decode
        with this request's device execution (benchmarks/swap_p50.py's
        pipelined mode)."""
        # numpy args go straight to the jitted call: one transfer pass,
        # no per-array eager device_put round-trips
        return self._fn(
            self.fused.warp_variables, self.fused.texture_variables,
            body_u8, cloth_labels, texture_u8,
            np.asarray(rois, dtype=np.float32),
        )


# ---------------------------------------------------------------------------
# AOT deployment artifact: the whole u8->u8 swap program compiled to a
# serialized StableHLO module (jax.export) + a weights blob.  A serving
# box replays it with NO model-building Python — no flax modules, no
# architecture code, no tracing; just jax runtime + these two files.
# ---------------------------------------------------------------------------

def export_service(
    service: SwapService, out_dir: str, batch_size: int = 1,
    platforms: Optional[Tuple[str, ...]] = None,
) -> str:
    """Serialize ``service``'s fused u8->u8 program and weights.

    Writes ``swap_program.bin`` (jax.export serialization; weights are
    call ARGUMENTS, so the program itself is small), ``weights.msgpack``
    and ``meta.json`` into ``out_dir``.  ``platforms`` pins the target
    list (e.g. ("tpu", "cpu")); default is the exporting backend only.
    """
    import flax.serialization as fser
    from jax import export as jexport

    size = service.fused.texture.img_size
    num_roi = service.fused.texture.num_roi

    def specs(tree):
        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype), tree
        )

    arg_specs = (
        specs(service.fused.warp_variables),
        specs(service.fused.texture_variables),
        jax.ShapeDtypeStruct((batch_size, size, size, 3), jnp.uint8),
        jax.ShapeDtypeStruct((batch_size, size, size), jnp.uint8),
        jax.ShapeDtypeStruct((batch_size, size, size, 3), jnp.uint8),
        jax.ShapeDtypeStruct((batch_size, num_roi, 4), jnp.float32),
    )
    exported = jexport.export(
        jax.jit(service._swap_u8),
        platforms=list(platforms) if platforms else None,
    )(*arg_specs)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "swap_program.bin"), "wb") as f:
        f.write(exported.serialize())
    weights = {
        "warp": jax.device_get(service.fused.warp_variables),
        "texture": jax.device_get(service.fused.texture_variables),
    }
    with open(os.path.join(out_dir, "weights.msgpack"), "wb") as f:
        f.write(fser.msgpack_serialize(weights))
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(
            {
                "batch_size": batch_size,
                "img_size": size,
                "num_roi": num_roi,
                "cloth_channels": service.cloth_channels,
                "platforms": list(exported.platforms),
            },
            f,
        )
    return out_dir


class ExportedSwapService:
    """Replay an ``export_service`` artifact — same ``swap()`` surface as
    SwapService, zero model code: the architecture lives in the
    serialized StableHLO program."""

    def __init__(self, exported, weights: dict, meta: dict):
        self._exported = exported
        self._warp_vars = weights["warp"]
        self._tex_vars = weights["texture"]
        self.meta = meta
        self._fn = jax.jit(exported.call)

    @classmethod
    def load(cls, out_dir: str) -> "ExportedSwapService":
        import flax.serialization as fser
        from jax import export as jexport

        with open(os.path.join(out_dir, "swap_program.bin"), "rb") as f:
            exported = jexport.deserialize(f.read())
        with open(os.path.join(out_dir, "weights.msgpack"), "rb") as f:
            weights = fser.msgpack_restore(f.read())
        with open(os.path.join(out_dir, "meta.json")) as f:
            meta = json.load(f)
        return cls(exported, weights, meta)

    def swap(self, body_u8, cloth_labels, texture_u8, rois) -> np.ndarray:
        out = self._fn(
            self._warp_vars, self._tex_vars,
            np.asarray(body_u8, np.uint8), np.asarray(cloth_labels, np.uint8),
            np.asarray(texture_u8, np.uint8), np.asarray(rois, np.float32),
        )
        return np.asarray(out)
