"""PyTorch -> Flax checkpoint porter.

Maps reference .pth state_dicts onto our param trees so ported
checkpoints reproduce reference outputs (BASELINE.md "pixel-faithful").

Layout conversions:
  * conv weight        OIHW        -> HWIO           transpose(2,3,1,0)
  * conv-transpose     (I,O,kh,kw) -> pre-flipped HWOI: spatial flip then
    transpose(2,3,1,0) (our ConvTranspose stores the equivalent
    dilated-conv kernel with I innermost — the layout XLA wants; see
    swapnet_tpu.models.layers.ConvTranspose)
  * batch norm weight/bias -> scale/bias params;
    running_mean/var -> batch_stats.

Name maps follow the reference module definitions:
  WarpModule            modules/swapnet_modules.py:28-90
  TextureModule         modules/swapnet_modules.py:154-206
  UnetGenerator         modules/pix2pix_modules.py:113-262 (recursive
                        Sequential indices -> our flat down_i/up_i names)
  NLayerDiscriminator   modules/discriminators.py:91-136
  VGG16                 torchvision vgg16 (handled in models/vgg.py)
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(t):
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def conv_kernel(w) -> np.ndarray:
    return np.transpose(_np(w), (2, 3, 1, 0))


def convT_kernel(w) -> np.ndarray:
    w = _np(w)
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 1, 0)).copy()


def load_pth(path: str) -> Dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _np(v) for k, v in sd.items()}


# ---------------------------------------------------------------------------
# WarpModule
# ---------------------------------------------------------------------------


def port_warp_module(sd: Dict) -> Dict:
    """torch WarpModule state_dict -> flax WarpModule params."""
    p = {}
    # body encoder: UNetDown_0..3 ; cloth encoder: UNetDown_4..9
    for i in range(4):
        p[f"UNetDown_{i}"] = {
            "Conv_0": {"kernel": conv_kernel(sd[f"body_down{i + 1}.model.0.weight"])}
        }
    for i in range(6):
        p[f"UNetDown_{i + 4}"] = {
            "Conv_0": {"kernel": conv_kernel(sd[f"cloth_down{i + 1}.model.0.weight"])}
        }
    for i in range(2):
        p[f"UNetUp_{i}"] = {
            "ConvTranspose_0": {
                "kernel": convT_kernel(sd[f"cloth_up{i + 1}.model.0.weight"])
            }
        }
    for i in range(4):
        p[f"ResidualBlock_{i}"] = {
            "Conv_0": {
                "kernel": conv_kernel(sd[f"resblocks.{i}.conv_block.1.weight"]),
                "bias": _np(sd[f"resblocks.{i}.conv_block.1.bias"]),
            },
            "Conv_1": {
                "kernel": conv_kernel(sd[f"resblocks.{i}.conv_block.6.weight"]),
                "bias": _np(sd[f"resblocks.{i}.conv_block.6.bias"]),
            },
        }
    for i in range(3):
        p[f"DualUNetUp_{i}"] = {
            "UNetUp_0": {
                "ConvTranspose_0": {
                    "kernel": convT_kernel(sd[f"dual_up{i + 1}.model.0.weight"])
                }
            }
        }
    p["UpsamplePadConvTanh_0"] = {
        "Conv_0": {
            "kernel": conv_kernel(sd["upsample_and_pad.2.weight"]),
            "bias": _np(sd["upsample_and_pad.2.bias"]),
        }
    }
    return p


# ---------------------------------------------------------------------------
# pix2pix UnetGenerator
# ---------------------------------------------------------------------------


def _unet_prefixes(num_downs: int, prefix: str = "model"):
    """Per-level torch Sequential key prefixes for down/up convs and norms.

    Outermost block (level 0): [downconv(0), submodule(1), uprelu(2),
    upconv(3), tanh(4)]; middle: [downrelu(0), downconv(1), downnorm(2),
    submodule(3), uprelu(4), upconv(5), upnorm(6), (dropout)]; innermost:
    [downrelu(0), downconv(1), uprelu(2), upconv(3), upnorm(4)].
    """
    out = {}
    p = f"{prefix}.model"
    for i in range(num_downs):
        if i == 0:
            out[i] = {"down": f"{p}.0", "up": f"{p}.3", "down_norm": None, "up_norm": None}
            p = f"{p}.1.model"
        elif i == num_downs - 1:
            out[i] = {
                "down": f"{p}.1", "up": f"{p}.3",
                "down_norm": None, "up_norm": f"{p}.4",
            }
        else:
            out[i] = {
                "down": f"{p}.1", "up": f"{p}.5",
                "down_norm": f"{p}.2", "up_norm": f"{p}.6",
            }
            p = f"{p}.3.model"
    return out


def _port_norm(sd: Dict, key: str):
    """BatchNorm params -> (params, batch_stats); instance norm has none."""
    if key is None or f"{key}.weight" not in sd:
        return None, None
    params = {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}
    stats = None
    if f"{key}.running_mean" in sd:
        stats = {
            "mean": _np(sd[f"{key}.running_mean"]),
            "var": _np(sd[f"{key}.running_var"]),
        }
    return params, stats


def port_unet_generator(sd: Dict, num_downs: int, prefix: str = "model"):
    """torch UnetGenerator state_dict -> (flax params, batch_stats)."""
    params, batch_stats = {}, {}
    for i, keys in _unet_prefixes(num_downs, prefix).items():
        down = {"kernel": conv_kernel(sd[f"{keys['down']}.weight"])}
        if f"{keys['down']}.bias" in sd:
            down["bias"] = _np(sd[f"{keys['down']}.bias"])
        params[f"down_{i}"] = down
        up = {"kernel": convT_kernel(sd[f"{keys['up']}.weight"])}
        if f"{keys['up']}.bias" in sd:
            up["bias"] = _np(sd[f"{keys['up']}.bias"])
        params[f"up_{i}"] = up
        for which in ("down_norm", "up_norm"):
            np_, ns_ = _port_norm(sd, keys[which])
            if np_ is not None:
                params[f"{which}_{i}"] = {"BatchNorm_0": np_}
                if ns_ is not None:
                    batch_stats[f"{which}_{i}"] = {"BatchNorm_0": ns_}
    return params, batch_stats


# ---------------------------------------------------------------------------
# TextureModule
# ---------------------------------------------------------------------------


def port_texture_module(sd: Dict, num_downs: int = 7):
    """torch TextureModule state_dict -> (flax params, batch_stats)."""
    unet_params, unet_stats = port_unet_generator(sd, num_downs, prefix="unet.model")
    params = {
        "UNetDown_0": {
            "Conv_0": {"kernel": conv_kernel(sd["encode.model.0.weight"])}
        },
        "UnetGenerator_0": unet_params,
    }
    batch_stats = {"UnetGenerator_0": unet_stats} if unet_stats else {}
    return params, batch_stats


# ---------------------------------------------------------------------------
# Discriminators
# ---------------------------------------------------------------------------


def port_nlayer_discriminator(sd: Dict, n_layers: int = 3, norm: str = "instance"):
    """torch NLayerDiscriminator -> (flax params, batch_stats)."""
    params, batch_stats = {}, {}
    # torch Sequential indices of the convs; every block is
    # [conv, norm, lrelu] for both norm types (instance norm just has no
    # params at its index)
    idxs = [0]
    idx = 2  # after first conv + lrelu
    for n in range(1, n_layers + 1):
        idxs.append(idx)
        idx += 3
    idxs.append(idx)  # final 1-channel conv
    conv_i = 0
    norm_i = 0
    for j, t_idx in enumerate(idxs):
        w = sd[f"model.{t_idx}.weight"]
        entry = {"kernel": conv_kernel(w)}
        if f"model.{t_idx}.bias" in sd:
            entry["bias"] = _np(sd[f"model.{t_idx}.bias"])
        params[f"Conv_{conv_i}"] = entry
        conv_i += 1
        # norm follows convs 1..n_layers when batch norm
        if norm == "batch" and 1 <= j <= n_layers:
            np_, ns_ = _port_norm(sd, f"model.{t_idx + 1}")
            if np_ is not None:
                params[f"Norm_{norm_i}"] = {"BatchNorm_0": np_}
                if ns_ is not None:
                    batch_stats[f"Norm_{norm_i}"] = {"BatchNorm_0": ns_}
            norm_i += 1
    return params, batch_stats


# ---------------------------------------------------------------------------
# entry used by checkpoint.load_generator_weights for .pth files
# ---------------------------------------------------------------------------


def port_generator_pth(path: str, template, extra_template=None):
    """Best-effort port of a reference generator .pth by sniffing its keys.

    Returns (params, extra) where extra carries the ported BatchNorm
    running stats as {"batch_stats": ...} (or the passed template /
    empty dict when the net has none) — dropping them would load
    batch-norm generators with fresh mean=0/var=1 stats and break
    eval parity.
    """
    sd = load_pth(path)
    keys = set(sd.keys())
    stats = {}
    if any(k.startswith("body_down1") for k in keys):
        ported = port_warp_module(sd)
    elif any(k.startswith("encode.") for k in keys):
        num_downs = _sniff_num_downs(keys, "unet.model")
        ported, stats = port_texture_module(sd, num_downs)
    else:
        num_downs = _sniff_num_downs(keys, "model")
        ported, stats = port_unet_generator(sd, num_downs)

    params = _cast_like(ported, template)
    if stats:
        stats_template = (extra_template or {}).get("batch_stats")
        extra = {"batch_stats": _cast_like(stats, stats_template)}
    else:
        extra = extra_template or {}
    return params, extra


def _sniff_num_downs(keys, prefix: str) -> int:
    depth = 1
    p = f"{prefix}.model"
    while any(k.startswith(f"{p}.1.model") or k.startswith(f"{p}.3.model") for k in keys):
        nxt = f"{p}.1.model" if any(k.startswith(f"{p}.1.model") for k in keys) else f"{p}.3.model"
        p = nxt
        depth += 1
    return depth


def _cast_like(tree, template):
    import jax
    import jax.numpy as jnp

    if template is None:
        return jax.tree.map(jnp.asarray, tree)
    return jax.tree.map(lambda x, t: jnp.asarray(x, t.dtype), tree, template)
