"""Registry: options namespace -> systems / datasets / pipelines / visuals.

The explicit counterpart of the reference's importlib registries
(models/__init__.py:5-44, datasets/__init__.py:9-36): one table, no
dynamic imports, same string names ("warp", "texture", "pix2pix").
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from swapnet_tpu.data.datasets import TextureDataset, WarpDataset
from swapnet_tpu.data.loader import DataLoader
from swapnet_tpu.data.pipelines import (
    TexturePipelineConfig,
    WarpPipelineConfig,
    make_texture_preprocessor,
    make_warp_preprocessor,
)
from swapnet_tpu.losses import GANLossConfig
from swapnet_tpu.training.optimizers import OptimizerConfig, from_options
from swapnet_tpu.training.pix2pix_system import Pix2PixSystem
from swapnet_tpu.training.texture_system import TextureSystem
from swapnet_tpu.training.warp_system import WarpSystem
from swapnet_tpu.utils.visuals import (
    decode_cloth_labels,
    draw_rois_on_texture,
    tensor2im,
)
from swapnet_tpu.data.transforms import scale_tensor


def _dtype(opt):
    return jnp.bfloat16 if getattr(opt, "compute_dtype", "bfloat16") == "bfloat16" else jnp.float32


def _gan_cfg(opt):
    return GANLossConfig(
        gan_mode=getattr(opt, "gan_mode", "vanilla"),
        smooth_labels=getattr(opt, "gan_label_mode", "smooth") == "smooth",
        compat_fake_label_bug=getattr(opt, "compat_fake_label_bug", False),
    )


def _opt_cfgs(opt):
    if getattr(opt, "is_train", True) and hasattr(opt, "optimizer_G"):
        return from_options(opt, "G"), from_options(opt, "D")
    return OptimizerConfig(lr=1e-4), OptimizerConfig(lr=4e-4, weight_decay=0.01)


def create_system(opt, vgg_variables=None):
    """Build the training system named by opt.model from an options
    namespace (reference create_model, models/__init__.py:33-44)."""
    name = opt.model
    is_train = getattr(opt, "is_train", True)
    g_opt, d_opt = _opt_cfgs(opt)
    init_type = getattr(opt, "init_type", "kaiming")
    init_gain = getattr(opt, "init_gain", 0.02)
    common = dict(
        init_type=init_type, init_gain=init_gain, dtype=_dtype(opt),
        gan_cfg=_gan_cfg(opt), g_opt=g_opt, d_opt=d_opt,
    )

    if name == "warp":
        body_channels = opt.body_channels if opt.body_representation == "labels" else 3
        cloth_channels = opt.cloth_channels if opt.cloth_representation == "labels" else 3
        warp_mode = getattr(opt, "warp_mode", "gan") if is_train else "ce"
        return WarpSystem(
            body_channels=body_channels,
            cloth_channels=cloth_channels,
            warp_mode=warp_mode,
            lambda_ce=getattr(opt, "lambda_ce", 100.0),
            discriminator=getattr(opt, "discriminator", "basic"),
            n_layers_D=getattr(opt, "n_layers_D", 3),
            quantize_D=getattr(opt, "quantize_D", False),
            norm=getattr(opt, "norm", "instance"),
            lambda_gan=getattr(opt, "lambda_gan", 1.0),
            lambda_discriminator=getattr(opt, "lambda_discriminator", 1.0),
            lambda_gp=getattr(opt, "lambda_gp", 10.0),
            wgan_clamp=not getattr(opt, "compat_no_wgan_clamp", False),
            head_impl=getattr(opt, "head_impl", "s2d"),
            **common,
        )
    if name == "texture":
        if vgg_variables is None and getattr(opt, "vgg_checkpoint", None):
            from swapnet_tpu.models.vgg import load_torch_vgg16_features

            vgg_variables = load_torch_vgg16_features(opt.vgg_checkpoint)
        image_gram = (
            getattr(opt, "style_gram", "image") == "image"
            or getattr(opt, "compat_image_gram", False)
        )
        return TextureSystem(
            texture_channels=opt.texture_channels,
            cloth_channels=opt.cloth_channels,
            num_roi=opt.body_channels,
            img_size=opt.crop_size,
            netG=getattr(opt, "netG", "swapnet"),
            norm=getattr(opt, "norm", "instance"),
            lambda_l1=getattr(opt, "lambda_l1", 10.0),
            lambda_content=getattr(opt, "lambda_content", 20.0) if is_train else 0.0,
            lambda_style=getattr(opt, "lambda_style", 1e-8) if is_train else 0.0,
            vgg_variables=vgg_variables,
            discriminator=getattr(opt, "discriminator", "basic"),
            n_layers_D=getattr(opt, "n_layers_D", 3),
            quantize_D=getattr(opt, "quantize_D", False),
            lambda_gan=getattr(opt, "lambda_gan", 1.0),
            lambda_discriminator=getattr(opt, "lambda_discriminator", 1.0),
            lambda_gp=getattr(opt, "lambda_gp", 10.0),
            wgan_clamp=not getattr(opt, "compat_no_wgan_clamp", False),
            is_train=is_train,
            compat_image_gram=image_gram,
            vgg_conv_impl=getattr(opt, "vgg_conv_impl", "xla"),
            # feature grams need unpacked taps: --style_gram features
            # auto-disables the packed block 1
            vgg_block1_s2d=(
                not getattr(opt, "no_vgg_block1_s2d", False) and image_gram
            ),
            fuse_l0=not getattr(opt, "no_fuse_l0", False),
            **common,
        )
    if name == "pix2pix":
        return Pix2PixSystem(
            texture_channels=opt.texture_channels,
            cloth_channels=opt.cloth_channels,
            lambda_l1=getattr(opt, "lambda_l1", 100.0),
            norm=getattr(opt, "norm", "instance"),
            discriminator=getattr(opt, "discriminator", "basic"),
            n_layers_D=getattr(opt, "n_layers_D", 3),
            is_train=is_train,
            **common,
        )
    raise ValueError(f"unknown model [{name}]")


def create_dataset(opt, **ds_kwargs):
    """Dataset + capped loader (reference create_dataset/CappedDataLoader)."""
    name = opt.dataset or opt.model
    if name == "warp":
        ds = WarpDataset(opt, **ds_kwargs)
    elif name in ("texture", "pix2pix"):
        ds = TextureDataset(opt, **ds_kwargs)
    else:
        raise ValueError(f"unknown dataset [{name}]")
    loader = DataLoader(
        ds,
        batch_size=opt.batch_size,
        shuffle=opt.shuffle_data,
        num_workers=opt.num_workers,
        max_dataset_size=getattr(opt, "max_dataset_size", None),
        drop_last=getattr(opt, "is_train", True),  # static shapes under jit
    )
    return ds, loader


def create_preprocessor(opt, dataset):
    """Jitted device-side batch preparation for the model named by opt."""
    from swapnet_tpu.data.transforms import parse_crop_bounds

    name = opt.dataset or opt.model
    is_train = getattr(opt, "is_train", True)
    crop_bounds = parse_crop_bounds(getattr(opt, "crop_bounds", None))
    if name == "warp":
        cfg = WarpPipelineConfig(
            cloth_channels=opt.cloth_channels,
            load_size=opt.load_size,
            crop_size=opt.crop_size,
            crop_bounds=crop_bounds,
            body_norm_stats=tuple(map(tuple, dataset.body_norm_stats)),
            input_transforms=tuple(
                [opt.input_transforms]
                if isinstance(opt.input_transforms, str)
                else opt.input_transforms
            ),
            per_channel_transform=getattr(opt, "per_channel_transform", True),
            aug_at_original=getattr(opt, "aug_at_original", False),
            train=is_train,
        )
        return make_warp_preprocessor(cfg)
    cfg = TexturePipelineConfig(
        cloth_channels=opt.cloth_channels,
        load_size=opt.load_size,
        crop_size=opt.crop_size,
        crop_bounds=crop_bounds,
        texture_norm_stats=tuple(map(tuple, dataset.texture_norm_stats)),
        input_transforms=tuple(
            [opt.input_transforms]
            if isinstance(opt.input_transforms, str)
            else opt.input_transforms
        ),
        train=is_train,
    )
    return make_texture_preprocessor(cfg)


def compute_visuals(opt, model_batch, fakes) -> dict:
    """Decode current tensors into uint8 RGB visuals, names matching the
    reference's visual_names (warp_model.py:60-82, texture_model.py:58-91)."""
    name = opt.model
    out = {}
    if name == "warp":
        out["inputs_decoded"] = decode_cloth_labels(model_batch["input_cloths"])
        out["bodys_unnormalized"] = tensor2im(
            model_batch["bodys"], *opt.body_norm_stats
        )
        out["fakes_decoded"] = decode_cloth_labels(np.asarray(fakes))
        if getattr(opt, "is_train", True):
            out["targets_decoded"] = decode_cloth_labels(model_batch["target_cloths"])
        return out
    # texture / pix2pix
    tex = tensor2im(model_batch["input_textures"], *opt.texture_norm_stats)
    out["textures_unnormalized"] = draw_rois_on_texture(
        np.asarray(model_batch["rois"]), tex
    ) if "rois" in model_batch else tex
    out["cloths_decoded"] = decode_cloth_labels(model_batch["cloths"])
    out["fakes"] = tensor2im(np.asarray(fakes))
    out["fakes_scaled"] = (
        np.asarray(scale_tensor(jnp.asarray(np.asarray(fakes, np.float32)), scale_each=True)) * 255
    ).astype(np.uint8)
    if getattr(opt, "is_train", True):
        out["targets_unnormalized"] = tensor2im(
            model_batch["target_textures"], *opt.texture_norm_stats
        )
    return out
