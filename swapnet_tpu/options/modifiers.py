"""Per-plugin CLI argument modifiers — the explicit registry.

The reference wires plugin flags through dynamic importlib + ``eval``
lookups (reference options/base_options.py:158-190, models/__init__.py:5-24);
here the same extension point is an explicit name -> function table.
Flag names, defaults and choices match the reference so its documented
commands work verbatim (README.md:160-201).
"""

from __future__ import annotations

from argparse import ArgumentParser


# ---- GAN-common (reference models/base_gan.py:16-128) ---------------------


def base_gan_modifier(parser: ArgumentParser, is_train: bool) -> ArgumentParser:
    if is_train:
        parser.add_argument(
            "--gan_mode", default="vanilla",
            choices=(
                "vanilla", "wgan", "wgan-gp", "lsgan",
                "dragan-gp", "dragan-lp", "mescheder-r1-gp", "mescheder-r2-gp",
            ),
            help="gan regularization to use",
        )
        parser.add_argument("--lambda_gan", type=float, default=1.0,
                            help="weight for adversarial loss")
        parser.add_argument("--lambda_discriminator", type=float, default=1.0,
                            help="weight for discriminator loss")
        parser.add_argument("--lambda_gp", type=float, default=10,
                            help="weight parameter for gradient penalty")
        parser.add_argument("--discriminator", default="basic",
                            choices=("basic", "pixel", "n_layers"),
                            help="what discriminator type to use")
        parser.add_argument("--n_layers_D", type=int, default=3,
                            help="only used if discriminator==n_layers")
        parser.add_argument("--norm", type=str, default="instance",
                            help="instance | batch | none normalization")
        parser.add_argument("--optimizer_G", "--opt_G", "--optim_G",
                            default="AdamW",
                            choices=("AdamW", "AdaBound", "Adafactor"),
                            help="optimizer for generator (Adafactor is a "
                                 "TPU-native addition: factored second moment "
                                 "+ bf16 momentum, ~3x less optimizer HBM "
                                 "traffic on the 137M-param warp generator)")
        parser.add_argument("--lr", "--g_lr", "--learning_rate", type=float,
                            default=0.0001, help="initial learning rate for generator")
        parser.add_argument("--beta1", type=float, default=0.5,
                            help="momentum term of adam")
        parser.add_argument("--optimizer_D", "--opt_D", "--optim_D",
                            default="AdamW",
                            choices=("AdamW", "AdaBound", "Adafactor"),
                            help="optimizer for discriminator")
        parser.add_argument("--d_lr", type=float, default=0.0004,
                            help="initial learning rate for Discriminator")
        parser.add_argument("--d_wt_decay", "--d_weight_decay", dest="d_weight_decay",
                            default=0.01, type=float, help="optimizer L2 weight decay")
        parser.add_argument("--gan_label_mode", default="smooth",
                            choices=("hard", "smooth"),
                            help="whether to use hard (real 1.0 fake 0.0) or smooth "
                                 "(real [0.7,1.1] fake [0.,0.3]) labels")
        parser.add_argument("--compat_fake_label_bug", action="store_true",
                            help="reproduce the reference bug where smooth FAKE "
                                 "labels are drawn from the REAL range "
                                 "(reference modules/loss.py:101-102)")
        parser.add_argument("--compat_no_wgan_clamp", action="store_true",
                            help="reproduce the reference bug where the wgan "
                                 "weight clamp is a no-op (non-inplace .clamp, "
                                 "reference models/base_gan.py:210-213)")
        parser.add_argument("--style_gram", choices=["image", "features"],
                            default="image",
                            help="style-loss gram source.  'image' (default) is "
                                 "the reference's shipped behavior: grams of the "
                                 "raw images, five identical copies in the tap "
                                 "loop (reference modules/losses/perceptual.py:"
                                 "61-63).  'features' is the standard Gatys form "
                                 "(grams of the VGG tap features) — better style "
                                 "gradients but NOT reference-parity, and the "
                                 "big-tap grams cost ~MXU time + layout copies")
        parser.add_argument("--compat_image_gram", action="store_true",
                            help="deprecated alias of --style_gram image (now the "
                                 "default)")
    return parser


# ---- models ----------------------------------------------------------------


def warp_modifier(parser: ArgumentParser, is_train: bool) -> ArgumentParser:
    if is_train:
        parser.add_argument("--warp_mode", default="gan", choices=("gan", "ce"))
        parser.add_argument("--lambda_ce", type=float, default=100,
                            help="weight for cross entropy loss in final term")
        parser.set_defaults(display_ncols=4)
    parser.add_argument("--head_impl", default="s2d", choices=("s2d", "xla"),
                        help="warp output-head form; 's2d' (one space-to-"
                             "depth conv, +16%%) is the measured winner "
                             "(benchmarks/warp_head_s2d_ab.json)")
    return base_gan_modifier(parser, is_train)


def texture_modifier(parser: ArgumentParser, is_train: bool) -> ArgumentParser:
    parser = base_gan_modifier(parser, is_train)
    if is_train:
        parser.add_argument("--netG", default="swapnet", choices=["swapnet", "unet_128"])
        parser.add_argument("--lambda_l1", type=float, default=10,
                            help="weight for L1 loss in final term")
        parser.add_argument("--lambda_content", type=float, default=20,
                            help="weight for content loss in final term")
        parser.add_argument("--lambda_style", type=float, default=1e-8,
                            help="weight for style loss in final term")
        parser.add_argument("--vgg_checkpoint", default=None,
                            help="path to a torchvision vgg16 .pth for the "
                                 "perceptual loss (random-init VGG if absent)")
        parser.add_argument("--vgg_conv_impl", default="xla",
                            choices=["xla", "auto", "pallas"],
                            help="VGG conv dispatch; 'xla' is the measured "
                                 "winner (benchmarks/vgg_pallas_ab.json)")
        parser.add_argument("--no_vgg_block1_s2d", action="store_true",
                            help="disable the width-packed VGG block 1 "
                                 "(+4.5% default, benchmarks/vgg_s2d_ab.json)")
        parser.add_argument("--no_fuse_l0", action="store_true",
                            help="disable the split-form first UNet conv "
                                 "(+6.2% default, benchmarks/fuse_l0_ab.json)")
        parser.set_defaults(display_ncols=5)
    return parser


def pix2pix_modifier(parser: ArgumentParser, is_train: bool) -> ArgumentParser:
    parser = base_gan_modifier(parser, is_train)
    if is_train:
        parser.add_argument("--lambda_l1", type=float, default=100,
                            help="weight for L1 loss in final term")
    return parser


MODEL_MODIFIERS = {
    "warp": warp_modifier,
    "texture": texture_modifier,
    "pix2pix": pix2pix_modifier,
}


# ---- datasets (reference warp_dataset.py:26-46, texture_dataset.py:29-41) --


def warp_dataset_modifier(parser: ArgumentParser, is_train: bool) -> ArgumentParser:
    parser.add_argument(
        "--input_transforms", nargs="+", default="none",
        choices=("none", "hflip", "vflip", "affine", "perspective", "all"),
        help="what random transforms to perform on the input "
             "('all' for all transforms)",
    )
    if is_train:
        parser.set_defaults(input_transforms=("hflip", "vflip", "affine", "perspective"))
    parser.add_argument(
        "--per_channel_transform", action="store_true", default=True,
        help="Perform the transform for each label instead of on the image as "
             "a whole. --cloth_representation must be 'labels'.",
    )
    parser.add_argument(
        "--aug_at_original", action="store_true", default=False,
        help="Compat mode: augment cloth channels host-side at the file's "
             "ORIGINAL resolution before the resize, matching the reference "
             "order of operations exactly (warp_dataset.py:110-166).  "
             "Slower (host-bound, like the reference); default augments "
             "on device at load_size (same semantics, not bit-identical).",
    )
    return parser


def texture_dataset_modifier(parser: ArgumentParser, is_train: bool) -> ArgumentParser:
    parser.add_argument(
        "--input_transforms", nargs="+", default="none",
        choices=("none", "hflip", "vflip", "all"),
        help="what random transforms to perform on the input "
             "('all' for all transforms)",
    )
    if is_train:
        parser.set_defaults(input_transforms=("hflip", "vflip"))
    return parser


DATASET_MODIFIERS = {
    "warp": warp_dataset_modifier,
    "texture": texture_dataset_modifier,
    "pix2pix": texture_dataset_modifier,
}


# ---- optimizers (reference optimizers/__init__.py:10-34) -------------------


def adam_modifier(parser: ArgumentParser, *_) -> ArgumentParser:
    parser.add_argument("--b1", type=float, default=0.9, help="Adam b1")
    parser.add_argument("--b2", type=float, default=0.999, help="Adam b2")
    return parser


def adabound_modifier(parser: ArgumentParser, *_) -> ArgumentParser:
    parser = adam_modifier(parser)
    parser.add_argument("--final_lr", type=float, default=0.1, help="AdaBound final_lr")
    return parser


def get_optimizer_modifier(name: str):
    low = name.lower()
    if "adafactor" in low:
        return adam_modifier  # momentum comes from --b1; --b2 unused
    if "adam" in low:
        return adam_modifier
    if "adabound" in low:
        return adabound_modifier
    raise NotImplementedError(name)
