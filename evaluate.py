"""Evaluation entry point: stage-appropriate quality metrics.

warp stage:    argmax pixel accuracy + mean IoU (segmentation metrics —
               scoring tanh logits with image metrics would be
               semantically wrong).
texture stage: L1 / PSNR / SSIM + FID over pooled VGG16 features (see
               swapnet_tpu/evaluation.py for the offline-Inception caveat;
               pass --vgg_checkpoint for ported features).

Example:
    python evaluate.py --checkpoint checkpoints --dataroot data/deep_fashion
    python evaluate.py --texture_checkpoint checkpoints/texture/latest_net_generator.msgpack \\
        --dataroot data/deep_fashion

Prints one JSON line per evaluated stage.  No counterpart exists in the
reference (it has no quantitative evaluation); flags mirror inference.py.
"""

import json
import os
import sys

from swapnet_tpu.evaluation import evaluate_system, make_vgg_feature_fn
from swapnet_tpu.inference import _rebuild_from_checkpoint
from swapnet_tpu.options import TestOptions
from swapnet_tpu.utils.cache import enable_compilation_cache


def main(opt):
    if opt.checkpoint:
        if not opt.warp_checkpoint:
            opt.warp_checkpoint = os.path.join(
                opt.checkpoint, "warp", f"{opt.load_epoch}_net_generator.msgpack"
            )
        if not opt.texture_checkpoint:
            opt.texture_checkpoint = os.path.join(
                opt.checkpoint, "texture", f"{opt.load_epoch}_net_generator.msgpack"
            )
    for subdir in ("body", "cloth", "texture"):
        attribute = f"{subdir}_dir"
        if not getattr(opt, attribute) and opt.dataroot:
            setattr(opt, attribute, os.path.join(opt.dataroot, subdir))

    for stage, ckpt_file in (("warp", opt.warp_checkpoint),
                             ("texture", opt.texture_checkpoint)):
        if not ckpt_file or not os.path.exists(ckpt_file):
            continue
        kwargs = (
            {"cloth_dir": opt.cloth_dir, "body_dir": opt.body_dir}
            if stage == "warp"
            else {"texture_dir": opt.texture_dir, "cloth_dir": opt.cloth_dir}
        )
        system, state, loaded_opt, dataset, loader, preprocess = (
            _rebuild_from_checkpoint(opt, ckpt_file, **kwargs)
        )
        extra = {}
        if stage == "warp":
            metrics = evaluate_system(
                system, state, loader, preprocess, kind="segmentation"
            )
        else:
            vgg_vars = None
            if getattr(opt, "vgg_checkpoint", None):
                from swapnet_tpu.models.vgg import load_torch_vgg16_features

                vgg_vars = load_torch_vgg16_features(opt.vgg_checkpoint)
            extra["fid_backbone"] = (
                "vgg16-ported" if vgg_vars is not None else "vgg16-random"
            )
            if vgg_vars is None:
                print(
                    "WARNING: no --vgg_checkpoint given; fid_vgg uses a "
                    "RANDOM-init VGG16 backbone — comparable only between "
                    "runs of this build, not to published FID numbers",
                    file=sys.stderr,
                )
            feature_fn = make_vgg_feature_fn(vgg_vars, loaded_opt.crop_size)
            metrics = evaluate_system(
                system, state, loader, preprocess, kind="image",
                fid_feature_fn=feature_fn,
            )
        print(json.dumps(
            {"stage": stage,
             **{k: round(v, 5) for k, v in metrics.items()}, **extra}
        ))


if __name__ == "__main__":
    enable_compilation_cache()
    config = TestOptions()
    config.parse(store_options=False, print_options=False)
    main(config.opt)
