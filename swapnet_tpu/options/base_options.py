"""Options system — reference-compatible CLI surface.

Same layered argparse design and flag names as the reference
(options/base_options.py:20-190) so the README's documented commands run
verbatim, minus its importlib/eval registry: plugin modifiers come from
the explicit tables in swapnet_tpu.options.modifiers.

args.json persistence keeps the same "CLI wins over file" merge semantics
(reference :248-291), and inference can rebuild a model from the
args.json stored next to a checkpoint.
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys

from swapnet_tpu.utils.misc import PromptOnce
from swapnet_tpu.options.modifiers import (
    DATASET_MODIFIERS,
    MODEL_MODIFIERS,
    get_optimizer_modifier,
)


def _str2bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ("true", "1", "yes", "y"):
        return True
    if v.lower() in ("false", "0", "no", "n", ""):
        return False
    raise argparse.ArgumentTypeError(f"boolean value expected, got {v!r}")


class BaseOptions:
    def __init__(self):
        parser = argparse.ArgumentParser(
            formatter_class=argparse.ArgumentDefaultsHelpFormatter,
            conflict_handler="resolve",
        )
        # == EXPERIMENT SETUP ==
        parser.add_argument("--config_file",
                            help="load arguments from a json file instead of command line")
        parser.add_argument("--name", default="my_experiment",
                            help="name of the experiment, determines where things are saved")
        parser.add_argument("--comments", default="",
                            help="additional comments to add to this experiment, saved in args.json")
        parser.add_argument("--verbose", action="store_true")
        parser.add_argument("--display_winsize", type=int, default=256,
                            help="display window size for HTML")
        # == MODEL INIT / LOADING / SAVING ==
        parser.add_argument("--model", help="which model to run",
                            choices=("warp", "texture", "pix2pix"))
        parser.add_argument("--checkpoints_dir", default="./checkpoints",
                            help="Where to save models")
        parser.add_argument("--load_epoch", default="latest",
                            help="epoch to load (use with --continue_train or for "
                                 "inference, 'latest' for latest")
        # == DATA / IMAGE LOADING ==
        parser.add_argument("--dataroot", required=True,
                            help="path to data, should contain 'cloth/', 'body/', "
                                 "'texture/', 'rois.csv'")
        parser.add_argument("--dataset",
                            help="dataset class to use, if none then will use model name")
        parser.add_argument("--dataset_mode", default="image", choices=("image", "video"),
                            help="how data is formatted. video mode allows additional "
                                 "source inputs from other frames of the video")
        parser.add_argument("--cloth_representation", default="labels",
                            choices=("rgb", "labels"),
                            help="which representation the cloth segmentations are in")
        parser.add_argument("--body_representation", default="rgb",
                            choices=("rgb", "labels"),
                            help="which representation the body segmentations are in")
        parser.add_argument("--cloth_channels", default=19, type=int,
                            help="only used if --cloth_representation == 'labels'")
        parser.add_argument("--body_channels", default=12, type=int,
                            help="only used if --body_representation == 'labels'. "
                                 "Use 12 for neural body fitting output")
        parser.add_argument("--texture_channels", default=3, type=int,
                            help="RGB textured image number of channels")
        parser.add_argument("--pad", action="store_true",
                            help="add a padding to make image square "
                                 "(accepted for CLI parity; unused here AND "
                                 "in the reference — no code reads it)")
        parser.add_argument("--load_size", default=128, type=int,
                            help="scale images (after padding) to this size")
        parser.add_argument("--crop_size", type=int, default=128,
                            help="then crop to this size")
        parser.add_argument("--crop_bounds",
                            help="DO NOT USE WITH --crop_size. crop images to a "
                                 "region: ((xmin, ymin), (xmax, ymax))")
        # == ITERATION PROPERTIES ==
        parser.add_argument("--max_dataset_size", type=int, default=sys.maxsize,
                            help="cap on data")
        parser.add_argument("--batch_size", type=int, default=8,
                            help="batch size to load data")
        # NOTE the reference uses type=bool here, which parses ANY string
        # (including "False") as True; we parse real booleans.
        parser.add_argument("--shuffle_data", default=True, type=_str2bool,
                            help="whether to shuffle dataset (default is True)")
        parser.add_argument("--num_workers", default=4, type=int,
                            help="number of CPU threads for data loading")
        parser.add_argument("--cache_device", action="store_true",
                            help="decode the whole dataset once and keep it "
                                 "resident in HBM as uint8; each train step "
                                 "then ships only a batch-index vector and "
                                 "gathers/augments on device (TPU-native "
                                 "answer to host-bound input; ~64 KB/item "
                                 "at 128px)")
        parser.add_argument("--cache_data", action="store_true",
                            help="memoize decoded files (uint8, post-resize) "
                                 "in host RAM so epochs after the first skip "
                                 "disk decode entirely (~64 KB/item at 128px; "
                                 "random pairing/augmentation is unaffected "
                                 "since both happen downstream)")
        parser.add_argument("--gpu_id", default=0, type=int,
                            help="device id to use. -1 for cpu (kept for CLI "
                                 "compatibility; device selection is via JAX)")
        parser.add_argument("--no_confirm", action="store_true",
                            help="do not prompt for confirmations")
        # == TPU-NATIVE EXTENSIONS (no reference counterpart) ==
        parser.add_argument("--compute_dtype", default="bfloat16",
                            choices=("bfloat16", "float32"),
                            help="model compute dtype (params stay float32)")
        parser.add_argument("--data_parallel", type=int, default=0,
                            help="number of devices for data parallelism "
                                 "(0 = all available)")
        parser.add_argument("--shard_params", type=int, default=1,
                            help="size of the mesh 'model' axis: shard "
                                 "parameters + optimizer state over this many "
                                 "devices (FSDP/ZeRO-3 analog; 1 = replicate)")
        parser.add_argument("--decode_backend", default="pil",
                            choices=("pil", "native", "draft"),
                            help="image decode path: pil (exact reference "
                                 "numerics), native (C++ libjpeg/libpng + "
                                 "PIL-compatible resample, ±1/255), draft "
                                 "(native + JPEG DCT-scaled decode, fastest)")
        parser.add_argument("--batch_decode", default="auto",
                            choices=("auto", "on", "off"),
                            help="native batch decode (one C++ thread-pool "
                                 "call per batch): auto enables it only on "
                                 "multi-core hosts, on/off force it; only "
                                 "meaningful with --decode_backend native/draft")
        parser.add_argument("--shard_space", type=int, default=1,
                            help="size of the mesh 'space' axis: shard image "
                                 "height over this many devices (conv halo "
                                 "exchanges inserted by XLA; the 512px+ "
                                 "activation-memory lever; not combinable "
                                 "with --shard_params)")
        parser.add_argument("--dcn_slices", type=int, default=1,
                            help="number of DCN-connected TPU slices: adds an "
                                 "outermost mesh 'slice' axis for multi-slice "
                                 "data parallelism; only the per-step gradient "
                                 "all-reduce crosses DCN (1 = single slice)")

        self._parser = parser
        self.is_train = None

    def gather_options(self, args=None):
        parser = self._parser
        opt, _ = parser.parse_known_args(args)
        parser.set_defaults(dataset=opt.model)

        # chain plugin modifiers: model, dataset, then optimizer(s)
        if opt.model:
            parser = MODEL_MODIFIERS[opt.model](parser, self.is_train)
            opt, _ = parser.parse_known_args(args)
        dataset_name = opt.dataset or opt.model
        if dataset_name:
            parser = DATASET_MODIFIERS[dataset_name](parser, self.is_train)
            opt, _ = parser.parse_known_args(args)
        if self.is_train and hasattr(opt, "optimizer_D"):
            parser = get_optimizer_modifier(opt.optimizer_D)(parser, self.is_train)
            opt, _ = parser.parse_known_args(args)
            if opt.optimizer_G != opt.optimizer_D:
                parser = get_optimizer_modifier(opt.optimizer_G)(parser, self.is_train)

        self._parser = parser
        return self._parser.parse_args(args)

    @staticmethod
    def _validate(opt):
        assert opt.crop_size <= opt.load_size, (
            "Crop size must be less than or equal to load size "
        )
        if getattr(opt, "crop_bounds", None):
            # reference precedence silently ignores crop_bounds when a
            # center crop is derived from crop_size < load_size
            # (base_dataset.py:51-58); reject the conflict instead
            assert opt.crop_size >= opt.load_size, (
                "--crop_bounds conflicts with --crop_size < --load_size "
                "(the center crop would win); drop one of them"
            )
            from swapnet_tpu.data.transforms import parse_crop_bounds

            (x_min, y_min), (x_max, y_max) = parse_crop_bounds(opt.crop_bounds)
            assert x_max <= opt.load_size and y_max <= opt.load_size, (
                f"--crop_bounds {opt.crop_bounds} exceeds --load_size "
                f"{opt.load_size}"
            )

    def parse(self, print_options=True, store_options=True, user_overrides=True,
              args=None):
        opt = self.gather_options(args)
        opt.is_train = self.is_train
        self._validate(opt)
        self.opt = opt

        if opt.config_file:
            self.load(opt.config_file, user_overrides)
            opt = self.opt  # load() rebinds self.opt to the merged namespace

        if print_options:
            self.print()

        root = opt.checkpoints_dir if self.is_train else opt.results_dir
        self.save_file = os.path.join(root, opt.name, "args.json")
        if store_options:
            self.save()
        return opt

    def print(self):
        d = vars(self.opt)
        print("=====OPTIONS======")
        for k, v in d.items():
            print(k, ":", v)
        print("==================")

    def save(self):
        d = {k: v for k, v in vars(self.opt).items()}
        # overwrite guard, matching reference base_options.py:255
        PromptOnce.makedirs(
            os.path.dirname(self.save_file),
            prompt=not getattr(self.opt, "no_confirm", False),
        )
        with open(self.save_file, "w") as f:
            f.write(json.dumps(d, indent=4, default=str))

    def load(self, json_file, user_overrides=True):
        self.opt = load_options(self.opt, json_file, user_overrides=user_overrides)


def load_options(opt, json_file, user_overrides=True):
    """Merge args.json into opt; CLI-specified flags win (reference
    base_options.py:263-291)."""
    opt = copy.deepcopy(opt)
    with open(json_file) as f:
        args = json.load(f)

    user_args = set()
    if user_overrides:
        # handle both "--key value" and "--key=value" CLI syntaxes
        user_args = {
            a.lstrip("-").split("=", 1)[0]
            for a in sys.argv[1:]
            if a.startswith("--")
        }

    for k, v in args.items():
        if not user_overrides or k not in user_args:
            setattr(opt, k, v)
    opt.config_file = json_file
    return opt
