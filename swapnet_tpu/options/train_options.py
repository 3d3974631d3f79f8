"""Train options (reference options/train_options.py)."""

from __future__ import annotations

from swapnet_tpu.options.base_options import BaseOptions


class TrainOptions(BaseOptions):
    def __init__(self):
        super().__init__()
        self.is_train = True
        parser = self._parser
        parser.add_argument("--model", help="which model to run",
                            choices=("warp", "texture", "pix2pix"), required=True)
        parser.add_argument("--continue_train", action="store_true",
                            help="continue training from latest checkpoint")
        parser.add_argument("--auto_resume", action="store_true",
                            help="resume from the --load_epoch checkpoint when "
                                 "one exists, start fresh otherwise: the same "
                                 "command line survives preemption/requeue "
                                 "(TPU-native; no reference counterpart)")
        # visualization
        parser.add_argument("--display_freq", type=int, default=400,
                            help="frequency of showing training results on screen")
        parser.add_argument("--display_ncols", type=int, default=4,
                            help="images per row in the snapshot grid")
        parser.add_argument("--display_id", type=int, default=1,
                            help="window id of the web display (kept for CLI parity)")
        parser.add_argument("--display_server", type=str, default="http://localhost",
                            help="(kept for CLI parity; no visdom in this build)")
        parser.add_argument("--display_env", type=str, default="main",
                            help="(kept for CLI parity)")
        parser.add_argument("--display_port", type=int, default=8097,
                            help="port for --serve_dashboard (reference: "
                                 "visdom port)")
        parser.add_argument("--serve_dashboard", action="store_true",
                            help="serve the run dir over HTTP so web/live.html "
                                 "streams current batches + loss curves (the "
                                 "visdom live-dashboard analog)")
        parser.add_argument("--display_refresh_secs", type=int, default=5,
                            help="auto-refresh interval of web/live.html")
        parser.add_argument("--update_html_freq", type=int, default=1000,
                            help="frequency of saving training results to html")
        parser.add_argument("--print_freq", type=int, default=100,
                            help="frequency of showing training results on console")
        parser.add_argument("--no_html", action="store_true",
                            help="do not save intermediate training results to "
                                 "[opt.checkpoints_dir]/[opt.name]/web/")
        # training
        parser.add_argument("--n_epochs", "--num_epochs", default=20, type=int,
                            help="number of epochs to train until")
        parser.add_argument("--start_epoch", type=int, default=0,
                            help="epoch to start training from")
        parser.add_argument("--sample_freq",
                            help="how often to sample and save image results")
        parser.add_argument("--checkpoint_freq", default=2, type=int,
                            help="how often (in epochs) to save checkpoints")
        parser.add_argument("--latest_checkpoint_freq", default=5120, type=int,
                            help="how often (in iterations) to save latest checkpoint")
        parser.add_argument("--save_by_iter", action="store_true",
                            help="whether saves model by iteration")
        parser.add_argument("--ckpt_backend", default="msgpack",
                            choices=("msgpack", "orbax"),
                            help="checkpoint format: msgpack = reference "
                                 "file-per-net layout; orbax = tensorstore "
                                 "directories with per-process sharded IO "
                                 "for multi-host training")
        parser.add_argument("--lr", "--learning_rate", type=float, default=0.01,
                            help="initial learning rate")
        parser.add_argument("--wt_decay", "--weight_decay", dest="weight_decay",
                            default=0, type=float, help="optimizer L2 weight decay")
        parser.add_argument("--init_type", default="kaiming",
                            choices=("normal", "xavier", "kaiming"),
                            help="weights initialization method")
        parser.add_argument("--init_gain", default=0.02, type=float,
                            help="init scaling factor")
        # TPU-native extensions
        parser.add_argument("--lr_policy", default="constant",
                            choices=("constant", "linear", "cosine"),
                            help="LR schedule (both nets): linear/cosine decay "
                                 "to 0 over --lr_decay_steps (default: the "
                                 "run's total steps).  The reference's torch "
                                 "schedulers are commented out upstream; this "
                                 "is the working optax equivalent")
        parser.add_argument("--lr_warmup_steps", type=int, default=0,
                            help="linear 0->lr warmup steps before the policy")
        parser.add_argument("--lr_decay_steps", type=int, default=0,
                            help="schedule horizon in steps (0 = derive from "
                                 "n_epochs x steps-per-epoch)")
        parser.add_argument("--grad_accum", type=int, default=1,
                            help="accumulate gradients over this many "
                                 "micro-batches per optimizer update (batch_"
                                 "size stays the EFFECTIVE batch; activation "
                                 "memory drops to one micro-batch — the "
                                 "512px+ lever alongside --shard_space)")
        parser.add_argument("--quantize_D", action="store_true",
                            help="run discriminator convs on the int8 MXU "
                                 "path (2x bf16 rate) with straight-through "
                                 "gradients; the generator stays full "
                                 "precision (TPU-native, ops/quant.py)")
        parser.add_argument("--profile_dir", default=None,
                            help="write a JAX profiler trace of a few steps here")
        parser.add_argument("--profile_steps", default=2, type=int,
                            help="step index at which to start the profiler trace")
        parser.add_argument("--seed", default=0, type=int,
                            help="PRNG seed for init/augmentation/labels")
