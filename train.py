"""Training entry point — CLI-compatible with the reference train.py.

Example:
    Train the warp model:
        python train.py --name warp_stage --model warp --dataroot data/deep_fashion
    Train the texture model:
        python train.py --name texture_stage --model texture --dataroot data/deep_fashion
"""

from swapnet_tpu.options import TrainOptions
from swapnet_tpu.training.loop import train
from swapnet_tpu.utils.cache import enable_compilation_cache

if __name__ == "__main__":
    enable_compilation_cache()
    opt = TrainOptions().parse(store_options=True)
    train(opt)
