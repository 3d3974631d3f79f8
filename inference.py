"""Inference entry point — CLI-compatible with the reference inference.py.

Example (reference README commands work verbatim, modulo checkpoint
file format):
    python inference.py --checkpoint checkpoints/deep_fashion \\
        --cloth_dir data/deep_fashion/cloth --body_dir data/deep_fashion/body \\
        --texture_dir data/deep_fashion/texture
"""

from swapnet_tpu.inference import main
from swapnet_tpu.options import TestOptions
from swapnet_tpu.utils.cache import enable_compilation_cache

if __name__ == "__main__":
    enable_compilation_cache()
    config = TestOptions()
    config.parse(store_options=False)
    main(config.opt)
