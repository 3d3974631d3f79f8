from swapnet_tpu.options.base_options import BaseOptions, load_options
from swapnet_tpu.options.train_options import TrainOptions
from swapnet_tpu.options.test_options import TestOptions

__all__ = ["BaseOptions", "TrainOptions", "TestOptions", "load_options"]
