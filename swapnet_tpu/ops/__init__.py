from swapnet_tpu.ops.pooling import max_pool_2x2
from swapnet_tpu.ops.quant import conv2d_int8_ste
from swapnet_tpu.ops.roi_align import roi_align, roi_align_reference

__all__ = ["roi_align", "roi_align_reference", "conv2d_int8_ste", "max_pool_2x2"]
