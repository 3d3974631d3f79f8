from swapnet_tpu.ops.roi_align import roi_align, roi_align_reference

__all__ = ["roi_align", "roi_align_reference"]
