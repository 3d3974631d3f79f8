from swapnet_tpu.data.codec import (
    compress_and_save_cloth,
    decompress_cloth_labels,
    labels_to_onehot,
)
from swapnet_tpu.data.stats import get_norm_stats
from swapnet_tpu.data.files import (
    IMG_EXTENSIONS,
    find_valid_files,
    get_corresponding_file,
    get_dir_file_extension,
    remove_extension,
    remove_top_dir,
)

__all__ = [
    "compress_and_save_cloth",
    "decompress_cloth_labels",
    "labels_to_onehot",
    "get_norm_stats",
    "IMG_EXTENSIONS",
    "find_valid_files",
    "get_corresponding_file",
    "get_dir_file_extension",
    "remove_extension",
    "remove_top_dir",
]
