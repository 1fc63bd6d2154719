from ssak_tpu.utils.misc import get_cache_dir, hashmd5, save_source_dir, walk_files
from ssak_tpu.utils.monitoring import tic, toc, logger, device_memory_stats

__all__ = [
    "get_cache_dir",
    "hashmd5",
    "save_source_dir",
    "walk_files",
    "tic",
    "toc",
    "logger",
    "device_memory_stats",
]
