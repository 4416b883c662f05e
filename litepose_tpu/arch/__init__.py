from .schema import ArchConfig, make_divisible, load_arch, validate_arch
from .manager import ArchManager
from .macs import count_litepose_macs

__all__ = [
    "ArchConfig",
    "ArchManager",
    "make_divisible",
    "load_arch",
    "validate_arch",
    "count_litepose_macs",
]
