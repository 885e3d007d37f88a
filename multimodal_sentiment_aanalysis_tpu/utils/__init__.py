from .checkpoint import save_checkpoint, load_checkpoint, strip_module_prefix
from .seeding import seed_all
from .schedule import ReduceLROnPlateau, EarlyStopping

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "strip_module_prefix",
    "seed_all",
    "ReduceLROnPlateau",
    "EarlyStopping",
]
