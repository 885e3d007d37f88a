from .checkpoint import save_checkpoint, load_checkpoint, strip_module_prefix
from .seeding import seed_all
from .checks import checkified
from .schedule import ReduceLROnPlateau, EarlyStopping
from .profiling import (
    timed,
    StepTimer,
    trace,
    dump_jaxpr,
    dump_hlo,
    enable_nan_debugging,
)
# NOTE: utils.preflight is deliberately NOT imported here — it is also a
# runnable module (python -m ...utils.preflight), and an eager package
# import would shadow runpy's fresh execution with a sys.modules warning.

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "strip_module_prefix",
    "seed_all",
    "checkified",
    "ReduceLROnPlateau",
    "EarlyStopping",
    "timed",
    "StepTimer",
    "trace",
    "dump_jaxpr",
    "dump_hlo",
    "enable_nan_debugging",
]
