from .checkpoint import save_checkpoint, load_checkpoint, strip_module_prefix
from .compilation_cache import (
    enable_compilation_cache,
    disable_compilation_cache,
    cache_enabled_by_env,
)
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
    "enable_compilation_cache",
    "disable_compilation_cache",
    "cache_enabled_by_env",
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
