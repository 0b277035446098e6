"""Cross-cutting utilities: visualization, profiling, numerics debugging."""

from unet_rir_tpu.utils.compile_cache import enable_compilation_cache
from unet_rir_tpu.utils.debug import assert_finite, check_deterministic, nan_debugging
from unet_rir_tpu.utils.profiling import PhaseTimer, device_memory_stats, sync, trace

__all__ = [
    "enable_compilation_cache",
    "assert_finite",
    "check_deterministic",
    "nan_debugging",
    "PhaseTimer",
    "device_memory_stats",
    "sync",
    "trace",
]
