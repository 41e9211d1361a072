"""Utilities: tracing/profiling scopes, roofline accounting, determinism."""

from .trace import traced, trace_scope
from .compilecache import enable_persistent_cache, default_cache_dir
from .roofline import OpStats, roofline, device_hbm_bandwidth, SOL_BW

__all__ = ["traced", "trace_scope", "OpStats", "roofline",
           "enable_persistent_cache", "default_cache_dir",
           "device_hbm_bandwidth", "SOL_BW"]
