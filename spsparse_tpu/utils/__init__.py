"""Utilities: tracing/profiling scopes, roofline accounting, determinism."""

from .trace import traced, trace_scope
from .roofline import OpStats, roofline, device_hbm_bandwidth, SOL_BW

__all__ = ["traced", "trace_scope", "OpStats", "roofline",
           "device_hbm_bandwidth", "SOL_BW"]
