from .profiler import device_memory_mb, timed, SegmentTimer, trace
from .debug import validate_graph, checked, find_nans

__all__ = ["device_memory_mb", "timed", "SegmentTimer", "trace",
           "validate_graph", "checked", "find_nans"]
