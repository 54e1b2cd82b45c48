from .profiler import device_memory_mb, timed, SegmentTimer, trace
__all__ = ["device_memory_mb", "timed", "SegmentTimer", "trace"]
