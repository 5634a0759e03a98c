from .profiling import device_trace, report, reset_timings, timer, timings  # noqa: F401
