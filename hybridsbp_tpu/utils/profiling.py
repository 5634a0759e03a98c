"""Lightweight timing/tracing helpers (aux subsystem; SURVEY §5.1).

The reference has no profiling beyond prints; here we provide a scoped
wall-clock timer registry and an optional ``jax.profiler`` trace context
for TPU timeline capture.
"""
import contextlib
import time
from collections import defaultdict

_records = defaultdict(list)


@contextlib.contextmanager
def timer(name):
    """Accumulating wall-clock scope timer."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _records[name].append(time.perf_counter() - t0)


def timings():
    """{name: (count, total_s, mean_s)} of all timer scopes so far."""
    return {k: (len(v), sum(v), sum(v) / len(v))
            for k, v in _records.items()}


def reset_timings():
    _records.clear()


def report(out=print):
    for k, (n, tot, mean) in sorted(timings().items()):
        out(f"{k:40s} n={n:6d} total={tot:9.3f}s mean={mean * 1e3:9.3f}ms")


@contextlib.contextmanager
def device_trace(logdir):
    """Capture a jax.profiler device trace (view with TensorBoard/xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
