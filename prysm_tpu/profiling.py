"""Profiling and timing utilities.

New work relative to the reference (SURVEY §5: the reference has no
timers or profiler hooks — performance lore lives in comments).  Thin,
dependency-free wrappers over ``jax.profiler`` plus wall-clock timing
that is honest about async dispatch (always ``block_until_ready``).
"""
import contextlib
import json
import time

import numpy as np

import jax


@contextlib.contextmanager
def trace(logdir):
    """Capture a jax/XLA profiler trace for the enclosed block.

    View with xprof / tensorboard pointed at ``logdir``.
    """
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named region that shows up on the profiler timeline."""
    return jax.profiler.TraceAnnotation(str(name))


def time_fn(fn, *args, iters=10, warmup=2, **kwargs):
    """Wall-clock statistics for fn(*args, **kwargs), dispatch-safe.

    Runs ``warmup`` untimed calls (compile + cache fill), then ``iters``
    timed calls, blocking on the outputs each call so asynchronous
    dispatch cannot hide device time.  Returns a TimingResult.
    """
    for _ in range(int(warmup)):
        jax.block_until_ready(fn(*args, **kwargs))
    samples = np.empty(int(iters), dtype=float)
    for i in range(int(iters)):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        samples[i] = time.perf_counter() - t0
    return TimingResult(samples)


class TimingResult:
    """Per-call wall-clock samples plus summary statistics."""

    __slots__ = ('samples',)

    def __init__(self, samples):
        self.samples = np.asarray(samples, dtype=float)

    @property
    def mean(self):
        """Mean seconds per call."""
        return float(self.samples.mean())

    @property
    def median(self):
        """Median seconds per call."""
        return float(np.median(self.samples))

    @property
    def best(self):
        """Fastest call, seconds."""
        return float(self.samples.min())

    @property
    def std(self):
        """Standard deviation, seconds."""
        return float(self.samples.std())

    @property
    def per_second(self):
        """Calls per second at the median."""
        return 1.0 / self.median

    def __repr__(self):
        return (f'TimingResult(median={self.median * 1e3:.3f} ms, '
                f'best={self.best * 1e3:.3f} ms, n={self.samples.size})')


def device_memory_stats(device=None):
    """Allocator statistics for one device (bytes), or {} if unsupported."""
    if device is None:
        device = jax.devices()[0]
    stats = getattr(device, 'memory_stats', None)
    if stats is None:
        return {}
    try:
        return dict(stats() or {})
    except Exception:
        return {}


def compiled_stats(fn, *args, **kwargs):
    """FLOP / memory estimates from XLA's cost analysis of fn.

    Returns a dict with whatever the backend reports (``flops``,
    ``bytes accessed`` ...); {} when the backend has no cost model.
    """
    lowered = jax.jit(fn).lower(*args, **kwargs)
    try:
        analysis = lowered.compile().cost_analysis()
    except Exception:
        return {}
    if analysis is None:
        return {}
    if isinstance(analysis, (list, tuple)):
        analysis = analysis[0] if analysis else {}
    return {k: float(v) for k, v in dict(analysis).items()
            if np.isscalar(v)}


def report(label, timing, flops=None, stream=None):
    """One machine-readable JSON line summarizing a timing run."""
    rec = {
        'label': str(label),
        'median_ms': round(timing.median * 1e3, 4),
        'best_ms': round(timing.best * 1e3, 4),
        'per_second': round(timing.per_second, 2),
    }
    if flops:
        rec['tflops_per_s'] = round(flops / timing.median / 1e12, 3)
    line = json.dumps(rec)
    print(line, file=stream)
    return rec


__all__ = [
    'trace', 'annotate', 'time_fn', 'TimingResult',
    'device_memory_stats', 'compiled_stats', 'report',
]
