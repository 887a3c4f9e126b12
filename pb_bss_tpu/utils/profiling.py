"""Profiling / tracing helpers (SURVEY §5: the reference only has a
vestigial Cython Timer; here the JAX profiler and a per-phase
wall-clock timer are first-class)."""
from __future__ import annotations

import contextlib
import time

__all__ = ['Timer', 'trace']


class Timer:
    """Per-phase wall-clock accumulation.

    >>> timer = Timer()
    >>> with timer['phase1']:
    ...     _ = sum(range(10))
    >>> sorted(timer.times) == ['phase1']
    True
    """

    def __init__(self):
        self.times = {}

    @contextlib.contextmanager
    def _measure(self, name):
        start = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) \
                + time.perf_counter() - start

    def __getitem__(self, name):
        return self._measure(name)

    def as_dict(self):
        return dict(self.times)

    def __repr__(self):
        inner = ', '.join(
            f'{k}: {v * 1e3:.2f} ms' for k, v in self.times.items())
        return f'Timer({inner})'


@contextlib.contextmanager
def trace(log_dir='/tmp/pb_bss_tpu_trace'):
    """JAX profiler trace context; view with TensorBoard/XProf."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
