"""Tracing / profiling / watchdog utilities.

TPU-native equivalents of the reference's ad-hoc instrumentation
(`lib/utils/utils.py:20-23` device_time, `lib/utils/eval_meter.py:47-63`
AverageMeter, `lib/object_slam.py:110-170` timing meters, `train.py:105-109`
RAM watchdog): `device_time` synchronizes outstanding device work before
reading the clock (the `torch.cuda.synchronize()` analogue), `trace` wraps
`jax.profiler` so a run can be inspected in xprof/tensorboard, and
`ram_guard` aborts before the host OOMs.
"""

from __future__ import annotations

import contextlib
import time

import jax


def device_time() -> float:
    """Wall clock after draining enqueued device work."""
    try:
        jax.effects_barrier()
    except Exception:
        pass
    return time.perf_counter()


class AverageMeter:
    """Numerically-stable running average (`eval_meter.py:47-63`)."""

    def __init__(self):
        self.avg = 0.0
        self.n = 0

    def update(self, x, k: int = 1):
        self.n += k
        self.avg = ((self.n - k) * self.avg + x) / self.n

    def average(self) -> float:
        return self.avg


class Timer:
    """Context-manager timer feeding an AverageMeter.

    >>> t = Timer()
    >>> with t:  # doctest: +SKIP
    ...     work()
    >>> t.hz()  # doctest: +SKIP
    """

    def __init__(self, sync: bool = False):
        self.meter = AverageMeter()
        self.sync = sync
        self.last = 0.0

    def __enter__(self):
        self._t0 = device_time() if self.sync else time.perf_counter()
        return self

    def __exit__(self, *exc):
        t1 = device_time() if self.sync else time.perf_counter()
        self.last = t1 - self._t0
        self.meter.update(self.last)
        return False

    def average(self) -> float:
        return self.meter.average()

    def hz(self) -> float:
        a = self.meter.average()
        return 0.0 if a <= 0 else 1.0 / a


@contextlib.contextmanager
def trace(logdir: str | None):
    """jax.profiler trace scope (xprof/tensorboard); no-op when logdir None."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def ram_guard(max_percent: float = 99.0) -> bool:
    """True if host RAM usage is below the limit; the reference exits the
    training process above 99% (`train.py:105-109`)."""
    try:
        import psutil

        return psutil.virtual_memory().percent < max_percent
    except Exception:
        return True
