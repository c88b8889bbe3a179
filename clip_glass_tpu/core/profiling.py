"""Profiling / observability utilities.

The reference's only instrumentation is a pretty-printing context Timer and
an EMA ValueTracker, used by its Trainer (reference stylegan2/utils.py:69-104,
474-504); the GA loop has none (SURVEY.md §5.1). Here profiling is
first-class: wall-clock timers, EMA trackers for loss/fitness streams,
generation-rate reporting for the search loop, and a context manager around
`jax.profiler.trace` for on-device TPU traces (view with xprof/tensorboard).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class Timer:
    """Context-manager wall timer (reference stylegan2/utils.py:69-104)."""

    def __init__(self, name: str = "", verbose: bool = False):
        self.name = name
        self.verbose = verbose
        self.seconds = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self._t0
        if self.verbose:
            print(f"[{self.name or 'timer'}] {self.format(self.seconds)}")
        return False

    @staticmethod
    def format(s: float) -> str:
        if s >= 1.0:
            return f"{s:.3f} s"
        if s >= 1e-3:
            return f"{s * 1e3:.3f} ms"
        if s >= 1e-6:
            return f"{s * 1e6:.1f} us"
        return f"{s * 1e9:.0f} ns"


class ValueTracker:
    """EMA tracker of scalar streams (reference stylegan2/utils.py:474-504)."""

    def __init__(self, beta: float = 0.95):
        self.beta = beta
        self._values: Dict[str, float] = {}
        self._raw: Dict[str, float] = {}

    def add(self, name: str, value: float):
        value = float(value)
        self._raw[name] = value
        if name in self._values:
            self._values[name] = self.beta * self._values[name] + (1 - self.beta) * value
        else:
            self._values[name] = value

    def value(self, name: str) -> float:
        return self._values[name]

    def raw(self, name: str) -> float:
        return self._raw[name]

    def names(self):
        return sorted(self._values)

    def format(self) -> str:
        return "  ".join(f"{k}={self._values[k]:.4g}" for k in self.names())


class GenerationMeter:
    """Search-loop rate meter: generations/sec and candidates/sec."""

    def __init__(self, pop_size: int):
        self.pop_size = pop_size
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._gens = 0
        self._base = 0

    def update(self, n_gens: int = 1):
        self._gens += n_gens

    @property
    def generation(self) -> int:
        """Current absolute generation counter."""
        return self._gens

    def rebaseline(self, gen: int):
        """Restart the clock at absolute generation `gen`: subsequent rates
        measure only work done after this call. Use after any wall-clock
        block that is not search work (XLA compilation, checkpoint load)."""
        self._t0 = time.perf_counter()
        self._base = int(gen)
        self._gens = int(gen)

    def set_generation(self, gen: int, rebaseline: bool = False):
        """Pin the absolute generation counter (resumed searches / chunked
        drivers that learn the count from the GA state). Pass
        rebaseline=True to also restart the clock (see rebaseline());
        callers that cannot tell whether compile time polluted the elapsed
        window should rebaseline on their first call."""
        if rebaseline:
            self.rebaseline(gen)
        else:
            self._gens = int(gen)

    @property
    def gens_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return (self._gens - self._base) / dt if dt > 0 else 0.0

    @property
    def candidates_per_sec(self) -> float:
        return self.gens_per_sec * self.pop_size


class ProgressWriter:
    """Minimal progress reporter (reference stylegan2/utils.py:536-633 wraps
    tqdm/notebook displays; tqdm is unavailable here, so this writes
    carriage-return progress lines to stdout)."""

    def __init__(self, total: int, label: str = "", stream=None):
        import sys
        self.total = total
        self.label = label
        self.n = 0
        self._stream = stream or sys.stdout
        self._t0 = time.perf_counter()

    def update(self, n: int = 1, **values):
        self.n += n
        dt = time.perf_counter() - self._t0
        rate = self.n / dt if dt > 0 else 0.0
        extra = "  ".join(f"{k}={v:.4g}" for k, v in values.items())
        pct = 100.0 * self.n / max(self.total, 1)
        self._stream.write(
            f"\r{self.label} {self.n}/{self.total} ({pct:.0f}%) "
            f"{rate:.2f} it/s  {extra}")
        self._stream.flush()
        if self.n >= self.total:
            self._stream.write("\n")

    def close(self):
        if self.n < self.total:
            self._stream.write("\n")


@contextlib.contextmanager
def device_trace(logdir: Optional[str]):
    """jax.profiler trace context; no-op when logdir is falsy."""
    if not logdir:
        yield
        return
    import jax
    with jax.profiler.trace(logdir):
        yield
