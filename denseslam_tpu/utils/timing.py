"""Named Tic/Toc timer stack + telemetry.

TPU-side analogue of the reference's `utils::Tic/Toc` instrumentation
(reference: src/DenseSLAM/Utils.h:100-248, Utils.cpp:107-139). Host timers
wrap jitted calls with `block_until_ready` at Toc time so that the measured
interval covers actual device work, and integrate with `jax.profiler` trace
annotations.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Tuple

import jax


class TimerStack:
    """LIFO named timers, ms resolution, with running means."""

    def __init__(self) -> None:
        self._stack: List[Tuple[str, float]] = []
        self._totals: Dict[str, float] = {}
        self._counts: Dict[str, int] = {}
        self._last: Dict[str, float] = {}
        self.silent = True

    def tic(self, name: str) -> None:
        self._stack.append((name, time.perf_counter()))

    def toc(self, name: str | None = None, sync: object = None) -> float:
        """Pop the top timer; returns elapsed milliseconds.

        `sync`: optional jax array(s) to block_until_ready before stopping the
        clock, so device work is included.
        """
        if sync is not None:
            jax.block_until_ready(sync)
        if not self._stack:
            raise RuntimeError("Timers::toc with empty stack")
        top_name, start = self._stack.pop()
        if name is not None and name != top_name:
            raise RuntimeError(f"Timer mismatch: expected {top_name}, got {name}")
        ms = (time.perf_counter() - start) * 1000.0
        self._totals[top_name] = self._totals.get(top_name, 0.0) + ms
        self._counts[top_name] = self._counts.get(top_name, 0) + 1
        self._last[top_name] = ms
        if not self.silent:
            print(f"[timer] {top_name}: {ms:.2f} ms")
        return ms

    @contextlib.contextmanager
    def scope(self, name: str, sync_fn=None):
        self.tic(name)
        with jax.profiler.TraceAnnotation(name):
            result = {}
            try:
                yield result
            finally:
                self.toc(name, sync=result.get("sync"))

    def mean_ms(self, name: str) -> float:
        c = self._counts.get(name, 0)
        return self._totals.get(name, 0.0) / c if c else 0.0

    def last_ms(self, name: str) -> float:
        return self._last.get(name, 0.0)

    def report(self) -> str:
        lines = []
        for name in sorted(self._totals):
            lines.append(
                f"{name:32s} mean {self.mean_ms(name):9.3f} ms  "
                f"n={self._counts[name]:5d}  total {self._totals[name]:10.1f} ms"
            )
        return "\n".join(lines)

    def reset(self) -> None:
        self._stack.clear()
        self._totals.clear()
        self._counts.clear()
        self._last.clear()


TIMERS = TimerStack()


def tic(name: str) -> None:
    TIMERS.tic(name)


def toc(name: str | None = None, sync: object = None) -> float:
    return TIMERS.toc(name, sync=sync)
