"""Timing utilities.

Replicates the two timing mechanisms of the reference platform:

1. Nested scoped wall-clock timers printing ``"<name> starts"`` /
   ``"<name> duration: Xs"`` lines with tab indentation
   (reference: src/main/c/include/computation_timer.hpp:23-50).

2. The authoritative benchmark metric — epoch-millisecond markers
   ``"Processing starts at: <ms>"`` / ``"Processing ends at: <ms>"``
   written to stdout around the kernel, harvested later by the collector
   (reference: src/main/c/src/algorithms/bfs.cpp:105-107 and
   src/main/java/.../GraphblasCollector.java:54-95). The marker strings
   are kept byte-compatible so the metric pipeline has the same contract.
"""

from __future__ import annotations

import sys
import time
import threading

START_PROC_MARKER = "Processing starts at: "
END_PROC_MARKER = "Processing ends at: "

_nesting = threading.local()


def _level() -> int:
    return getattr(_nesting, "level", 0)


def _set_level(v: int) -> None:
    _nesting.level = v


def current_millis() -> int:
    """Epoch milliseconds (reference: src/main/c/src/utils.cpp:8-13)."""
    return int(time.time() * 1000)


def proc_time_start(stream=None) -> int:
    """Emit the processing-window-open marker; returns the epoch-ms stamp."""
    ms = current_millis()
    print(f"{START_PROC_MARKER}{ms}", file=stream or sys.stdout, flush=True)
    return ms


def proc_time_end(stream=None) -> int:
    """Emit the processing-window-close marker; returns the epoch-ms stamp."""
    ms = current_millis()
    print(f"{END_PROC_MARKER}{ms}", file=stream or sys.stdout, flush=True)
    return ms


class ComputationTimer:
    """Scoped nested timer, context-manager flavor of the reference's RAII timer.

    >>> with ComputationTimer("Loading graph"):
    ...     ...
    prints "Loading graph starts" then "Loading graph duration: 0.123s",
    indented one tab per nesting level.
    """

    def __init__(self, name: str, print_on_exit: bool = True, stream=None):
        self.name = name
        self.print_on_exit = print_on_exit
        self.stream = stream or sys.stdout
        self.elapsed: float = 0.0

    def __enter__(self) -> "ComputationTimer":
        self._indent = "\t" * _level()
        _set_level(_level() + 1)
        print(f"{self._indent}{self.name} starts", file=self.stream, flush=True)
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        self.elapsed = time.perf_counter() - self._t0
        _set_level(_level() - 1)
        if self.print_on_exit:
            print(
                f"{self._indent}{self.name} duration: {self.elapsed}s",
                file=self.stream,
                flush=True,
            )


class IterationTimer:
    """Per-iteration device timing, the analogue of the reference's CUDA-event
    timer queue printing ``[CUDA][TIMER] <name> took Xms``
    (reference: src/main/c/src/algorithms/common/utils.hpp:344-382).

    On TPU, the device work is asynchronous; ``stop`` blocks on the given
    jax array(s) so the measured span covers real device time.
    """

    PREFIX = "[TPU][TIMER]"

    def __init__(self, enabled: bool = True, stream=None):
        self.enabled = enabled
        self.stream = stream or sys.stdout
        self.records: list[tuple[str, float]] = []

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, name: str, *block_on) -> float:
        for arr in block_on:
            if hasattr(arr, "block_until_ready"):
                arr.block_until_ready()
        ms = (time.perf_counter() - self._t0) * 1000.0
        self.records.append((name, ms))
        if self.enabled:
            print(f"{self.PREFIX} {name} took {ms:.3f}ms", file=self.stream, flush=True)
        return ms
