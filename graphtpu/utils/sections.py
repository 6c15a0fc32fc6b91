"""Failure-isolated benchmark section runner (VERDICT r3 #1/#8).

The round-3 driver bench lost its only SSSP metric to a single compile
error: sections were failure-isolated but had no fallback (three SSSP
implementations in the tree, the bench tried one) and no retry (the axon
relay returns transient INTERNAL/HTTP-500s), and a wedged dispatch could
burn `_device_ping`'s full 600 s. This module packages the three
defenses so `bench.py` (and tests, with simulated failures) share them:

* **impl ladder** — a section is a list of (label, thunk) candidates;
  the first one that returns wins, later ones only run when an earlier
  one raises. The winning label is recorded (`<name>_impl_used`) so a
  fallback number is never mistaken for the default path's.
* **transient retry** — errors matching the relay's transient signatures
  (INTERNAL, HTTP 5xx, remote_compile, DEADLINE, UNAVAILABLE) are
  retried once with backoff before falling through the ladder; a
  permanent error (OOM, ValueError) falls through immediately.
* **watchdog** — each attempt runs in a daemon thread with a per-section
  budget. Python cannot kill a wedged dispatch thread, but abandoning it
  bounds what the *section* costs the run and records a timeout error
  instead of hanging the whole benchmark. A watchdog timeout aborts the
  remaining ladder (a wedged relay wedges every candidate equally).

Reference analogue: the harness's per-job timeout + kill contract
(execute-job.sh:150, reference Job base) — here applied inside the
single-process bench.
"""

from __future__ import annotations

import threading
import time
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

TRANSIENT_MARKERS = (
    "INTERNAL",
    "HTTP 50",
    "remote_compile",
    "DEADLINE",
    "UNAVAILABLE",
    "Connection",
)

# "permanent error" signatures that must NOT be retried even though the
# relay wraps them in INTERNAL: a compile OOM is deterministic
PERMANENT_MARKERS = (
    "Ran out of memory",
    "RESOURCE_EXHAUSTED",
)


def _is_transient(err: BaseException) -> bool:
    s = f"{type(err).__name__}: {err}"
    if any(m in s for m in PERMANENT_MARKERS):
        return False
    return any(m in s for m in TRANSIENT_MARKERS)


class SectionTimeout(RuntimeError):
    pass


def _run_with_watchdog(fn: Callable[[], Any], budget_s: float) -> Any:
    """Run fn in a daemon thread; raise SectionTimeout if it exceeds the
    budget (the thread is abandoned — nothing can interrupt a wedged
    device dispatch from Python)."""
    result: list = []
    error: list = []

    def target():
        try:
            result.append(fn())
        except BaseException as e:  # noqa: BLE001
            error.append(e)

    t = threading.Thread(target=target, daemon=True)
    t.start()
    t.join(budget_s)
    if t.is_alive():
        raise SectionTimeout(
            f"section attempt exceeded {budget_s:.0f}s watchdog (thread abandoned)"
        )
    if error:
        raise error[0]
    return result[0]


class SectionRunner:
    """Runs named bench sections with ladder/retry/watchdog semantics and
    records outcomes into a shared details dict."""

    def __init__(
        self,
        details: Dict[str, Any],
        *,
        default_watchdog_s: float = 300.0,
        retries: int = 1,
        backoff_s: float = 10.0,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self.details = details
        self.default_watchdog_s = default_watchdog_s
        self.retries = retries
        self.backoff_s = backoff_s
        self._sleep = sleep

    def run(
        self,
        name: str,
        candidates: Sequence[Tuple[str, Callable[[], Any]]],
        *,
        watchdog_s: Optional[float] = None,
    ) -> Optional[Any]:
        """Try each (label, thunk) until one returns. Returns its value
        (with `<name>_impl_used` recorded when a ladder exists) or None
        with `<name>_error` holding the last failure."""
        budget = self.default_watchdog_s if watchdog_s is None else watchdog_s
        last_err: Optional[str] = None
        for label, thunk in candidates:
            attempt = 0
            while True:
                try:
                    value = _run_with_watchdog(thunk, budget)
                    if len(candidates) > 1 or label != "default":
                        self.details[f"{name}_impl_used"] = label
                    return value
                except SectionTimeout as e:
                    # a wedged relay wedges every candidate: stop the ladder
                    self.details[f"{name}_error"] = f"{label}: {e}"
                    return None
                except BaseException as e:  # noqa: BLE001
                    msg = f"{type(e).__name__}: {e}"[:300]
                    last_err = f"{label}: {msg}"
                    if _is_transient(e) and attempt < self.retries:
                        attempt += 1
                        self._sleep(self.backoff_s * attempt)
                        continue
                    # permanent (or retries exhausted): record and fall
                    # through to the next rung
                    self.details.setdefault(f"{name}_errors", []).append(last_err)
                    break
        self.details[f"{name}_error"] = last_err
        return None
