"""Multi-host launch glue.

The reference is single-host (SURVEY.md §2.9); scaling past one host is a
new capability of the TPU build. JAX's runtime handles cross-host
collectives over DCN once `jax.distributed.initialize` has run on every
process; this module wraps the init handshake with environment detection
so the same benchmark entrypoint works single-host, under multi-process
launchers (one process per host), and in TPU pod slices where the
coordinator address is discoverable from the metadata environment.

Usage (every host runs the same command):

    graphtpu benchmark --config ... --num-devices 0   # 0 = all global devices
    # with GRAPHTPU_COORDINATOR=host0:8476 GRAPHTPU_NUM_PROCESSES=2
    # GRAPHTPU_PROCESS_ID=<rank> set per host, or TPU-pod auto-detection.
"""

from __future__ import annotations

import os
from typing import Optional

from graphtpu.utils.logging import get_logger

log = get_logger("multihost")

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed if multi-host env config is present.

    Returns True when running multi-host (after a successful init),
    False for plain single-host execution. Idempotent.
    """
    global _initialized
    if _initialized:
        return True

    import jax

    coordinator_address = coordinator_address or os.environ.get("GRAPHTPU_COORDINATOR")
    num_processes = num_processes or _int_env("GRAPHTPU_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("GRAPHTPU_PROCESS_ID")

    if coordinator_address is None and num_processes is None:
        # TPU pod slices: jax.distributed.initialize() autodetects via the
        # TPU metadata server when these env vars are absent; only attempt
        # it when actually on a multi-host TPU environment.
        if os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") >= 1:
            jax.distributed.initialize()
            _initialized = True
            log.info(
                "multi-host (autodetected): process %d/%d, %d global devices",
                jax.process_index(), jax.process_count(), len(jax.devices()),
            )
            return True
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    log.info(
        "multi-host: process %d/%d, %d global devices",
        jax.process_index(), jax.process_count(), len(jax.devices()),
    )
    return True


def _int_env(key: str) -> Optional[int]:
    v = os.environ.get(key)
    return int(v) if v else None


def is_primary() -> bool:
    """True on the process that should write outputs/reports."""
    import jax

    return jax.process_index() == 0


def is_multihost() -> bool:
    """True when this process is part of an initialized multi-process
    (jax.distributed) run. Cheap: reads the module flag first so
    single-host callers don't force a jax import/backend init."""
    if not _initialized:
        return False
    import jax

    return jax.process_count() > 1
