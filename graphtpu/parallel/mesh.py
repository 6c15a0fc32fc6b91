"""Device mesh construction.

The reference's parallelism knob is an OpenMP thread count
(platform.graphblas.num-threads, GraphblasConfiguration.java:112-117); the
TPU equivalent is the shape of a 1-D device mesh over which CSR rows are
partitioned. Intra-chip parallelism comes free from XLA.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

# The single mesh axis: CSR rows (and the incidence/center dimension for
# CDLP) are sharded along it; dense per-vertex vectors are replicated and
# refreshed per iteration with all_gather over this axis.
ROWS_AXIS = "rows"


def make_mesh(num_devices: int = 0, devices: Optional[Sequence] = None) -> jax.sharding.Mesh:
    """1-D mesh over the first `num_devices` devices (0 = all)."""
    devs = list(devices) if devices is not None else jax.devices()
    d = num_devices if num_devices > 0 else len(devs)
    if d > len(devs):
        raise ValueError(f"requested {d} devices, have {len(devs)}")
    return jax.sharding.Mesh(np.asarray(devs[:d]), (ROWS_AXIS,))


def replicated(mesh: jax.sharding.Mesh) -> jax.sharding.NamedSharding:
    return jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())


def row_sharded(mesh: jax.sharding.Mesh) -> jax.sharding.NamedSharding:
    return jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(ROWS_AXIS))
