"""Sharded partition checkpoints.

The reference caches ingest artifacts with a skip-if-exists contract
(load-graph.sh:50-67, unload-graph.sh keeps them); SURVEY.md §5.4 maps
that to persisting the *partitioned* CSR for multi-chip runs so repeat
benchmarks skip both text parsing and repartitioning. One .npz per mesh
shard plus a manifest; shards are loaded host-side and placed onto their
devices (per-shard files keep multi-host loading local: each process
reads only the shards of its addressable devices).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from graphtpu.parallel.partition import ShardedCOO, ShardedGraph
from graphtpu.utils.logging import get_logger

log = get_logger("ckpt")

MANIFEST = "manifest.json"
CKPT_VERSION = 1


def _dir(intermediate_dir, graph_name: str, num_devices: int) -> Path:
    return Path(intermediate_dir) / graph_name / f"shards-{num_devices}"


def exists(intermediate_dir, graph_name: str, num_devices: int) -> bool:
    return (_dir(intermediate_dir, graph_name, num_devices) / MANIFEST).exists()


def save_pull(sg: ShardedGraph, intermediate_dir, graph_name: str) -> Path:
    """Persist the pull partition of `sg` (one npz per device shard)."""
    d = _dir(intermediate_dir, graph_name, sg.num_devices)
    d.mkdir(parents=True, exist_ok=True)
    coo = sg.pull()
    arrays = {"src": coo.src, "dst_local": coo.dst_local, "w": coo.w, "valid": coo.valid}
    per_dev: dict = {}
    for k, v in arrays.items():
        shards = sorted(
            v.addressable_shards, key=lambda s: s.index[0].start or 0
        )
        per_dev[k] = {(s.index[0].start or 0): np.asarray(s.data)[0] for s in shards}
    for dev in sorted(per_dev["src"]):
        np.savez(
            d / f"shard-{dev}.tmp.npz",
            **{k: per_dev[k][dev] for k in arrays},
        )
        (d / f"shard-{dev}.tmp.npz").replace(d / f"shard-{dev}.npz")
    manifest = {
        "version": CKPT_VERSION,
        "num_devices": sg.num_devices,
        "n": sg.n,
        "n_pad": sg.n_pad,
        "rows_per_dev": sg.rows_per_dev,
        "wdtype": sg.wdtype.name,
        "edges_per_dev": int(coo.src.shape[1]),
    }
    (d / MANIFEST).write_text(json.dumps(manifest, indent=2))
    log.info("sharded checkpoint written: %s (%d shards)", d, sg.num_devices)
    return d


def load_pull(
    sg: ShardedGraph, intermediate_dir, graph_name: str
) -> Optional[ShardedCOO]:
    """Load a previously saved pull partition into `sg` (skip-if-exists
    consumer side). Returns None when absent or incompatible."""
    d = _dir(intermediate_dir, graph_name, sg.num_devices)
    mf = d / MANIFEST
    if not mf.exists():
        return None
    manifest = json.loads(mf.read_text())
    if (
        manifest.get("version") != CKPT_VERSION
        or manifest.get("num_devices") != sg.num_devices
        or manifest.get("n") != sg.n
        or manifest.get("rows_per_dev") != sg.rows_per_dev
        or manifest.get("wdtype") != sg.wdtype.name
    ):
        log.warning("sharded checkpoint at %s incompatible — ignoring", d)
        return None
    cols = {"src": [], "dst_local": [], "w": [], "valid": []}
    for dev in range(sg.num_devices):
        with np.load(d / f"shard-{dev}.npz") as z:
            for k in cols:
                cols[k].append(z[k])
    put = lambda parts: jax.device_put(
        jnp.asarray(np.stack(parts)), sg.edge_sharding
    )
    coo = ShardedCOO(put(cols["src"]), put(cols["dst_local"]), put(cols["w"]), put(cols["valid"]))
    sg._pull = coo
    log.info("sharded checkpoint loaded: %s", d)
    return coo
