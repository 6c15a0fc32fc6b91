"""Sharded partition checkpoints.

The reference caches ingest artifacts with a skip-if-exists contract
(load-graph.sh:50-67, unload-graph.sh keeps them); SURVEY.md §5.4 maps
that to persisting the *partitioned* CSR for multi-chip runs so repeat
benchmarks skip repartitioning. One compressed .npz per mesh shard plus
a manifest; shards are loaded host-side and placed onto their devices
(per-shard files keep multi-host loading local: each process reads only
the shards of its addressable devices).

Storage is minimal: src + dst_local only, plus a per-shard valid-edge
count inside each shard npz (the `valid` mask is derivable; counts
cannot live in the manifest because no single process knows every
device's count on a multi-host mesh) and weights only for weighted
graphs (unweighted edges are all 1.0). Compression matters on
this filesystem (~10 MB/s): sorted int32 streams deflate well.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from graphtpu.ops.slab import bucket_policy_key as _bucket_policy_key
from graphtpu.parallel.partition import ShardedCOO, ShardedGraph
from graphtpu.utils.logging import get_logger

log = get_logger("ckpt")

MANIFEST = "manifest.json"
CKPT_VERSION = 3


def _dir(intermediate_dir, graph_name: str, num_devices: int) -> Path:
    return Path(intermediate_dir) / graph_name / f"shards-{num_devices}"


def exists(intermediate_dir, graph_name: str, num_devices: int) -> bool:
    return (_dir(intermediate_dir, graph_name, num_devices) / MANIFEST).exists()


def _shards_by_device(arr: jax.Array) -> dict:
    return {
        (s.index[0].start or 0): np.asarray(s.data)[0]
        for s in arr.addressable_shards
    }


def save_pull(sg: ShardedGraph, intermediate_dir, graph_name: str) -> Path:
    """Persist the pull partition of `sg` (one npz per device shard)."""
    return save_pull_named(sg, intermediate_dir, graph_name, sg.pull(), sg.graph)


def save_pull_named(
    sg: ShardedGraph, intermediate_dir, graph_name: str, coo: ShardedCOO,
    source_graph,
) -> Path:
    """save_pull for an arbitrary partition of `sg`'s mesh (e.g. the
    symmetrized pull under "<name>-sym") built from `source_graph`."""
    d = _dir(intermediate_dir, graph_name, sg.num_devices)
    d.mkdir(parents=True, exist_ok=True)
    weighted = bool(source_graph.weighted)
    src = _shards_by_device(coo.src)
    dst = _shards_by_device(coo.dst_local)
    w = _shards_by_device(coo.w) if weighted else {}
    valid = _shards_by_device(coo.valid)
    # each process writes ONLY its addressable shards; the valid-edge
    # count rides inside each shard npz (self-describing) because no one
    # process knows every device's count on a multi-host mesh
    for dev in sorted(src):
        arrays = {
            "src": src[dev],
            "dst_local": dst[dev],
            "count": np.int64(valid[dev].sum()),
        }
        if weighted:
            arrays["w"] = w[dev]
        tmp = d / f"shard-{dev}.tmp.npz"
        np.savez_compressed(tmp, **arrays)
        tmp.replace(d / f"shard-{dev}.npz")
    if _is_primary():
        # global metadata only — replicated knowledge, no per-shard data
        manifest = {
            "version": CKPT_VERSION,
            "num_devices": sg.num_devices,
            "n": sg.n,
            "n_pad": sg.n_pad,
            "rows_per_dev": sg.rows_per_dev,
            "wdtype": sg.wdtype.name,
            "weighted": weighted,
            "edges_per_dev": int(coo.src.shape[1]),
        }
        (d / MANIFEST).write_text(json.dumps(manifest, indent=2))
    log.info("sharded checkpoint written: %s (%d shards)", d, sg.num_devices)
    return d


def _is_primary() -> bool:
    from graphtpu.parallel.multihost import is_primary

    return is_primary()


def load_pull(
    sg: ShardedGraph, intermediate_dir, graph_name: str
) -> Optional[ShardedCOO]:
    """Load a previously saved pull partition into `sg` (skip-if-exists
    consumer side). Returns None when absent or incompatible."""
    coo = load_pull_named(sg, intermediate_dir, graph_name)
    if coo is not None:
        sg._pull = coo
    return coo


def load_pull_named(
    sg: ShardedGraph, intermediate_dir, graph_name: str, source_graph_fn=None
) -> Optional[ShardedCOO]:
    """load_pull for an arbitrary named partition (e.g. "<name>-sym").
    `source_graph_fn` lazily yields the graph whose weighted-ness the
    manifest must match (defaults to sg.graph); it is only called when a
    manifest exists."""
    d = _dir(intermediate_dir, graph_name, sg.num_devices)
    mf = d / MANIFEST
    if not mf.exists():
        return None
    src_graph = source_graph_fn() if source_graph_fn is not None else sg.graph
    manifest = json.loads(mf.read_text())
    if (
        manifest.get("version") != CKPT_VERSION
        or manifest.get("num_devices") != sg.num_devices
        or manifest.get("n") != sg.n
        or manifest.get("rows_per_dev") != sg.rows_per_dev
        or manifest.get("wdtype") != sg.wdtype.name
        or manifest.get("weighted") != bool(src_graph.weighted)
    ):
        log.warning("sharded checkpoint at %s incompatible — ignoring", d)
        return None
    weighted = manifest["weighted"]
    m_pad = manifest["edges_per_dev"]
    cols = {"src": [], "dst_local": [], "w": [], "valid": []}
    for dev in range(sg.num_devices):
        with np.load(d / f"shard-{dev}.npz") as z:
            cols["src"].append(z["src"])
            cols["dst_local"].append(z["dst_local"])
            count = int(z["count"])
            if weighted:
                cols["w"].append(z["w"])
            else:
                cols["w"].append(np.ones(m_pad, dtype=sg.wdtype))
        valid = np.zeros(m_pad, dtype=bool)
        valid[:count] = True
        cols["valid"].append(valid)
    from graphtpu.parallel.partition import put_sharded

    put = lambda parts: put_sharded(np.stack(parts), sg.edge_sharding)
    coo = ShardedCOO(put(cols["src"]), put(cols["dst_local"]), put(cols["w"]), put(cols["valid"]))
    log.info("sharded checkpoint loaded: %s", d)
    return coo


# -------------------------------------------------------------- slab plans
#
# The production distributed kernels (parallel/slab_pr.py,
# parallel/slab_cdlp.py) run over a host-built DistSlabPlan rather than
# the pull COO, so the skip-if-exists contract must cover the plan
# itself: the expensive parts of a repeat run are the host-side
# pull/incidence lexsorts and the per-bucket slab fills, all of which the
# plan checkpoint skips. Layout mirrors save_pull: one npz per device
# shard (bucket slices + heavy stream slices) plus a replicated npz
# (assembly permutation, incidence mask) and a manifest.

PLAN_VERSION = 1


def _plan_dir(intermediate_dir, graph_name: str, num_devices: int, kind: str) -> Path:
    return _dir(intermediate_dir, graph_name, num_devices) / f"plan-{kind}"


def plan_exists(intermediate_dir, graph_name: str, num_devices: int, kind: str) -> bool:
    return (_plan_dir(intermediate_dir, graph_name, num_devices, kind) / MANIFEST).exists()


def save_plan(plan, intermediate_dir, graph_name: str, num_devices: int,
              n: int, kind: str, buckets) -> Optional[Path]:
    """Persist a DistSlabPlan. Each process writes the shards of ITS
    addressable devices (a sharded array's remote shards cannot be read
    cross-process); the primary also writes the replicated arrays and
    the manifest."""
    d = _plan_dir(intermediate_dir, graph_name, num_devices, kind)
    d.mkdir(parents=True, exist_ok=True)
    bucket_shards = [_shards_by_device(s) for s in plan.bucket_slabs]
    heavy_shards = (
        [_shards_by_device(h) for h in plan.heavy] if plan.heavy is not None else None
    )
    local_devs = sorted(bucket_shards[0]) if bucket_shards else (
        sorted(heavy_shards[0]) if heavy_shards else []
    )
    for dev in local_devs:
        arrays = {f"bucket{i}": bs[dev] for i, bs in enumerate(bucket_shards)}
        if heavy_shards is not None:
            arrays["heavy_c"], arrays["heavy_nb"], arrays["heavy_ip"] = (
                hs[dev] for hs in heavy_shards
            )
        tmp = d / f"shard-{dev}.tmp.npz"
        np.savez_compressed(tmp, **arrays)
        tmp.replace(d / f"shard-{dev}.npz")
    if not _is_primary():
        return d
    tmp = d / "replicated.tmp.npz"
    np.savez_compressed(
        tmp,
        inv_perm=np.asarray(plan.inv_perm),
        has_neighbors=np.asarray(plan.has_neighbors),
    )
    tmp.replace(d / "replicated.npz")
    manifest = {
        "version": PLAN_VERSION,
        "num_devices": num_devices,
        "n": n,
        "kind": kind,
        "buckets": _bucket_policy_key(buckets),
        "num_buckets": len(plan.bucket_slabs),
        "heavy": plan.heavy is not None,
    }
    (d / MANIFEST).write_text(json.dumps(manifest, indent=2))
    log.info("slab plan checkpoint written: %s (%d shards)", d, num_devices)
    return d


def load_plan(intermediate_dir, graph_name: str, kind: str, mesh, n: int, buckets):
    """Restore a DistSlabPlan onto `mesh`. Returns None when absent or
    incompatible (different mesh size, graph size, or bucket config)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from graphtpu.parallel.mesh import ROWS_AXIS
    from graphtpu.parallel.partition import put_sharded
    from graphtpu.parallel.slab_cdlp import DistSlabPlan

    num_devices = int(mesh.devices.size)
    d = _plan_dir(intermediate_dir, graph_name, num_devices, kind)
    mf = d / MANIFEST
    if not mf.exists():
        return None
    manifest = json.loads(mf.read_text())
    if (
        manifest.get("version") != PLAN_VERSION
        or manifest.get("num_devices") != num_devices
        or manifest.get("n") != n
        or manifest.get("kind") != kind
        or manifest.get("buckets") != _bucket_policy_key(buckets)
    ):
        log.warning("slab plan checkpoint at %s incompatible — ignoring", d)
        return None
    num_buckets = manifest["num_buckets"]
    per_dev = []
    for dev in range(num_devices):
        with np.load(d / f"shard-{dev}.npz") as z:
            per_dev.append({k: z[k] for k in z.files})
    edge_sharding3 = NamedSharding(mesh, P(ROWS_AXIS, None, None))
    edge_sharding2 = NamedSharding(mesh, P(ROWS_AXIS, None))
    replicated = NamedSharding(mesh, P())
    slabs = tuple(
        put_sharded(np.stack([per_dev[dev][f"bucket{i}"] for dev in range(num_devices)]),
                    edge_sharding3)
        for i in range(num_buckets)
    )
    heavy = None
    if manifest["heavy"]:
        heavy = tuple(
            put_sharded(np.stack([per_dev[dev][k] for dev in range(num_devices)]),
                        edge_sharding2)
            for k in ("heavy_c", "heavy_nb", "heavy_ip")
        )
    with np.load(d / "replicated.npz") as z:
        inv_perm = put_sharded(z["inv_perm"], replicated)
        has_neighbors = put_sharded(z["has_neighbors"], replicated)
    log.info("slab plan checkpoint loaded: %s", d)
    return DistSlabPlan(slabs, heavy, inv_perm, has_neighbors)


def cached_plan(sg, attr: str, kind: str, build, buckets=None):
    """Memo -> checkpoint -> build resolution for a DistSlabPlan, the
    one copy of the boilerplate shared by distributed CDLP, PR, and WCC
    (round-5 dedup): return the plan cached on the ShardedGraph under
    `attr`; else restore it from the sharded checkpoint (when sg.ckpt
    is set); else `build()` it and persist it for the next run
    (SURVEY.md §5.4 skip-if-exists contract)."""
    plan = getattr(sg, attr, None)
    if plan is None:
        ck = getattr(sg, "ckpt", None)
        if ck is not None:
            plan = load_plan(*ck, kind=kind, mesh=sg.mesh, n=sg.n,
                             buckets=buckets)
        if plan is None:
            plan = build()
            if ck is not None:
                save_plan(plan, *ck, num_devices=sg.num_devices, n=sg.n,
                          kind=kind, buckets=buckets)
        setattr(sg, attr, plan)
    return plan
