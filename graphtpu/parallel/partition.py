"""Row-partitioned sparse graph containers for multi-chip execution.

Design (SURVEY.md §2.9, §5.7-5.8): a 1-D partition of destination rows
over the mesh. Each device owns a contiguous block of `rows_per_dev`
rows and the pull-ordered edges targeting them; dense per-vertex vectors
(ranks, labels, distances, frontiers) are replicated, and each iteration
ends with an `all_gather` of the locally-reduced block — the TPU
translation of the reference's host↔device CSR transfer + global memory
model (cdlp_kernel.cu:1195-1196), except the exchange rides ICI.

Per-device edge blocks are padded to a common static width so the whole
program has static shapes under jit; padding entries carry a `valid`
mask and are folded with the semiring's additive identity.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from graphtpu.core.graph import Graph
from graphtpu.core.types import INDEX_DTYPE
from graphtpu.parallel.mesh import ROWS_AXIS

# Row blocks padded to a multiple of the f32 VPU tile's lane count.
ROW_ALIGN = 128
# Edge blocks padded to a multiple of one VPU tile.
EDGE_ALIGN = 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def put_sharded(arr, sharding: NamedSharding) -> jax.Array:
    """Place a host-global array under `sharding`, valid when the mesh
    spans processes: every process holds the same host array (graph
    builds are deterministic and replicated), and each contributes only
    the shards its local devices own via make_array_from_callback.
    Single-process meshes keep the cheaper direct device_put."""
    if jax.process_count() > 1:
        arr = np.asarray(arr)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )
    return jax.device_put(jnp.asarray(arr), sharding)


class ShardedCOO(NamedTuple):
    """Pull-ordered edges partitioned by destination row block.

    All arrays are [num_devices, edges_per_dev], sharded along axis 0.
    `dst_local` is the destination row relative to the owning block and is
    nondecreasing within each block (so segment reductions stay sorted).
    """

    src: jax.Array        # int32 — global source ids
    dst_local: jax.Array  # int32 — block-local destination rows
    w: jax.Array          # float — edge weights (1.0 when unweighted)
    valid: jax.Array      # bool  — False for padding entries


class ShardedIncidence(NamedTuple):
    """(center, neighbor) incidence stream partitioned by center block
    (for CDLP). Padding entries get center_local == rows_per_dev, i.e. an
    extra throwaway segment past the real rows."""

    center_local: jax.Array  # int32 [D, M_pad]
    neigh: jax.Array         # int32 [D, M_pad] — global neighbor ids
    valid: jax.Array         # bool  [D, M_pad]


def _partition_stream(
    mesh: jax.sharding.Mesh,
    key: np.ndarray,          # sorted global destination/center ids
    rows_per_dev: int,
    columns: dict,            # name -> (array, pad_value)
    pad_key_value: int,
):
    """Split a key-sorted edge stream into per-device blocks, padding each
    block to the max block size (aligned)."""
    num_devices = mesh.devices.size
    # key is sorted ascending, so each device's slice is contiguous.
    bounds = np.searchsorted(key, np.arange(1, num_devices + 1) * rows_per_dev, side="left")
    starts = np.concatenate([[0], bounds[:-1]])
    counts = bounds - starts
    m_pad = max(_round_up(int(counts.max()) if num_devices else 0, EDGE_ALIGN), EDGE_ALIGN)

    out = {}
    key_local = np.full((num_devices, m_pad), pad_key_value, dtype=INDEX_DTYPE)
    valid = np.zeros((num_devices, m_pad), dtype=bool)
    for d in range(num_devices):
        s, c = int(starts[d]), int(counts[d])
        key_local[d, :c] = key[s : s + c] - d * rows_per_dev
        valid[d, :c] = True
    for name, (arr, pad_value) in columns.items():
        block = np.full((num_devices, m_pad), pad_value, dtype=arr.dtype)
        for d in range(num_devices):
            s, c = int(starts[d]), int(counts[d])
            block[d, :c] = arr[s : s + c]
        out[name] = block
    return key_local, valid, out, m_pad


class ShardedGraph:
    """A Graph partitioned over a 1-D mesh, with lazily-built device views."""

    def __init__(self, graph: Graph, mesh: jax.sharding.Mesh, wdtype=np.float32):
        self.graph = graph
        self.mesh = mesh
        self.num_devices = int(mesh.devices.size)
        self.n = graph.n
        self.n_pad = max(
            _round_up(graph.n, self.num_devices * ROW_ALIGN),
            self.num_devices * ROW_ALIGN,
        )
        self.rows_per_dev = self.n_pad // self.num_devices
        self.wdtype = np.dtype(wdtype)

        self._pull: Optional[ShardedCOO] = None
        self._pull_sym: Optional[ShardedCOO] = None
        self._incidence: Optional[ShardedIncidence] = None
        # (intermediate_dir, graph_name) — when set, pull() restores the
        # partition from the sharded checkpoint and persists it after a
        # fresh build (SURVEY.md §5.4 skip-if-exists contract)
        self.ckpt: Optional[tuple] = None

    # -- shardings ---------------------------------------------------------

    @property
    def edge_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(ROWS_AXIS, None))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def put_replicated(self, arr) -> jax.Array:
        return put_sharded(arr, self.replicated)

    def pad_vector(self, vec: np.ndarray, pad_value) -> np.ndarray:
        out = np.full(self.n_pad, pad_value, dtype=vec.dtype)
        out[: self.n] = vec
        return out

    # -- edge partitions ----------------------------------------------------

    def _build_pull(self, graph: Graph) -> ShardedCOO:
        src, dst, w = graph.pull_arrays()
        w = w.astype(self.wdtype)
        dst_local, valid, cols, _ = _partition_stream(
            self.mesh,
            dst,
            self.rows_per_dev,
            {"src": (src, 0), "w": (w, 0)},
            pad_key_value=self.rows_per_dev - 1,
        )
        put = lambda a: put_sharded(a, self.edge_sharding)
        return ShardedCOO(put(cols["src"]), put(dst_local), put(cols["w"]), put(valid))

    def pull(self) -> ShardedCOO:
        """Pull-ordered edges of the graph itself. With `ckpt` set, a
        saved partition is restored instead of repartitioning, and a
        fresh build is persisted for the next run."""
        if self._pull is None:
            if self.ckpt is not None:
                from graphtpu.parallel import checkpoint as ckpt_mod

                self._pull = ckpt_mod.load_pull(self, *self.ckpt)
            if self._pull is None:
                self._pull = self._build_pull(self.graph)
                if self.ckpt is not None:
                    from graphtpu.parallel import checkpoint as ckpt_mod

                    ckpt_mod.save_pull(self, *self.ckpt)
        return self._pull

    def pull_symmetrized(self) -> ShardedCOO:
        """Pull-ordered edges of the symmetrized structure (WCC). With
        `ckpt` set the partition persists like pull()'s — it is the
        LARGEST partition (2x edges), so skip-if-exists matters most."""
        if self.graph.directed:
            if self._pull_sym is None:
                if self.ckpt is not None:
                    from graphtpu.parallel import checkpoint as ckpt_mod

                    inter, name = self.ckpt
                    self._pull_sym = ckpt_mod.load_pull_named(
                        self, inter, f"{name}-sym", self.graph.symmetrized
                    )
                if self._pull_sym is None:
                    self._pull_sym = self._build_pull(self.graph.symmetrized())
                    if self.ckpt is not None:
                        from graphtpu.parallel import checkpoint as ckpt_mod

                        inter, name = self.ckpt
                        ckpt_mod.save_pull_named(
                            self, inter, f"{name}-sym", self._pull_sym,
                            self.graph.symmetrized(),
                        )
            return self._pull_sym
        return self.pull()

    def incidence(self) -> ShardedIncidence:
        """CDLP (center, neighbor) multiset partitioned by center."""
        if self._incidence is None:
            from graphtpu.algorithms.cdlp import build_incidence

            centers, neigh = build_incidence(self.graph)
            center_local, valid, cols, _ = _partition_stream(
                self.mesh,
                centers.astype(np.int64),
                self.rows_per_dev,
                {"neigh": (neigh, 0)},
                pad_key_value=self.rows_per_dev,  # extra throwaway segment
            )
            put = lambda a: put_sharded(a, self.edge_sharding)
            self._incidence = ShardedIncidence(
                put(center_local), put(cols["neigh"]), put(valid)
            )
        return self._incidence

    # -- degree views (padded to n_pad, replicated) --------------------------

    def out_degree_padded(self) -> jax.Array:
        return self.put_replicated(
            self.pad_vector(self.graph.out_degree.astype(np.int32), 0)
        )

    def incidence_degree_padded(self) -> jax.Array:
        """Neighbor-multiset size per vertex (CDLP's has-neighbors test).
        Cached: the incidence stream is an O(E) host build shared with
        incidence() via the Graph-level memo."""
        if getattr(self, "_incidence_deg", None) is None:
            from graphtpu.algorithms.cdlp import build_incidence

            centers, _ = build_incidence(self.graph)
            deg = np.bincount(centers, minlength=self.n).astype(np.int32)
            self._incidence_deg = self.put_replicated(self.pad_vector(deg, 0))
        return self._incidence_deg
