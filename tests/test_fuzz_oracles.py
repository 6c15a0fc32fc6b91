"""Independent pure-numpy oracle fuzz for all six algorithms.

The suite's other correctness evidence is golden fixtures (tiny, fixed)
and cross-implementation parity (kernels vs kernels). This module adds
a THIRD, fully independent leg: randomized graphs (duplicate edges,
self-loops, isolated vertices, directed/undirected, weighted) checked
against from-scratch numpy/Python oracles that share no code with the
kernels — textbook BFS queue, Dijkstra, union-find, dense power
iteration, brute-force neighborhood counting, and a literal min-mode
simulation. SURVEY.md §4: "we must do better" than the reference's
zero unit tests; this is the property-test layer.
"""

import heapq

import numpy as np
import pytest

from graphtpu.algorithms.common import run_algorithm
from graphtpu.core.graph import Graph
from graphtpu.core.types import UNREACHABLE
from graphtpu.utils.config import AlgorithmParams, PlatformConfig


def _random_graph(seed, directed, weighted, n=80, m=400):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    src[:20] = src[100:120]  # duplicates
    dst[:20] = dst[100:120]
    dst[20:26] = src[20:26]  # self loops
    # weights keyed by the unordered pair: undirected inputs stay
    # conflict-free (core/graph.py rejects conflicting pair weights)
    w = (
        (np.minimum(src, dst) * 7 + np.maximum(src, dst) * 3) % 13 + 1.0
        if weighted
        else None
    )
    ids = np.arange(n, dtype=np.int64) * 2 + 1  # sparse original ids
    return Graph.from_original_ids(
        ids, ids[src], ids[dst], w, directed, weighted
    )


def _adj(g):
    """Forward adjacency (dense ids) as list of arrays."""
    return [g.dst[g.indptr[v]: g.indptr[v + 1]] for v in range(g.n)]


def _sym_adj(g):
    s = g.symmetrized()
    return [
        np.unique(s.dst[s.indptr[v]: s.indptr[v + 1]]) for v in range(s.n)
    ]


# ----------------------------------------------------------------- oracles


def _bfs_oracle(g, src):
    from collections import deque

    adj = _adj(g) if g.directed else _sym_adj(g)
    lev = np.full(g.n, -1, dtype=np.int64)
    lev[src] = 0
    q = deque([src])
    while q:
        u = q.popleft()
        for v in adj[u]:
            if lev[v] < 0:
                lev[v] = lev[u] + 1
                q.append(v)
    out = lev.astype(np.int64)
    out[lev < 0] = UNREACHABLE
    return out


def _sssp_oracle(g, src):
    dist = np.full(g.n, np.inf)
    dist[src] = 0.0
    adj = [
        list(zip(g.dst[g.indptr[v]: g.indptr[v + 1]],
                 g.w[g.indptr[v]: g.indptr[v + 1]]))
        for v in range(g.n)
    ]
    pq = [(0.0, src)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist[u]:
            continue
        for v, w in adj[u]:
            nd = d + w
            if nd < dist[v]:
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def _wcc_oracle(g):
    parent = np.arange(g.n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(g.src, g.dst):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    return np.array([find(v) for v in range(g.n)])


def _pr_oracle(g, damping, iters):
    n = g.n
    out_deg = g.out_degree.astype(np.float64)
    r = np.full(n, 1.0 / n)
    dangling = out_deg == 0
    for _ in range(iters):
        contrib = np.where(dangling, 0.0, r / np.where(dangling, 1, out_deg))
        pulled = np.zeros(n)
        np.add.at(pulled, g.dst, contrib[g.src])
        r = (1 - damping) / n + damping * (pulled + r[dangling].sum() / n)
    return r


def _lcc_oracle(g):
    neigh = _sym_adj(g)
    neigh = [nb[nb != v] for v, nb in enumerate(neigh)]
    eset = set(zip(g.src.tolist(), g.dst.tolist()))
    out = np.zeros(g.n)
    for v in range(g.n):
        nb = neigh[v]
        d = len(nb)
        if d < 2:
            continue
        links = sum(
            (int(a), int(b)) in eset for a in nb for b in nb if a != b
        )
        out[v] = links / (d * (d - 1))
    return out


def _cdlp_oracle(g, itermax):
    """Literal Graphalytics LPA: per iteration every vertex takes the
    smallest most-frequent label over its neighbor multiset (directed:
    in- AND out-neighbors, bidirectional edges counted twice —
    LAGraph_cdlp.c:47-50)."""
    labels = np.arange(g.n)
    pairs = np.concatenate(
        [np.stack([g.src, g.dst], 1)]
        + ([np.stack([g.dst, g.src], 1)] if g.directed else [])
    )
    for _ in range(itermax):
        new = labels.copy()
        for v in range(g.n):
            nb = pairs[pairs[:, 0] == v, 1]
            if nb.size == 0:
                continue
            lab = labels[nb]
            vals, cnts = np.unique(lab, return_counts=True)
            new[v] = vals[cnts == cnts.max()].min()
        if np.array_equal(new, labels):
            break
        labels = new
    return labels


# ------------------------------------------------------------------- tests


CFG = PlatformConfig(precision="float64")


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("directed", [True, False])
def test_fuzz_bfs(seed, directed):
    g = _random_graph(seed, directed, False)
    res = run_algorithm("bfs", g, AlgorithmParams(source_vertex=int(g.mapping[0])), CFG)
    np.testing.assert_array_equal(res.values, _bfs_oracle(g, 0))


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("directed", [True, False])
def test_fuzz_sssp(seed, directed):
    g = _random_graph(seed, directed, True)
    res = run_algorithm("sssp", g, AlgorithmParams(source_vertex=int(g.mapping[0])), CFG)
    np.testing.assert_allclose(res.values, _sssp_oracle(g, 0), rtol=1e-12)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("directed", [True, False])
def test_fuzz_wcc(seed, directed):
    g = _random_graph(seed, directed, False)
    res = run_algorithm("wcc", g, AlgorithmParams(), CFG)
    ref = _wcc_oracle(g)
    # equivalence-class comparison (labels arbitrary)
    _, mi = np.unique(res.values, return_inverse=True)
    _, gi = np.unique(ref, return_inverse=True)
    n_m, n_g = mi.max() + 1, gi.max() + 1
    assert n_m == n_g
    assert np.unique(mi * n_g + gi).size == n_m


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("directed", [True, False])
def test_fuzz_pr(seed, directed):
    g = _random_graph(seed, directed, False)
    res = run_algorithm(
        "pr", g, AlgorithmParams(damping_factor=0.85, num_iterations=12), CFG
    )
    np.testing.assert_allclose(res.values, _pr_oracle(g, 0.85, 12), rtol=1e-10)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("directed", [True, False])
def test_fuzz_lcc(seed, directed):
    g = _random_graph(seed, directed, False)
    res = run_algorithm("lcc", g, AlgorithmParams(), CFG)
    np.testing.assert_allclose(res.values, _lcc_oracle(g), rtol=1e-12)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("directed", [True, False])
def test_fuzz_cdlp(seed, directed):
    g = _random_graph(seed, directed, False, n=40, m=160)
    res = run_algorithm("cdlp", g, AlgorithmParams(max_iterations=5), CFG)
    ref = _cdlp_oracle(g, 5)
    np.testing.assert_array_equal(res.values, g.mapping[ref])
