"""Ingest tests: parsers (native C++ vs pandas/numpy parity), relabeling
semantics, and the binary cache's skip-if-exists contract."""

from pathlib import Path

import numpy as np
import pytest

from graphtpu.core.graph import Graph
from graphtpu.ingest import cache as cache_mod
from graphtpu.ingest import native
from graphtpu.ingest.loader import load_graph
from graphtpu.ingest.relabel import (
    _parse_edges_numpy,
    _parse_edges_pandas,
    _parse_vertices_numpy,
    _parse_vertices_pandas,
    relabel,
)

from conftest import FIXTURES


@pytest.fixture(scope="module")
def big_files(tmp_path_factory):
    """A synthetic ~200k-line vertex/edge pair with awkward formatting."""
    d = tmp_path_factory.mktemp("bigio")
    rng = np.random.default_rng(0)
    ids = np.sort(rng.choice(10_000_000, size=50_000, replace=False)).astype(np.int64)
    vpath = d / "big.v"
    with open(vpath, "w") as f:
        for i, v in enumerate(ids):
            f.write(f"{v}\n" if i % 7 else f"  {v}  \n")  # stray whitespace
        f.write("\n")  # trailing blank line
    src = rng.choice(ids, 200_000)
    dst = rng.choice(ids, 200_000)
    w = rng.random(200_000) * 10
    epath = d / "big.e"
    with open(epath, "w") as f:
        for i in range(len(src)):
            sep = "\t" if i % 5 == 0 else " "
            f.write(f"{src[i]}{sep}{dst[i]}{sep}{w[i]:.6g}\n")
    return vpath, epath


@pytest.mark.skipif(not native.available(), reason="native lib not built (make -C native)")
def test_native_vertex_parity(big_files):
    vpath, _ = big_files
    np.testing.assert_array_equal(
        native.parse_vertices(str(vpath)), _parse_vertices_numpy(str(vpath))
    )


@pytest.mark.skipif(not native.available(), reason="native lib not built (make -C native)")
def test_native_edge_parity(big_files):
    _, epath = big_files
    s1, d1, w1 = native.parse_edges(str(epath), True)
    s2, d2, w2 = _parse_edges_pandas(str(epath), True)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_allclose(w1, w2)
    # unweighted read of the same file ignores the third column
    s3, d3, w3 = native.parse_edges(str(epath), False)
    np.testing.assert_array_equal(s3, s2)
    assert w3 is None


@pytest.mark.skipif(not native.available(), reason="native lib not built (make -C native)")
def test_native_fixture_parity():
    for name, weighted in [("example-directed", True), ("example-undirected", True)]:
        v1 = native.parse_vertices(str(FIXTURES / f"{name}.v"))
        v2 = _parse_vertices_pandas(str(FIXTURES / f"{name}.v"))
        np.testing.assert_array_equal(v1, v2)
        s1, d1, w1 = native.parse_edges(str(FIXTURES / f"{name}.e"), weighted)
        s2, d2, w2 = _parse_edges_pandas(str(FIXTURES / f"{name}.e"), weighted)
        np.testing.assert_array_equal(s1, s2)
        np.testing.assert_array_equal(d1, d2)
        np.testing.assert_allclose(w1, w2)


@pytest.mark.skipif(not native.available(), reason="native lib not built (make -C native)")
def test_native_error_paths(tmp_path):
    assert native._load().gtio_count_lines(b"/nonexistent/file") == -1
    bad = tmp_path / "bad.v"
    bad.write_text("12\nnot-a-number\n")
    with pytest.raises(ValueError):
        native.parse_vertices(str(bad))


def test_relabel_dense_ids():
    """Dense id = position in vertex file (relabel.py:37-45)."""
    g = relabel(
        str(FIXTURES / "example-directed.v"),
        str(FIXTURES / "example-directed.e"),
        directed=True,
        weighted=True,
    )
    assert g.n == 10
    np.testing.assert_array_equal(g.mapping, np.arange(1, 11))
    assert g.nnz == 17


def test_relabel_sparse_original_ids(tmp_path):
    (tmp_path / "s.v").write_text("100\n5\n99999999999\n")
    (tmp_path / "s.e").write_text("100 5\n5 99999999999\n")
    g = relabel(str(tmp_path / "s.v"), str(tmp_path / "s.e"), True, False)
    assert g.n == 3
    np.testing.assert_array_equal(g.mapping, [100, 5, 99999999999])
    # dense ids follow file order: 100->0, 5->1, big->2
    np.testing.assert_array_equal(g.src, [0, 1])
    np.testing.assert_array_equal(g.dst, [1, 2])


def test_relabel_unknown_vertex(tmp_path):
    (tmp_path / "u.v").write_text("1\n2\n")
    (tmp_path / "u.e").write_text("1 3\n")
    with pytest.raises(ValueError, match="unknown vertex"):
        relabel(str(tmp_path / "u.v"), str(tmp_path / "u.e"), True, False)


def test_relabel_duplicate_vertex(tmp_path):
    (tmp_path / "d.v").write_text("1\n1\n")
    (tmp_path / "d.e").write_text("1 1\n")
    with pytest.raises(ValueError, match="duplicate"):
        relabel(str(tmp_path / "d.v"), str(tmp_path / "d.e"), True, False)


def test_cache_roundtrip_and_skip(tmp_path):
    g = load_graph(
        str(FIXTURES / "example-directed.v"),
        str(FIXTURES / "example-directed.e"),
        directed=True,
        weighted=True,
        graph_name="exd",
        intermediate_dir=str(tmp_path),
    )
    p = cache_mod.cache_path(tmp_path, "exd")
    assert p.exists()
    mtime = p.stat().st_mtime_ns
    g2 = load_graph(
        str(FIXTURES / "example-directed.v"),
        str(FIXTURES / "example-directed.e"),
        directed=True,
        weighted=True,
        graph_name="exd",
        intermediate_dir=str(tmp_path),
    )
    assert p.stat().st_mtime_ns == mtime  # skip-if-exists (load-graph.sh:50-67)
    assert g2.n == g.n and g2.nnz == g.nnz
    np.testing.assert_array_equal(g2.src, g.src)
    np.testing.assert_array_equal(g2.dst, g.dst)
    np.testing.assert_array_equal(g2.mapping, g.mapping)
    np.testing.assert_allclose(g2.w, g.w)


def test_cache_load_sets_graph_name(tmp_path):
    """graph.name keys derived artifacts (the LCC oriented-edge cache);
    cache.load must restore it."""
    from graphtpu.ingest import cache as cache_mod
    from graphtpu.utils.synth import rmat_graph

    g = rmat_graph(5, 4, directed=False, seed=0)
    cache_mod.save(g, tmp_path, "namecheck")
    g2 = cache_mod.load(tmp_path, "namecheck")
    assert g2.name == "namecheck"


def test_empty_graph_accepted():
    from graphtpu.core.graph import Graph

    g = Graph.from_original_ids(
        np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64),
        None, directed=True, weighted=False,
    )
    assert g.n == 0 and g.nnz == 0


def test_undirected_conflicting_weights_rejected():
    from graphtpu.core.graph import Graph

    ids = np.array([1, 2], dtype=np.int64)
    with pytest.raises(ValueError, match="conflicting weights"):
        Graph.from_original_ids(
            ids, np.array([1, 2]), np.array([2, 1]),
            np.array([1.0, 2.0]), directed=False, weighted=True,
        )
    # consistent duplicates are fine
    g = Graph.from_original_ids(
        ids, np.array([1, 2]), np.array([2, 1]),
        np.array([3.0, 3.0]), directed=False, weighted=True,
    )
    assert g.nnz == 2


# ---------------------------------------------------------------- native sort


def _native_sort_ready():
    from graphtpu.ingest import native

    return native.relabel_available()


@pytest.mark.skipif(
    not _native_sort_ready(), reason="native library not built (make -C native)"
)
@pytest.mark.parametrize("directed", [True, False])
@pytest.mark.parametrize("weighted", [True, False])
def test_native_relabel_matches_numpy(directed, weighted, monkeypatch):
    """The fused native relabel (gtio_relabel_edges: hash join + doubling
    + radix sort + keep-first dedup) is byte-identical to the numpy path
    of Graph.from_original_ids across all four graph kinds, including
    duplicate edges and self-loops."""
    from graphtpu.core import graph as G

    rng = np.random.default_rng(7)
    n, m = 500, 4000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    src[m // 2 : m // 2 + 64] = src[:64]  # duplicate edges
    dst[m // 2 : m // 2 + 64] = dst[:64]
    dst[:16] = src[:16]  # self loops
    # pair-determined weights: never conflicting for the undirected check
    w = (
        np.minimum(src, dst) * 1.5 + np.maximum(src, dst) * 0.25 + 1.0
        if weighted
        else None
    )
    vids = np.arange(n, dtype=np.int64) * 5 + 11

    monkeypatch.setattr(G, "NATIVE_SORT_MIN", 1)
    g_nat = G.Graph.from_original_ids(vids, vids[src], vids[dst], w, directed, weighted)
    monkeypatch.setattr(G, "NATIVE_SORT_MIN", 1 << 62)
    g_np = G.Graph.from_original_ids(vids, vids[src], vids[dst], w, directed, weighted)
    np.testing.assert_array_equal(g_nat.src, g_np.src)
    np.testing.assert_array_equal(g_nat.dst, g_np.dst)
    np.testing.assert_array_equal(g_nat.w, g_np.w)
    np.testing.assert_array_equal(g_nat.mapping, g_np.mapping)


@pytest.mark.skipif(
    not _native_sort_ready(), reason="native library not built (make -C native)"
)
def test_native_relabel_error_paths(monkeypatch):
    """Native relabel raises the SAME ValueErrors as the numpy path —
    duplicate vertex ids, unknown edge ids, conflicting duplicate
    weights — instead of falling back."""
    from graphtpu.core import graph as G

    monkeypatch.setattr(G, "NATIVE_SORT_MIN", 1)
    vids = np.arange(100, dtype=np.int64)
    big = np.tile(np.arange(90, dtype=np.int64), 800)

    vids_dup = vids.copy()
    vids_dup[5] = vids_dup[4]
    with pytest.raises(ValueError, match="duplicate vertex ids"):
        G.Graph.from_original_ids(vids_dup, big, big, None, True, False)

    bad = big.copy()
    bad[7] = 555
    with pytest.raises(ValueError, match="unknown vertex id"):
        G.Graph.from_original_ids(vids, bad, big, None, True, False)

    s2 = np.array([1, 2] * 40000, dtype=np.int64)
    d2 = np.array([2, 1] * 40000, dtype=np.int64)
    wc = np.ones(80000)
    wc[1] = 5.0
    with pytest.raises(ValueError, match="conflicting weights"):
        G.Graph.from_original_ids(vids, s2, d2, wc, False, True)


@pytest.mark.skipif(
    not _native_sort_ready(), reason="native library not built (make -C native)"
)
def test_native_sort_edges_pull_order(monkeypatch):
    """pull_arrays on a directed graph routes through the native counting
    sort and matches the numpy lexsort permutation exactly."""
    from graphtpu.core import graph as G

    rng = np.random.default_rng(9)
    n, m = 400, 3000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.random(m)
    vids = np.arange(n, dtype=np.int64)
    monkeypatch.setattr(G, "NATIVE_SORT_MIN", 1)
    g_nat = G.Graph.from_original_ids(vids, src, dst, w, True, True)
    pn = g_nat.pull_arrays()
    monkeypatch.setattr(G, "NATIVE_SORT_MIN", 1 << 62)
    g_np = G.Graph.from_original_ids(vids, src, dst, w, True, True)
    ph = g_np.pull_arrays()
    for a, b in zip(pn, ph):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_sort_kernel_matches_numpy():
    """The opt-in device ingest sort kernel (_sort_kern — a measured
    negative result on THIS environment's 2.5 MB/s D2H relay, kept for
    direct-attached hardware) sorts and keep-first-dedups identically to
    the host path, on the CPU backend."""
    import jax.numpy as jnp

    from graphtpu.core import graph as G

    rng = np.random.default_rng(3)
    n, m = 200, 2000
    src = rng.integers(0, n, m).astype(np.int32)
    dst = rng.integers(0, n, m).astype(np.int32)
    s_s, d_s, pos, keep = G._device_sort_kernel(
        jnp.asarray(src), jnp.asarray(dst), True, True, True
    )
    s_s, d_s, pos, keep = (np.asarray(x) for x in (s_s, d_s, pos, keep))
    perm = G._lexsort_edges(src, dst, "src")
    np.testing.assert_array_equal(s_s, src[perm])
    np.testing.assert_array_equal(d_s, dst[perm])
    np.testing.assert_array_equal(pos, perm)
    ks, kd = s_s[keep], d_s[keep]
    first = np.ones(ks.shape[0], dtype=bool)
    assert not np.any((ks[1:] == ks[:-1]) & (kd[1:] == kd[:-1])), first
