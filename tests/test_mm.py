"""MatrixMarket + vtx artifact roundtrip (format parity with relabel.py's
graph.mtx/graph.vtx outputs)."""

import numpy as np

from graphtpu.ingest.mm import read_mtx, read_vtx, write_mtx, write_vtx
from graphtpu.utils.synth import uniform_graph


def test_mtx_roundtrip_directed_weighted(tmp_path):
    g = uniform_graph(50, 300, directed=True, weighted=True, seed=0)
    p = tmp_path / "graph.mtx"
    write_mtx(g, p)
    head = p.read_text().splitlines()
    assert head[0] == "%%MatrixMarket matrix coordinate real general"
    assert head[1] == "%%GraphBLAS GrB_FP64"
    g2 = read_mtx(p)
    assert g2.n == g.n and g2.nnz == g.nnz and g2.directed and g2.weighted
    np.testing.assert_array_equal(g2.src, g.src)
    np.testing.assert_array_equal(g2.dst, g.dst)
    np.testing.assert_allclose(g2.w, g.w)


def test_mtx_roundtrip_undirected(tmp_path):
    g = uniform_graph(40, 200, directed=False, seed=1)
    p = tmp_path / "graph.mtx"
    write_mtx(g, p)
    head = p.read_text().splitlines()
    assert head[0] == "%%MatrixMarket matrix coordinate integer symmetric"
    g2 = read_mtx(p)
    assert g2.n == g.n and not g2.directed
    np.testing.assert_array_equal(g2.src, g.src)
    np.testing.assert_array_equal(g2.dst, g.dst)


def test_vtx_roundtrip(tmp_path):
    g = uniform_graph(30, 100, directed=True, seed=2)
    g.mapping = np.arange(30, dtype=np.int64) * 7 + 3
    p = tmp_path / "graph.vtx"
    write_vtx(g, p)
    np.testing.assert_array_equal(read_vtx(p), g.mapping)
