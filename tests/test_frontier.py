"""Device frontier engine (graphtpu/ops/frontier.py) unit tests."""

import numpy as np
import jax.numpy as jnp

from graphtpu.ops.frontier import compact, expand, scatter_frontier


def _csr(n, edges):
    edges = sorted(edges)
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    deg = np.bincount(src, minlength=n)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(deg, out=indptr[1:])
    deg_pad = np.concatenate([deg, [0]]).astype(np.int32)
    return (
        jnp.asarray(deg_pad),
        jnp.asarray(indptr.astype(np.int32)),
        jnp.asarray(dst.astype(np.int32)),
    )


def test_compact_and_expand_roundtrip():
    n = 10
    edges = [(0, 3), (0, 7), (2, 1), (2, 4), (2, 9), (7, 0)]
    deg_pad, indptr, neigh = _csr(n, edges)
    mask = np.zeros(n, dtype=bool)
    mask[[0, 2, 5, 7]] = True  # 5 has no out-edges
    k, e_cap = 8, 16
    ids, cnt = compact(jnp.asarray(mask), k)
    assert int(cnt) == 4
    exp = expand(ids, deg_pad, indptr, neigh, e_cap)
    assert int(exp.edge_count) == 6
    got = np.asarray(exp.neigh)[np.asarray(exp.valid)]
    np.testing.assert_array_equal(got, [3, 7, 1, 4, 9, 0])
    # rows_local maps each edge slot to its frontier slot
    rows = np.asarray(exp.rows_local)[np.asarray(exp.valid)]
    np.testing.assert_array_equal(rows, [0, 0, 1, 1, 1, 3])


def test_expand_empty_rows_between():
    n = 6
    edges = [(1, 0), (4, 2), (4, 5)]
    deg_pad, indptr, neigh = _csr(n, edges)
    # frontier (0, 1, 2, 4): rows 0 and 2 are empty
    ids = jnp.asarray(np.array([0, 1, 2, 4, n, n], dtype=np.int32))
    exp = expand(ids, deg_pad, indptr, neigh, 8)
    got = np.asarray(exp.neigh)[np.asarray(exp.valid)]
    np.testing.assert_array_equal(got, [0, 2, 5])
    rows = np.asarray(exp.rows_local)[np.asarray(exp.valid)]
    np.testing.assert_array_equal(rows, [1, 3, 3])


def test_expand_empty_frontier():
    n = 4
    deg_pad, indptr, neigh = _csr(n, [(0, 1)])
    ids = jnp.full((4,), n, dtype=jnp.int32)
    exp = expand(ids, deg_pad, indptr, neigh, 8)
    assert int(exp.edge_count) == 0
    assert not np.asarray(exp.valid).any()


def test_scatter_frontier_drops_masked():
    neigh = jnp.asarray(np.array([1, 3, 3, 2], dtype=np.int32))
    active = jnp.asarray(np.array([True, True, False, True]))
    mask = np.asarray(scatter_frontier(5, neigh, active))
    np.testing.assert_array_equal(mask, [False, True, True, True, False])


def test_compact_stream_dedupes_and_pads():
    from graphtpu.ops.frontier import compact_stream

    n = 10
    vals = jnp.asarray(np.array([7, 2, 7, 2, 9, 0, 4], dtype=np.int32))
    active = jnp.asarray(np.array([True, True, True, False, True, False, True]))
    ids, cnt = compact_stream(vals, active, 8, n)
    assert int(cnt) == 4
    np.testing.assert_array_equal(np.asarray(ids), [2, 4, 7, 9, n, n, n, n])
    # truncation: count reports the true number even when K is too small
    ids2, cnt2 = compact_stream(vals, active, 2, n)
    assert int(cnt2) == 4
    np.testing.assert_array_equal(np.asarray(ids2), [2, 4])
    # capacity larger than the stream pads with n
    ids3, cnt3 = compact_stream(vals[:2], active[:2], 5, n)
    assert int(cnt3) == 2
    np.testing.assert_array_equal(np.asarray(ids3), [2, 7, n, n, n])
