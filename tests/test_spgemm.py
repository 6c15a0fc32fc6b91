"""Masked SpGEMM / SpMM / vector assign-extract vs dense numpy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from graphtpu.core.semiring import MIN_PLUS, PLUS_PAIR, PLUS_TIMES
from graphtpu.core.spgemm import CSR, masked_spgemm, spmm
from graphtpu.core.spops import assign, extract, reduce_vector
from graphtpu.core import semiring as sr
from graphtpu.utils.synth import uniform_graph


def _dense(graph, n):
    d = np.zeros((n, n))
    d[graph.src, graph.dst] = graph.w
    return d


@pytest.mark.parametrize("semiring,combine,mul", [
    (PLUS_TIMES, "sum", lambda a, b: a * b),
    (MIN_PLUS, "min", lambda a, b: a + b),
    (PLUS_PAIR, "sum", None),
])
def test_masked_spgemm_vs_dense(semiring, combine, mul):
    n = 60
    a_g = uniform_graph(n, 500, directed=True, weighted=True, seed=1)
    b_g = uniform_graph(n, 500, directed=True, weighted=True, seed=2)
    m_g = uniform_graph(n, 300, directed=True, seed=3)
    A, B = _dense(a_g, n), _dense(b_g, n)

    a = CSR.from_graph(a_g, np.float64)
    b = CSR.from_graph(b_g, np.float64)
    got = np.asarray(
        masked_spgemm(
            semiring, a, b, m_g.src, m_g.dst, a_indptr_host=a_g.indptr
        )
    )

    for e, (i, j) in enumerate(zip(m_g.src, m_g.dst)):
        ks = np.nonzero((A[i] != 0))[0]
        ks = ks[B[ks, j] != 0]
        if semiring is PLUS_PAIR:
            want = float(len(ks))
        elif ks.size == 0:
            want = 0.0 if combine == "sum" else np.inf
        else:
            terms = [mul(A[i, k], B[k, j]) for k in ks]
            want = sum(terms) if combine == "sum" else min(terms)
        if np.isinf(want):
            assert np.isinf(got[e]), (i, j)
        else:
            np.testing.assert_allclose(got[e], want, rtol=1e-9, err_msg=f"{(i, j)}")


def test_spmm_vs_dense():
    n = 50
    g = uniform_graph(n, 400, directed=True, weighted=True, seed=4)
    from graphtpu.ops.spmv import build_pull_plan

    plan = build_pull_plan(g, wdtype=np.float64)
    x = np.random.default_rng(0).random((n, 4))
    got = np.asarray(spmm(PLUS_TIMES, plan, jnp.asarray(x), n))
    want = _dense(g, n).T @ x  # pull: y[v] = sum_u w_uv x[u]
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_assign_extract_reduce():
    v = jnp.asarray(np.arange(10, dtype=np.float32))
    idx = jnp.asarray(np.array([2, 5, 7], dtype=np.int32))
    out = assign(v, idx, jnp.asarray(np.array([20.0, 50.0, 70.0], dtype=np.float32)))
    np.testing.assert_array_equal(np.asarray(out)[[2, 5, 7]], [20, 50, 70])
    masked = assign(
        v, idx, jnp.asarray(np.array([20.0, 50.0, 70.0], dtype=np.float32)),
        mask=jnp.asarray(np.array([True, False, True])),
    )
    np.testing.assert_array_equal(np.asarray(masked)[[2, 5, 7]], [20, 5, 70])
    np.testing.assert_array_equal(np.asarray(extract(v, idx)), [2, 5, 7])
    assert float(reduce_vector(sr.PLUS, v)) == 45.0
    assert float(reduce_vector(sr.MIN, v)) == 0.0


def test_any_secondi_bfs_parents():
    """any.secondi over pull edges yields the smallest-id reached parent."""
    from graphtpu.core.spops import spmv

    g = uniform_graph(40, 200, directed=True, seed=9)
    coo = g.device_pull()
    frontier = np.zeros(40, np.int32)
    frontier[[3, 7]] = 1
    INF = np.iinfo(np.int32).max
    want = np.full(40, INF, dtype=np.int64)
    for s, d in zip(np.asarray(coo.src), np.asarray(coo.dst)):
        if frontier[s]:
            want[d] = min(want[d], s)
    # x carries each vertex's own index where it is in the frontier
    x_idx = jnp.where(
        jnp.asarray(frontier) == 1, jnp.arange(40, dtype=jnp.int32), INF
    )
    got = np.asarray(spmv(sr.ANY_SECONDI, coo.src, coo.dst, coo.w, x_idx, 40))
    np.testing.assert_array_equal(got, want)
