"""Scan-based segment reductions vs jax.ops.segment_* oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphtpu.ops.scan_reduce import seg_max_scan, seg_min_scan, seg_sum_scan


def _random_segments(n, m, seed):
    rng = np.random.default_rng(seed)
    ids = np.sort(rng.integers(0, n, m)).astype(np.int32)
    deg = np.bincount(ids, minlength=n)
    indptr = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(deg, out=indptr[1:])
    return jnp.asarray(ids), jnp.asarray(indptr)


@pytest.mark.parametrize("seed", [0, 1])
def test_seg_sum(seed):
    n, m = 100, 5000
    ids, indptr = _random_segments(n, m, seed)
    vals = jnp.asarray(np.random.default_rng(seed).random(m).astype(np.float32))
    got = seg_sum_scan(vals, indptr)
    want = jax.ops.segment_sum(vals, ids, num_segments=n, indices_are_sorted=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


@pytest.mark.parametrize("dtype", ["int32", "float32"])
@pytest.mark.parametrize("negatives", [False, True])
def test_seg_max_min(dtype, negatives):
    n, m = 64, 3000
    ids, indptr = _random_segments(n, m, 7)
    rng = np.random.default_rng(7)
    if dtype == "int32":
        v = rng.integers(-1000 if negatives else 0, 1000, m).astype(np.int32)
        ident_max, ident_min = np.int32(np.iinfo(np.int32).min), np.int32(np.iinfo(np.int32).max)
    else:
        v = (rng.random(m).astype(np.float32) - (0.5 if negatives else 0.0)) * 100
        ident_max, ident_min = np.float32(-np.inf), np.float32(np.inf)
    vals = jnp.asarray(v)

    got = seg_max_scan(vals, ids, indptr, ident_max)
    want = jax.ops.segment_max(vals, ids, num_segments=n, indices_are_sorted=True)
    # segment_max gives identity for empty segments too
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    got = seg_min_scan(vals, ids, indptr, ident_min)
    want = jax.ops.segment_min(vals, ids, num_segments=n, indices_are_sorted=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_seg_min_with_inf():
    """SSSP case: +inf distances must round-trip the order packing."""
    ids = jnp.asarray(np.array([0, 0, 1, 2, 2], dtype=np.int32))
    indptr = jnp.asarray(np.array([0, 2, 3, 5, 5], dtype=np.int32))
    vals = jnp.asarray(np.array([np.inf, 3.0, np.inf, -np.inf, 2.0], dtype=np.float32))
    got = np.asarray(seg_min_scan(vals, ids, indptr, np.float32(np.inf)))
    np.testing.assert_array_equal(got, [3.0, np.inf, -np.inf, np.inf])


def test_seg_sum_long_stream_precision():
    """The two-level (f32 block / f64 offset) cumsum must keep segment sums
    accurate over streams far longer than one block."""
    n, m = 500, 1 << 20
    ids, indptr = _random_segments(n, m, 3)
    vals = jnp.asarray(
        (np.random.default_rng(3).random(m) * 2 - 0.5).astype(np.float32)
    )
    got = np.asarray(seg_sum_scan(vals, indptr))
    want = np.asarray(
        jax.ops.segment_sum(
            vals.astype(jnp.float64), ids, num_segments=n, indices_are_sorted=True
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)


def test_empty_segments_get_identity():
    ids = jnp.asarray(np.array([1, 1, 3], dtype=np.int32))
    indptr = jnp.asarray(np.array([0, 0, 2, 2, 3], dtype=np.int32))
    vals = jnp.asarray(np.array([5, 7, 9], dtype=np.int32))
    got = np.asarray(seg_max_scan(vals, ids, indptr, np.int32(-1)))
    np.testing.assert_array_equal(got, [-1, 7, -1, 9])
    s = np.asarray(seg_sum_scan(vals.astype(jnp.float32), indptr))
    np.testing.assert_allclose(s, [0, 12, 0, 9])
