"""table_gather (row-gather + one-hot select) vs plain indexing."""

import numpy as np
import jax.numpy as jnp
import pytest

from graphtpu.ops.gather import table_gather


@pytest.mark.parametrize("n", [5, 8, 1000, 4096])
@pytest.mark.parametrize("dtype", ["float32", "int32", "float64"])
def test_table_gather_matches_indexing(n, dtype):
    rng = np.random.default_rng(0)
    if dtype == "int32":
        x = rng.integers(-(10**9), 10**9, n).astype(np.int32)
    else:
        x = (rng.random(n) * 100 - 50).astype(dtype)
    idx = rng.integers(0, n, 10_000).astype(np.int32)
    out = table_gather(jnp.asarray(x), jnp.asarray(idx))
    assert out.dtype == jnp.asarray(x).dtype
    got = np.asarray(out)
    np.testing.assert_array_equal(got, x[idx])


def test_table_gather_2d_indices():
    rng = np.random.default_rng(1)
    x = rng.random(777).astype(np.float32)
    idx = rng.integers(0, 777, (50, 33)).astype(np.int32)
    got = np.asarray(table_gather(jnp.asarray(x), jnp.asarray(idx)))
    np.testing.assert_array_equal(got, x[idx])
