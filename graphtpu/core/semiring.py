"""Semiring algebra for sparse ops, designed for XLA segment reductions.

The reference dispatches GraphBLAS semirings (GrB_MIN_SECOND_SEMIRING_UINT64
in LAGraph_cdlp.c:272, min.plus inside LAGr_SingleSourceShortestPath,
plus.second inside LAGr_PageRankGX, LOR.LAND reachability inside
LAGr_BreadthFirstSearch). Here a semiring is a (monoid, binary-op) pair whose
reduction maps onto `jax.ops.segment_*` — the TPU-native formulation: edges
are a flat COO stream sorted by the reduction key, the multiply is a fused
elementwise op on gathered operands, and the add-reduction is a single
segment reduce that XLA lowers to sorted scatter on TPU.

This is a from-scratch design (no GraphBLAS code reused); semantics follow
the GraphBLAS C API spec for the handful of semirings Graphalytics needs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Monoid:
    """Commutative associative reduction with identity."""

    name: str
    segment_reduce: Callable[..., jax.Array]
    combine: Callable[[jax.Array, jax.Array], jax.Array]
    identity: Callable[[Any], Any]  # dtype -> identity scalar


def _ident_zero(dtype):
    return jnp.zeros((), dtype=dtype)


def _ident_max(dtype):
    d = jnp.dtype(dtype)
    if jnp.issubdtype(d, jnp.floating):
        return jnp.array(jnp.inf, dtype=d)
    return jnp.array(jnp.iinfo(d).max, dtype=d)


def _ident_min(dtype):
    d = jnp.dtype(dtype)
    if jnp.issubdtype(d, jnp.floating):
        return jnp.array(-jnp.inf, dtype=d)
    return jnp.array(jnp.iinfo(d).min, dtype=d)


PLUS = Monoid("plus", jax.ops.segment_sum, jnp.add, _ident_zero)
MIN = Monoid("min", jax.ops.segment_min, jnp.minimum, _ident_max)
MAX = Monoid("max", jax.ops.segment_max, jnp.maximum, _ident_min)
# Logical OR over {0,1} int/bool masks ≡ max.
LOR = Monoid("lor", jax.ops.segment_max, jnp.maximum, _ident_zero)


@dataclasses.dataclass(frozen=True)
class Semiring:
    """add.mul semiring. `mul(edge_val, x_src)` produces the per-edge term."""

    name: str
    add: Monoid
    mul: Callable[[jax.Array, jax.Array], jax.Array]


def _second(e, x):
    return x


def _first(e, x):
    return e


def _plus(e, x):
    return e + x


def _times(e, x):
    return e * x


def _land(e, x):
    # logical AND over {0,1} masks
    return e * x


def _secondi(e, x):
    """secondi: the *index* of the second operand (the source-vertex id in
    a pull SpMV). Callers pass the index array as x; used for BFS-parent
    style products (GxB_ANY_SECONDI in SuiteSparse terms, with the ANY
    monoid made deterministic as MIN)."""
    return x


# The semirings Graphalytics needs (SURVEY.md §7 core/):
MIN_SECOND = Semiring("min.second", MIN, _second)   # CDLP label propagation
MIN_PLUS = Semiring("min.plus", MIN, _plus)         # SSSP relaxation
PLUS_SECOND = Semiring("plus.second", PLUS, _second)  # PageRank pull
PLUS_TIMES = Semiring("plus.times", PLUS, _times)   # classic SpMV / counting
LOR_LAND = Semiring("lor.land", LOR, _land)         # BFS reachability
MIN_FIRST = Semiring("min.first", MIN, _first)
MAX_SECOND = Semiring("max.second", MAX, _second)
# deterministic ANY: smallest matching index wins (BFS parents)
ANY_SECONDI = Semiring("any.secondi", MIN, _secondi)
def _pair(e, x):
    """pair: 1 for every structurally present operand (triangle counting)."""
    return jnp.ones_like(x)


PLUS_PAIR = Semiring("plus.pair", PLUS, _pair)

BY_NAME = {
    s.name: s
    for s in [
        MIN_SECOND,
        MIN_PLUS,
        PLUS_SECOND,
        PLUS_TIMES,
        LOR_LAND,
        MIN_FIRST,
        MAX_SECOND,
        ANY_SECONDI,
        PLUS_PAIR,
    ]
}
