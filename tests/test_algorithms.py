"""Golden-file tests: every algorithm on every shipped micro-fixture.

The reference has no unit tests of its own; its correctness mechanism is
end-to-end validation against golden outputs shipped with the datasets
(SURVEY.md §4). We turn exactly those fixtures into unit tests: the
test-<algo>-{directed,undirected} micro-graphs plus the two example
graphs, validated with the per-algorithm match rules (exact for BFS,
exact for CDLP, equivalence-class for WCC, epsilon for PR/LCC/SSSP).
"""

from pathlib import Path

import numpy as np
import pytest

from graphtpu.algorithms.common import run_algorithm
from graphtpu.harness.validator import validate_result
from graphtpu.ingest.loader import load_graph_from_spec
from graphtpu.utils.config import GraphSpec, PlatformConfig

from conftest import FIXTURES

ALGO_SUFFIX = {
    "bfs": "BFS",
    "pr": "PR",
    "wcc": "WCC",
    "cdlp": "CDLP",
    "lcc": "LCC",
    "sssp": "SSSP",
}


def _collect_cases():
    cases = []
    for props in sorted(FIXTURES.glob("*.properties")):
        spec = GraphSpec.from_properties(props)
        for algo in spec.algorithms:
            golden = FIXTURES / f"{spec.name}-{ALGO_SUFFIX[algo]}"
            if golden.exists():
                cases.append((spec.name, algo))
    return cases


CASES = _collect_cases()


@pytest.fixture(scope="module")
def graphs():
    cache = {}

    def get(name):
        if name not in cache:
            spec = GraphSpec.from_properties(FIXTURES / f"{name}.properties")
            cache[name] = (spec, load_graph_from_spec(spec, use_cache=False))
        return cache[name]

    return get


def test_fixtures_found():
    # 2 example graphs × 6 algorithms + 12 per-algorithm micro-graphs
    assert len(CASES) >= 24


@pytest.mark.parametrize("graph_name,algo", CASES, ids=[f"{g}-{a}" for g, a in CASES])
def test_algorithm_matches_golden(graphs, graph_name, algo):
    spec, graph = graphs(graph_name)
    cfg = PlatformConfig(precision="float64")
    result = run_algorithm(algo, graph, spec.params.get(algo), cfg)
    golden = FIXTURES / f"{spec.name}-{ALGO_SUFFIX[algo]}"
    ok, msg = validate_result(result, graph, str(golden))
    assert ok, msg


@pytest.mark.parametrize("graph_name", ["example-directed", "example-undirected"])
def test_cdlp_sort_impl_matches_golden(graphs, graph_name):
    spec, graph = graphs(graph_name)
    cfg = PlatformConfig(precision="float64", cdlp_impl="sort")
    result = run_algorithm("cdlp", graph, spec.params.get("cdlp"), cfg)
    golden = FIXTURES / f"{spec.name}-CDLP"
    ok, msg = validate_result(result, graph, str(golden))
    assert ok, msg


def test_cdlp_edgeless_graph():
    """Zero-edge graph: every vertex is its own community (the kernels'
    length-0 incidence streams must not reach trace-time shape checks)."""
    from graphtpu.core.graph import Graph
    from graphtpu.utils.config import AlgorithmParams

    ids = np.array([7, 3, 11], dtype=np.int64)
    g = Graph.from_original_ids(
        ids, np.empty(0, np.int64), np.empty(0, np.int64), None,
        directed=True, weighted=False,
    )
    res = run_algorithm("cdlp", g, AlgorithmParams(max_iterations=5), PlatformConfig())
    # values are original-id labels in dense order: each vertex itself
    np.testing.assert_array_equal(res.values, ids)
