"""Output validation against Graphalytics golden files.

Replicates the harness-side validation the reference enables with
benchmark.custom.validation-required = true (config-template/
cdlp.properties:21; SURVEY.md §3.5): per-vertex outputs are compared
against the reference result files shipped with each dataset
(e.g. example-data-sets/graphs/example-directed-BFS) under
per-algorithm match rules:

* BFS — exact integers (unreachable = int64 max, bfs.cpp:61);
* CDLP — exact integers (the min-mode tie-break makes labels
  deterministic, LAGraph_cdlp.c:36-45);
* WCC — equivalence-class match: the component *partition* must be
  identical, label values are arbitrary (wcc.cpp:31-33 writes raw matrix
  indices for exactly this reason);
* PR / LCC / SSSP — epsilon match on doubles (the graphalytics-core
  epsilon rule), with the literal "infinity" for unreachable SSSP
  (sssp.cpp:45).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from graphtpu.core.graph import Graph
from graphtpu.core.types import UNREACHABLE

EPSILON = 1e-4  # relative tolerance for float-valued algorithms


def parse_result_file(path: str) -> Dict[int, str]:
    out: Dict[int, str] = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            out[int(parts[0])] = parts[1] if len(parts) > 1 else ""
    return out


def _values_by_original_id(result, graph: Graph) -> Dict[int, object]:
    return {
        int(graph.mapping[i]): result.values[i] for i in range(graph.n)
    }


def _match_exact_int(mine: Dict[int, object], golden: Dict[int, str]):
    for vid, gval in golden.items():
        if vid not in mine:
            return False, f"vertex {vid} missing from output"
        if int(mine[vid]) != int(gval):
            return False, f"vertex {vid}: got {int(mine[vid])}, expected {gval}"
    return True, ""


def _match_epsilon(mine: Dict[int, object], golden: Dict[int, str]):
    for vid, gval in golden.items():
        if vid not in mine:
            return False, f"vertex {vid} missing from output"
        g = float("inf") if gval == "infinity" else float(gval)
        m = float(mine[vid])
        if np.isinf(g) or np.isinf(m):
            if np.isinf(g) != np.isinf(m):
                return False, f"vertex {vid}: got {m}, expected {gval}"
            continue
        tol = EPSILON * max(abs(g), 1e-30)
        if abs(m - g) > tol and abs(m - g) > 1e-12:
            return False, f"vertex {vid}: got {m:.17g}, expected {g:.17g}"
    return True, ""


def _match_equivalence(mine: Dict[int, object], golden: Dict[int, str]):
    fwd: Dict[int, int] = {}
    bwd: Dict[int, int] = {}
    for vid, gval in golden.items():
        if vid not in mine:
            return False, f"vertex {vid} missing from output"
        m, g = int(mine[vid]), int(gval)
        if fwd.setdefault(m, g) != g:
            return False, f"label {m} maps to both {fwd[m]} and {g}"
        if bwd.setdefault(g, m) != m:
            return False, f"golden label {g} maps to both {bwd[g]} and {m}"
    return True, ""


MATCHERS = {
    "bfs": _match_exact_int,
    "cdlp": _match_exact_int,
    "wcc": _match_equivalence,
    "pr": _match_epsilon,
    "lcc": _match_epsilon,
    "sssp": _match_epsilon,
}


def validate_result(result, graph: Graph, golden_path: str) -> Tuple[bool, str]:
    golden = parse_result_file(golden_path)
    mine = _values_by_original_id(result, graph)
    if len(golden) != len(mine):
        return False, f"vertex count mismatch: {len(mine)} vs {len(golden)}"
    ok, msg = MATCHERS[result.algorithm](mine, golden)
    return ok, (msg if not ok else "validated")


def validate_files(algorithm: str, output_path: str, golden_path: str) -> Tuple[bool, str]:
    """File-vs-file validation (used by the CLI `validate` command)."""
    golden = parse_result_file(golden_path)
    mine_raw = parse_result_file(output_path)
    if len(golden) != len(mine_raw):
        return False, f"vertex count mismatch: {len(mine_raw)} vs {len(golden)}"
    if algorithm in ("bfs", "cdlp"):
        mine = {k: int(v) for k, v in mine_raw.items()}
    elif algorithm == "wcc":
        mine = {k: int(v) for k, v in mine_raw.items()}
    else:
        mine = {
            k: (float("inf") if v == "infinity" else float(v))
            for k, v in mine_raw.items()
        }
    ok, msg = MATCHERS[algorithm](mine, golden)
    return ok, (msg if not ok else "validated")
