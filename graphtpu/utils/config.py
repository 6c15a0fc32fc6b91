"""Typed configuration + Java-properties-compatible parsing.

The reference's config is a three-tier .properties tree (SURVEY.md §5.6):
benchmark selection (config-template/benchmark.properties, cdlp.properties),
per-graph dataset descriptors (example-data-sets/graphs/*.properties), and a
platform key (platform.graphblas.num-threads). This module parses the same
file format and materializes it into typed dataclasses; kernel-variant
selection (the reference's compile-time #define block, cdlp_kernel.cu:5-41)
becomes runtime fields on PlatformConfig.
"""

from __future__ import annotations

import dataclasses
import os
import re
from pathlib import Path
from typing import Dict, List, Optional


def parse_properties(path: str | os.PathLike) -> Dict[str, str]:
    """Parse a Java .properties file (key = value, # comments)."""
    props: Dict[str, str] = {}
    for raw in Path(path).read_text().splitlines():
        line = raw.strip()
        if not line or line.startswith("#") or line.startswith("!"):
            continue
        m = re.match(r"([^=:]+)[=:](.*)", line)
        if not m:
            continue
        props[m.group(1).strip()] = m.group(2).strip()
    return props


@dataclasses.dataclass
class AlgorithmParams:
    """Per-algorithm parameters, keys matching the dataset descriptors
    (e.g. graph.<name>.bfs.source-vertex — example-directed.properties)."""

    source_vertex: Optional[int] = None        # bfs., sssp.
    max_iterations: Optional[int] = None       # cdlp.
    damping_factor: Optional[float] = None     # pr.
    num_iterations: Optional[int] = None       # pr.
    weight_property: Optional[str] = None      # sssp. (must name "weight")


@dataclasses.dataclass
class GraphSpec:
    """One dataset descriptor (graph.<name>.* keys)."""

    name: str
    vertex_path: str
    edge_path: str
    directed: bool
    weighted: bool
    num_vertices: Optional[int] = None
    num_edges: Optional[int] = None
    algorithms: List[str] = dataclasses.field(default_factory=list)
    params: Dict[str, AlgorithmParams] = dataclasses.field(default_factory=dict)

    @classmethod
    def from_properties(cls, path: str | os.PathLike) -> "GraphSpec":
        path = Path(path)
        props = parse_properties(path)
        names = {k.split(".")[1] for k in props if k.startswith("graph.")}
        if len(names) != 1:
            raise ValueError(f"{path}: expected exactly one graph, found {names}")
        name = names.pop()
        p = f"graph.{name}."

        def get(key, default=None):
            return props.get(p + key, default)

        edge_prop_names = [
            s.strip() for s in get("edge-properties.names", "").split(",") if s.strip()
        ]
        weighted = "weight" in edge_prop_names
        algos = [a.strip().lower() for a in get("algorithms", "").split(",") if a.strip()]

        params: Dict[str, AlgorithmParams] = {}
        for algo in algos:
            ap = AlgorithmParams()
            if get(f"{algo}.source-vertex") is not None:
                ap.source_vertex = int(get(f"{algo}.source-vertex"))
            if get(f"{algo}.max-iterations") is not None:
                ap.max_iterations = int(get(f"{algo}.max-iterations"))
            if get(f"{algo}.damping-factor") is not None:
                ap.damping_factor = float(get(f"{algo}.damping-factor"))
            if get(f"{algo}.num-iterations") is not None:
                ap.num_iterations = int(get(f"{algo}.num-iterations"))
            if get(f"{algo}.weight-property") is not None:
                ap.weight_property = get(f"{algo}.weight-property")
            params[algo] = ap

        base = path.parent
        vertex_file = get("vertex-file", f"{name}.v")
        edge_file = get("edge-file", f"{name}.e")
        if edge_file == vertex_file:
            # tolerate descriptor typos (the reference's
            # test-sssp-undirected.properties points edge-file at the .v file)
            edge_file = f"{name}.e"
        return cls(
            name=name,
            vertex_path=str(base / vertex_file),
            edge_path=str(base / edge_file),
            directed=get("directed", "false").lower() == "true",
            weighted=weighted,
            num_vertices=int(get("meta.vertices")) if get("meta.vertices") else None,
            num_edges=int(get("meta.edges")) if get("meta.edges") else None,
            algorithms=algos,
            params=params,
        )


@dataclasses.dataclass
class PlatformConfig:
    """Platform tier — the analogue of platform.properties plus the GPU
    kernel-variant #define block (cdlp_kernel.cu:5-41) as runtime config."""

    intermediate_dir: str = "./intermediate"
    # compute precision for float-valued algorithms ("float32"|"float64")
    precision: str = "float32"
    # kernel variant selection for the pull reduction: "scan" (packed-scan
    # segment reductions — fastest on TPU), "xla" (segment ops), or "slab"
    # (padded-ELL dense reductions; PR only for now)
    spmv_impl: str = "scan"
    # PageRank pull-sum implementation: "auto"/"slab" = padded-ELL dense
    # row sums (measured ~3x the scan path on v5e), "scan" = packed-scan
    # segment reduce over the COO stream
    pr_impl: str = "auto"     # auto|slab|scan
    cdlp_impl: str = "auto"   # auto|adaptive|adaptive-host|slab|sort
    # switch CDLP to compacted active-set steps once the rows adjacent to
    # a changed vertex cover less than this fraction of the incidence
    # (adaptive-host impl; graphtpu/ops/active.py)
    cdlp_active_threshold: float = 0.10
    # static frontier capacities of the single-dispatch adaptive kernel
    # (auto/adaptive impl): active-set steps run only while the active
    # rows/edges fit these buffers, else full slab steps. Keep these
    # SMALL: static shapes mean every active iteration pays the full
    # capacity-sized cost, so big caps make the near-converged tail
    # expensive (2^23 edges measured 310 ms/iter vs ~20 ms at 2^18).
    cdlp_frontier_rows: int = 1 << 16
    cdlp_frontier_edges: int = 1 << 18
    # explicit active-tier edge budgets for the tiered CDLP kernel
    # (comma list); empty = the single cdlp-frontier tier — a 4x
    # escalating ladder measured SLOWER at s20/ef32 (ops/active.py
    # cdlp_tiers has the analysis)
    cdlp_tiers: str = ""
    bfs_impl: str = "auto"    # auto|adaptive|hybrid|device; dense (distributed only)
    # run BFS levels whose frontier touches less than this fraction of the
    # edges as host expansions instead of dense device steps (hybrid impl)
    bfs_active_threshold: float = 0.05
    # static frontier capacities of the single-dispatch adaptive BFS
    bfs_frontier_rows: int = 0   # 0 = row budgets match edge budgets (phase
    #                              choice belongs to edge counts; round-3 replay)
    bfs_frontier_edges: int = 0  # 0 = auto: single-chip 2^22 (top push tier
    #                              ~ Beamer's m/alpha switch), distributed 2^18
    #                              (per-device expansion budget)
    bfs_push_tiers: str = ""     # explicit ascending edge-capacity ladder
    #                              (CSV); default: 2^16, 2^19, bfs-frontier-edges
    bfs_trunc: int = 0           # 0 = BFS_TRUNC (4) bottom-up probe depth
    bfs_step_mode: str = ""      # ""/phases = nested-phase while_loops
    #                              (default); switch = lax.switch body — a
    #                              measured TPU compile-time blow-up
    #                              (>10 min at s10; algorithms/bfs.py)
    lcc_impl: str = "auto"    # auto|oriented|sweep
    sssp_impl: str = "auto"   # auto|adaptive|hybrid|delta|device; dense (distributed only)
    sssp_delta: float = 2.5   # delta-stepping bucket width (sssp.cpp:70-78)
    sssp_active_threshold: float = 0.05
    sssp_frontier_rows: int = 1 << 16
    sssp_frontier_edges: int = 1 << 18
    # explicit frontier-tier edge budgets for the tiered SSSP kernel
    # (comma list); empty = (e/8, e) ladder — the small tier measured
    # 2.5x on thin high-diameter wavefronts (algorithms/sssp.py
    # sssp_tiers)
    sssp_tiers: str = ""
    # auto = slab (adaptive with slab-plan full steps, measured 1.64x
    # the edge-stream variant at s20/ef32); adaptive = edge-stream full
    # steps; device = dense while_loop; dense (distributed only)
    wcc_impl: str = "auto"    # auto|slab|adaptive|device
    wcc_frontier_rows: int = 1 << 16
    wcc_frontier_edges: int = 1 << 18
    # slab (padded-ELL) degree bucket boundaries for CDLP/LCC kernels;
    # None/empty = library default (graphtpu/ops/slab.py DEFAULT_BUCKETS)
    slab_buckets: Optional[tuple] = None
    # truncated bottom-up residual capacities (0 = kernel defaults):
    # rows/edges the full in-edge recheck may touch before the dense
    # fallback takes the level
    bfs_bu_rows: int = 0
    bfs_bu_edges: int = 0
    # device mesh axis size for row-partitioned multi-chip execution (0 = all)
    num_devices: int = 0
    # persist/restore the sharded pull partition under
    # intermediate/<graph>/shards-<D>/ (skip-if-exists, like the ingest
    # cache) so repeat distributed runs skip repartitioning
    shard_checkpoints: bool = True
    # assume not-converged for the first k CDLP iterations (sort impl) —
    # the reference's optimized_skip_checkequal (cdlp_kernel.cu:1254-1271)
    skip_convergence_checks: int = 0
    # write a jax.profiler trace of each processing window here
    # (TPU analogue of the reference's nested scoped timers + CUDA events)
    profile_dir: Optional[str] = None
    # per-iteration device timing: print "[TPU][TIMER] <algo> iter k took Xms"
    # lines (analogue of common/utils.hpp:344-382's CUDA-event queue)
    iteration_timing: bool = False
    # failure-detection test hook: "hang:<algo>" makes that algorithm job
    # block forever, to exercise timeout/kill paths (the reference has no
    # fault injection — SURVEY.md §5.3; this is the TPU build's addition)
    fault_injection: Optional[str] = None

    @classmethod
    def from_properties(cls, path: str | os.PathLike) -> "PlatformConfig":
        props = parse_properties(path)
        cfg = cls()
        for key, (attr, cast) in _PLATFORM_PROPS.items():
            if key in props:
                setattr(cfg, attr, cast(props[key]))
        return cfg

    def to_properties(self, path: str | os.PathLike) -> None:
        """Serialize to a platform.properties file (the inverse of
        from_properties) — used to forward the full platform config to
        subprocess-isolated jobs."""
        defaults = PlatformConfig()
        lines = []
        for key, (attr, _cast) in _PLATFORM_PROPS.items():
            v = getattr(self, attr)
            if v is None or v == getattr(defaults, attr):
                continue
            if isinstance(v, (tuple, list)):
                # inverse of the comma-list parser — a tuple repr like
                # "(4, 8)" would crash the child's int() parse
                v = ",".join(str(int(x)) for x in v)
            lines.append(f"{key} = {v}")
        Path(path).write_text("\n".join(lines) + "\n")


_PLATFORM_PROPS = {
    "platform.graphtpu.intermediate-dir": ("intermediate_dir", str),
    "platform.graphtpu.precision": ("precision", str),
    "platform.graphtpu.spmv-impl": ("spmv_impl", str),
    "platform.graphtpu.pr-impl": ("pr_impl", str),
    "platform.graphtpu.cdlp-impl": ("cdlp_impl", str),
    "platform.graphtpu.cdlp-active-threshold": ("cdlp_active_threshold", float),
    "platform.graphtpu.cdlp-frontier-rows": ("cdlp_frontier_rows", int),
    "platform.graphtpu.cdlp-frontier-edges": ("cdlp_frontier_edges", int),
    "platform.graphtpu.cdlp-tiers": ("cdlp_tiers", str),
    "platform.graphtpu.sssp-tiers": ("sssp_tiers", str),
    "platform.graphtpu.bfs-impl": ("bfs_impl", str),
    "platform.graphtpu.bfs-active-threshold": ("bfs_active_threshold", float),
    "platform.graphtpu.bfs-frontier-rows": ("bfs_frontier_rows", int),
    "platform.graphtpu.bfs-frontier-edges": ("bfs_frontier_edges", int),
    "platform.graphtpu.bfs-bu-rows": ("bfs_bu_rows", int),
    "platform.graphtpu.bfs-bu-edges": ("bfs_bu_edges", int),
    "platform.graphtpu.bfs-push-tiers": ("bfs_push_tiers", str),
    "platform.graphtpu.bfs-step-mode": ("bfs_step_mode", str),
    "platform.graphtpu.bfs-trunc": ("bfs_trunc", int),
    "platform.graphtpu.lcc-impl": ("lcc_impl", str),
    "platform.graphtpu.sssp-impl": ("sssp_impl", str),
    "platform.graphtpu.sssp-delta": ("sssp_delta", float),
    "platform.graphtpu.sssp-active-threshold": ("sssp_active_threshold", float),
    "platform.graphtpu.sssp-frontier-rows": ("sssp_frontier_rows", int),
    "platform.graphtpu.sssp-frontier-edges": ("sssp_frontier_edges", int),
    "platform.graphtpu.iteration-timing": (
        "iteration_timing",
        lambda v: str(v).strip().lower() in ("1", "true", "yes"),
    ),
    "platform.graphtpu.slab-buckets": (
        "slab_buckets",
        lambda v: tuple(int(x) for x in str(v).split(",") if x.strip()),
    ),
    "platform.graphtpu.wcc-impl": ("wcc_impl", str),
    "platform.graphtpu.wcc-frontier-rows": ("wcc_frontier_rows", int),
    "platform.graphtpu.wcc-frontier-edges": ("wcc_frontier_edges", int),
    "platform.graphtpu.num-devices": ("num_devices", int),
    "platform.graphtpu.shard-checkpoints": (
        "shard_checkpoints",
        lambda v: str(v).lower() == "true",
    ),
    "platform.graphtpu.skip-convergence-checks": ("skip_convergence_checks", int),
    "platform.graphtpu.profile-dir": ("profile_dir", str),
    "platform.graphtpu.fault-injection": ("fault_injection", str),
}


@dataclasses.dataclass
class BenchmarkConfig:
    """Benchmark tier — mirrors benchmark.custom.* keys
    (config-template/cdlp.properties:8-23)."""

    graphs: List[str] = dataclasses.field(default_factory=list)
    algorithms: List[str] = dataclasses.field(default_factory=list)
    timeout_seconds: int = 3600
    output_required: bool = True
    validation_required: bool = True
    repetitions: int = 1
    # "subprocess" (default): each job runs as a killable child process
    #   with its pid written to <log>/executable.pid, and is SIGKILLed at
    #   the timeout — the reference harness's contract
    #   (execute-job.sh:150). This is the only mode whose timeout can
    #   interrupt a wedged single-dispatch device kernel, so it is the
    #   default; multi-host runs fall back to inprocess automatically
    #   (collective jobs must run in the ranked processes themselves).
    # "inprocess": jobs run in the suite process (fast — graph/device state
    #   is reused across repetitions; timeout is best-effort SIGALRM).
    job_isolation: str = "subprocess"
    graphs_root: str = "."
    output_dir: str = "./output"
    validation_dir: Optional[str] = None
    report_dir: str = "./report"

    @classmethod
    def from_properties(cls, path: str | os.PathLike) -> "BenchmarkConfig":
        props = parse_properties(path)
        cfg = cls()

        def split(v):
            return [s.strip() for s in v.split(",") if s.strip()]

        if "benchmark.custom.graphs" in props:
            cfg.graphs = split(props["benchmark.custom.graphs"])
        if "benchmark.custom.algorithms" in props:
            cfg.algorithms = [a.lower() for a in split(props["benchmark.custom.algorithms"])]
        if "benchmark.custom.timeout" in props:
            cfg.timeout_seconds = int(props["benchmark.custom.timeout"])
        if "benchmark.custom.output-required" in props:
            cfg.output_required = props["benchmark.custom.output-required"].lower() == "true"
        if "benchmark.custom.validation-required" in props:
            cfg.validation_required = (
                props["benchmark.custom.validation-required"].lower() == "true"
            )
        if "benchmark.custom.repetitions" in props:
            cfg.repetitions = int(props["benchmark.custom.repetitions"])
        if "benchmark.custom.job-isolation" in props:
            v = props["benchmark.custom.job-isolation"].lower()
            if v not in ("inprocess", "subprocess"):
                raise ValueError(f"benchmark.custom.job-isolation: unknown mode {v!r}")
            cfg.job_isolation = v
        # dataset paths resolve relative to the properties file itself (not
        # the process cwd) so a checked-in config can name the vendored
        # fixtures portably; absolute paths pass through unchanged
        base = os.path.dirname(os.path.abspath(path))
        if "graphs.root-directory" in props:
            cfg.graphs_root = os.path.normpath(
                os.path.join(base, props["graphs.root-directory"])
            )
        if "graphs.validation-directory" in props:
            cfg.validation_dir = os.path.normpath(
                os.path.join(base, props["graphs.validation-directory"])
            )
        if "benchmark.output-directory" in props:
            cfg.output_dir = props["benchmark.output-directory"]
        if "benchmark.report-directory" in props:
            cfg.report_dir = props["benchmark.report-directory"]
        return cfg
