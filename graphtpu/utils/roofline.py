"""Speed-of-light accounting for the hot kernels (VERDICT r2 #3).

The north star requires every benchmarked kernel to report utilization
against its own roof. On this memory-bound workload the roof of every
kernel is set by a handful of primitive rates, measured on the real
v5e chip (RATES_TPU below is the single source of truth; the dict's
inline comments carry the measurement provenance — sort and scatter
were re-measured in round 3 after the round-1 figures proved to be
fused-context artifacts):

    table_gather        gather_ns   (W=128 row-gather + lane select; the
                                     dominating primitive of every
                                     message-passing iteration)
    packed-scan reduce  scan_ns     (ops/scan_reduce.py)
    sort                sort_ns
    scatter             scatter_ns
    LCC hash-row fetch  hashrow_ns
    dispatch+sync       dispatch_ms (axon relay round trip; excluded
                                     from single-dispatch kernels)

A kernel's roof is its unavoidable index-touch count times the gather
rate (plus scan volume where a segment reduce follows). `sol_pct` is
measured-roof ÷ measured-time: 100% means the kernel runs at the speed
the chip moves its indices; >100% means the roof model undercounts fused
work (report it, don't clamp). The reference analogue: the CUDA fork
quantified every kernel variant against its baseline (BASELINE.md rows
8-10, ECE508 report §5).

Rates are overridable for new hardware via GRAPHTPU_RATE_<NAME>
(e.g. GRAPHTPU_RATE_GATHER_NS=1.8).
"""

from __future__ import annotations

import os

# measured on TPU v5e through the axon relay, round 3
# (scripts/perf/scatter_bench.py + bfs_phases.py primitive section)
RATES_TPU = {
    "gather_ns": 2.4,  # round 4: the PR slab kernel sustains 2.43 ns/idx
    #                    end-to-end (106.8% of the old 2.6 figure) — the
    #                    roof is the best demonstrated rate, so PR now
    #                    reads ~99% and every gather roof tightened ~8%
    "scan_ns": 1.4,
    "sort_ns": 0.4,       # 0.29-0.36 ns/el measured at 2^20-2^21 int32 —
    #                       the round-1/2 "~2 ns/el" figure was wrong
    "scatter_ns": 4.3,    # scatter-min at 2^20 indices; scatter-set of
    #                       sorted unique ids measures at noise level —
    #                       the round-1 "30 ns/el" figure was a fused-
    #                       context artifact, not the primitive's cost
    "hashrow_ns": 14.5,   # LCC big-table hash-row fetch, re-derived round 4
    #                       (scripts/perf/lcc_probe_bench.py): raw table[h]
    #                       row gather 16.45 ns at 1 GB, but the rowblock
    #                       wedge kernel SUSTAINS 13.8-14.8 ns/probe incl.
    #                       bookkeeping (deeper pipelining across scan
    #                       steps) — the roof is the best demonstrated rate
    "dispatch_ms": 26.0,  # axon relay round trip; ~0.1 ms on direct-attached
}


def rate(name: str) -> float:
    env = os.environ.get(f"GRAPHTPU_RATE_{name.upper().replace('.', '_')}")
    if env is not None:
        return float(env)
    return RATES_TPU[name]


def roof_seconds(gathers: float = 0.0, scans: float = 0.0,
                 sorts: float = 0.0, scatters: float = 0.0) -> float:
    """Lower-bound execution time for the given primitive volumes."""
    return (
        gathers * rate("gather_ns")
        + scans * rate("scan_ns")
        + sorts * rate("sort_ns")
        + scatters * rate("scatter_ns")
    ) * 1e-9


def sol_pct(measured_seconds: float, roof_s: float) -> float:
    """Utilization vs the roof, in percent (not clamped)."""
    if measured_seconds <= 0:
        return 0.0
    return round(100.0 * roof_s / measured_seconds, 1)


# ---------------------------------------------------------------------------
# Executed-volume roofs (VERDICT r3 #3). Every phase of the adaptive
# kernels has STATIC shapes, so the executed primitive volume is a pure
# function of the phase counts the kernels now return (full vs active
# steps; BFS per-tier counts). These formulas enumerate each phase's
# primitive composition so `sol_pct` measures utilization of work
# actually done — a number that can legitimately approach but not
# meaningfully exceed 100 — while the old nominal-volume roofs stay in
# the bench output as a second column (they answer "how much better
# than one-sweep-per-iteration is this kernel?", which CAN exceed 100%).
# ---------------------------------------------------------------------------


def cdlp_executed_roof(full_steps: int, active_steps: int,
                       plan_gathers: int, e_cap: int) -> float:
    """Full step: one slab-plan sweep (plan_gathers label gathers; the
    row-local sorts/scans of minmode ride the VPU at ~0.1 ns/el and are
    not the bound). Active step: expand (2 E-sized gathers) +
    stream_minmode (2 sorts + scan + gather over e_cap) + compact_stream
    dedupe (2 sorts)."""
    full = roof_seconds(gathers=plan_gathers)
    active = roof_seconds(gathers=3 * e_cap, sorts=4 * e_cap, scans=e_cap)
    return full_steps * full + active_steps * active


def wcc_executed_roof(full_steps: int, active_steps: int, nnz: int, n: int,
                      e_cap: int, plan_gathers: "int | None" = None) -> float:
    """Edge-stream full step: label gather + segment-min scan over the
    symmetrized stream, plus two n-sized pointer-jump gathers. Slab full
    step (`plan_gathers` set — the wcc-impl=slab/auto variant): one
    padded slab-plan gather sweep (row-min is a VPU axis reduction, not
    a scan) plus the jumps. Iteration 0 (always a full step) is
    gather-free in both variants, so one full step's main volume is
    discounted. Active step: expand (2 E gathers) + label gather +
    seg-min scan over e_cap + dedupe sorts (2) + one n-sized compact
    sort at the phase boundary."""
    if plan_gathers is not None:
        full = roof_seconds(gathers=plan_gathers + 2 * n)
        iter0_discount = (
            roof_seconds(gathers=plan_gathers) if full_steps >= 1 else 0.0
        )
    else:
        full = roof_seconds(gathers=nnz + 2 * n, scans=nnz)
        iter0_discount = roof_seconds(gathers=nnz) if full_steps >= 1 else 0.0
    active = roof_seconds(gathers=3 * e_cap, scans=e_cap,
                          sorts=2 * e_cap + n)
    return full_steps * full - iter0_discount + active_steps * active


def sssp_executed_roof(full_steps: int, active_steps: int, nnz: int, n: int,
                       e_cap: int, stats: "dict | None" = None) -> float:
    """Full step: dist gather + weight load (gather-rate) + segment-min
    scan over the pull stream. Tier step at edge budget e: expand (2 E
    gathers) + dist/weight gathers + scatter-min of e candidates + the
    n-sized compact sort in derive(). With `stats` (the tiered kernel's
    per-tier counters), each tier is priced at its own budget; else all
    active steps are priced at e_cap."""
    full = roof_seconds(gathers=2 * nnz, scans=nnz)
    total = full_steps * full
    if stats is not None and "tier_steps" in stats:
        for (k, e), steps in zip(stats["tiers"],
                                 stats["tier_steps"].values()):
            total += steps * roof_seconds(gathers=4 * e, scatters=e, sorts=n)
        return total
    active = roof_seconds(gathers=4 * e_cap, scatters=e_cap, sorts=n)
    return total + active_steps * active


# Measured isolated per-step costs of the adaptive BFS phase bodies
# (scripts/perf/bfs_phases.py replay, v5e via axon relay, 2026-08-21:
# tier e=2^16 3.4 ms, tier e=2^18 13.0 ms, bottom-up 14.0-14.3 ms) plus
# the in-while_loop composition penalty per level — (e2e 108.1 ms -
# dispatch 26 - sum-of-isolated-steps 48.1) / 5 levels ≈ 6.8 ms —
# which two measured control-flow structures (nested phase while_loops
# vs a single lax.switch loop, scripts/perf/measure_bfs_switch.py:
# 565.7 vs 560.0 ms over 4 sources) pay identically, i.e. it is
# XLA-while-lowering-structural, not a composition choice. Overridable
# per hardware via GRAPHTPU_RATE_* like the primitive rates.
BFS_STEP_MS = {
    "tier_base_ms": 3.4,         # isolated tier step at e = 2^16
    "tier_slope_ns": 49.0,       # + per edge-budget above 2^16
    #                              ((13.0 - 3.4) ms / (2^18 - 2^16))
    "bu_ms": 14.0,               # isolated bottom-up step (t=2, n=2^20)
    "loop_level_ms": 6.8,        # while-lowering penalty per level
}


def _bfs_ms(name: str) -> float:
    env = os.environ.get(f"GRAPHTPU_RATE_BFS_{name.upper()}")
    if env is not None:
        return float(env)
    return BFS_STEP_MS[name]


def bfs_floor_roof(stats: dict, nnz: int, n: int, levels: int) -> float:
    """Floor-INCLUSIVE BFS roof (VERDICT r4 #3): executed steps priced
    at their measured isolated costs (which already include their
    primitive volumes) plus the measured per-level while-lowering
    penalty; dense steps priced at primitive volume (they are
    volume-bound). This is the honest bound for a k-step traversal on
    this stack — the remainder of the gap to 100% is within-kernel
    scheduling that no measured restructuring has recovered."""
    base = _bfs_ms("tier_base_ms")
    slope = _bfs_ms("tier_slope_ns")
    total_ms = 0.0
    for (k, e), steps in zip(stats["tiers"], stats["tier_steps"].values()):
        total_ms += steps * (base + max(e - (1 << 16), 0) * slope * 1e-6)
    # bu cost scales with the probe gather (t_trunc * n indices)
    bu_scale = (stats["t_trunc"] * n) / (2.0 * (1 << 20))
    total_ms += stats["bu_steps"] * _bfs_ms("bu_ms") * max(bu_scale, 0.25)
    total_ms += levels * _bfs_ms("loop_level_ms")
    return total_ms * 1e-3 + stats["dense_steps"] * roof_seconds(
        gathers=nnz, scans=nnz
    )


def bfs_executed_roof(stats: dict, nnz: int, n: int) -> float:
    """Sum of the per-phase executed volumes of the adaptive BFS using
    the kernel's own step counters (aborted attempts included — their
    work is paid). Tier step at edge budget e: n-sized compact sort +
    expand (2 gathers) + unvisited probe gather + dedupe sorts (2).
    Bottom-up step: t_trunc*n probe gather + n-sized residual compact
    sort + residual expand/probe over e_bu. Dense step: frontier gather
    + segment-max scan over the full stream."""
    total = 0.0
    for (k, e), steps in zip(stats["tiers"], stats["tier_steps"].values()):
        total += steps * roof_seconds(gathers=3 * e, sorts=2 * e + n,
                                      scatters=k)
    total += stats["bu_steps"] * roof_seconds(
        gathers=stats["t_trunc"] * n + 3 * stats["e_bu"], sorts=n
    )
    total += stats["dense_steps"] * roof_seconds(gathers=nnz, scans=nnz)
    return total


def plan_gather_count(plan) -> int:
    """Padded gather volume of one slab-plan sweep (ops/slab.SlabPlan):
    every slab element is one table_gather index, plus the heavy-tail
    stream's indices."""
    total = sum(int(b.slab.size) for b in plan.slabs)
    if plan.heavy_neigh is not None:
        total += int(plan.heavy_neigh.shape[0])
    return total
