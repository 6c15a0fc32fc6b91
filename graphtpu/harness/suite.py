"""Benchmark suite runner — the in-process analogue of the external
graphalytics-core harness (SURVEY.md L0): iterate (graph × algorithm ×
repetition), enforce per-run timeouts, write outputs, validate against
golden files, collect the processing-time metric, and emit a report/
directory.

The reference's suite is driven by benchmark.properties
(benchmark.custom.graphs/.algorithms/.timeout/.output-required/
.validation-required/.repetitions — config-template/cdlp.properties:8-23)
and produces a report tree; this runner consumes the same properties
format via BenchmarkConfig and writes report/{summary.json, runs.jsonl,
report.txt}.
"""

from __future__ import annotations

import dataclasses
import json
import signal
import time
from pathlib import Path
from typing import Dict, List, Optional

from graphtpu.algorithms.common import run_algorithm
from graphtpu.harness.collector import ceil3
from graphtpu.harness.platform import GraphTpuPlatform
from graphtpu.harness.validator import validate_result
from graphtpu.utils.config import BenchmarkConfig, GraphSpec, PlatformConfig
from graphtpu.utils.logging import get_logger
from graphtpu.utils.timers import proc_time_end, proc_time_start

log = get_logger("suite")

ALGO_SUFFIX = {"bfs": "BFS", "pr": "PR", "wcc": "WCC", "cdlp": "CDLP", "lcc": "LCC", "sssp": "SSSP"}


def _is_primary() -> bool:
    """True on the process that writes outputs/reports (rank 0; always
    True single-host)."""
    from graphtpu.parallel.multihost import is_primary

    return is_primary()


@dataclasses.dataclass
class RunRecord:
    graph: str
    algorithm: str
    repetition: int
    success: bool
    validated: Optional[bool]
    processing_time_seconds: float
    makespan_seconds: float
    iterations: Optional[int]
    error: str = ""

    def to_json(self) -> dict:
        return dataclasses.asdict(self)


class _Timeout(Exception):
    pass


class _alarm:
    """Best-effort per-run timeout (SIGALRM; main thread only). The
    reference harness kills the benchmark subprocess on timeout
    (benchmark.custom.timeout, executable.pid — execute-job.sh:150); in
    one process we can only interrupt between host steps."""

    def __init__(self, seconds: int):
        self.seconds = seconds

    def __enter__(self):
        if self.seconds > 0:
            try:
                self._old = signal.signal(signal.SIGALRM, self._raise)
                signal.alarm(self.seconds)
                self._armed = True
            except ValueError:  # not in main thread
                self._armed = False
        else:
            self._armed = False
        return self

    @staticmethod
    def _raise(signum, frame):
        raise _Timeout()

    def __exit__(self, *exc):
        if self._armed:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, self._old)
        return False


class BenchmarkSuite:
    def __init__(
        self,
        bench_cfg: BenchmarkConfig,
        platform_cfg: Optional[PlatformConfig] = None,
    ):
        self.cfg = bench_cfg
        self.platform = GraphTpuPlatform(platform_cfg)
        self.records: List[RunRecord] = []

    # -- resolution ----------------------------------------------------------

    def _resolve_spec(self, graph_name: str) -> GraphSpec:
        root = Path(self.cfg.graphs_root)
        props = root / f"{graph_name}.properties"
        if not props.exists():
            raise FileNotFoundError(f"dataset descriptor not found: {props}")
        return GraphSpec.from_properties(props)

    def _golden_path(self, spec: GraphSpec, algorithm: str) -> Optional[Path]:
        suffix = ALGO_SUFFIX[algorithm]
        base = Path(self.cfg.validation_dir) if self.cfg.validation_dir else Path(self.cfg.graphs_root)
        p = base / f"{spec.name}-{suffix}"
        return p if p.exists() else None

    # -- execution -----------------------------------------------------------

    def run_one(self, spec: GraphSpec, algorithm: str, repetition: int) -> RunRecord:
        t0 = time.perf_counter()
        rec = RunRecord(
            graph=spec.name,
            algorithm=algorithm,
            repetition=repetition,
            success=False,
            validated=None,
            processing_time_seconds=-1.0,
            makespan_seconds=-1.0,
            iterations=None,
        )
        if self.cfg.job_isolation == "subprocess":
            from graphtpu.parallel.multihost import is_multihost

            if not is_multihost():
                return self._run_one_subprocess(spec, algorithm, repetition, rec, t0)
            # multi-host: collective jobs must execute in the ranked
            # processes themselves — a spawned child would sit outside the
            # jax.distributed world. Fall through to in-process execution.
            log.info("multi-host run: job-isolation=subprocess -> inprocess")
        try:
            with _alarm(self.cfg.timeout_seconds):
                graph = self.platform.graphs.get(spec.name) or self.platform.load_graph(spec)
                params = spec.params.get(algorithm)
                self.platform.prepare(spec, algorithm)  # compile outside the window
                start_ms = proc_time_start(self.platform.collector.stream)
                result = run_algorithm(algorithm, graph, params, self.platform.config)
                end_ms = proc_time_end(self.platform.collector.stream)
            rec.success = True
            rec.processing_time_seconds = ceil3((end_ms - start_ms) / 1000.0)
            rec.iterations = result.iterations

            if self.cfg.output_required and _is_primary():
                # multi-host: every process runs the (collective) job,
                # only rank 0 writes outputs — the reference's single
                # writer contract
                out_dir = Path(self.cfg.output_dir)
                out_dir.mkdir(parents=True, exist_ok=True)
                out_path = out_dir / f"{spec.name}-{ALGO_SUFFIX[algorithm]}"
                result.write(graph, str(out_path))

            if self.cfg.validation_required:
                golden = self._golden_path(spec, algorithm)
                if golden is None:
                    log.warning("no golden file for %s/%s — skipping validation", spec.name, algorithm)
                else:
                    ok, msg = validate_result(result, graph, str(golden))
                    rec.validated = ok
                    if not ok:
                        rec.error = f"validation failed: {msg}"
        except _Timeout:
            rec.error = f"timeout after {self.cfg.timeout_seconds}s"
        except Exception as e:  # noqa: BLE001 — suite must survive job failures
            rec.error = f"{type(e).__name__}: {e}"
        rec.makespan_seconds = round(time.perf_counter() - t0, 3)
        self.records.append(rec)
        status = "OK" if rec.success and rec.validated in (True, None) else "FAIL"
        log.info(
            "[%s] %s/%s rep %d: t=%.3fs validated=%s %s",
            status, spec.name, algorithm, repetition,
            rec.processing_time_seconds, rec.validated, rec.error,
        )
        return rec

    def _run_one_subprocess(
        self, spec: GraphSpec, algorithm: str, repetition: int, rec: RunRecord, t0: float
    ) -> RunRecord:
        """Killable job execution (benchmark.custom.job-isolation =
        subprocess): the reference harness's process model, where a hung
        job is killed at benchmark.custom.timeout via its pid file."""
        from graphtpu.harness.jobproc import run_job
        from graphtpu.harness.validator import validate_files

        out_path: Optional[Path] = None
        if self.cfg.output_required or self.cfg.validation_required:
            out_dir = Path(self.cfg.output_dir)
            out_dir.mkdir(parents=True, exist_ok=True)
            out_path = out_dir / f"{spec.name}-{ALGO_SUFFIX[algorithm]}"

        job_log = Path(self.cfg.report_dir) / "log" / f"{spec.name}-{algorithm}-r{repetition}"
        spec_path = Path(self.cfg.graphs_root) / f"{spec.name}.properties"
        outcome = run_job(
            str(spec_path),
            algorithm,
            self.platform.config,
            log_dir=str(job_log),
            output_file=str(out_path) if out_path else None,
            timeout_seconds=self.cfg.timeout_seconds,
            stream=self.platform.collector.stream,
        )
        if outcome.status == "timeout":
            rec.error = f"timeout after {self.cfg.timeout_seconds}s (job killed)"
        elif outcome.status == "error":
            rec.error = outcome.error
        else:
            rec.success = True
            rec.processing_time_seconds = ceil3(outcome.processing_ms / 1000.0)
            rec.iterations = outcome.iterations
            if self.cfg.validation_required and out_path is not None:
                golden = self._golden_path(spec, algorithm)
                if golden is None:
                    log.warning(
                        "no golden file for %s/%s — skipping validation", spec.name, algorithm
                    )
                else:
                    ok, msg = validate_files(algorithm, str(out_path), str(golden))
                    rec.validated = ok
                    if not ok:
                        rec.error = f"validation failed: {msg}"
        rec.makespan_seconds = round(time.perf_counter() - t0, 3)
        self.records.append(rec)
        status = "OK" if rec.success and rec.validated in (True, None) else "FAIL"
        log.info(
            "[%s] %s/%s rep %d: t=%.3fs validated=%s %s",
            status, spec.name, algorithm, repetition,
            rec.processing_time_seconds, rec.validated, rec.error,
        )
        return rec

    def run(self) -> List[RunRecord]:
        # one bad graph must not abort the suite or lose the report —
        # the reference harness isolates per-job failures the same way
        try:
            for graph_name in self.cfg.graphs:
                try:
                    spec = self._resolve_spec(graph_name)
                except Exception as e:
                    log.error("graph %s unresolvable: %s — skipping", graph_name, e)
                    self.records.append(RunRecord(
                        graph=graph_name, algorithm="*", repetition=0,
                        success=False, validated=None,
                        processing_time_seconds=0.0, makespan_seconds=0.0,
                        iterations=None, error=f"graph unresolvable: {e}",
                    ))
                    continue
                algos = self.cfg.algorithms or spec.algorithms
                for algorithm in algos:
                    if algorithm not in spec.algorithms:
                        log.warning("%s does not list algorithm %s — skipping", spec.name, algorithm)
                        continue
                    for rep in range(self.cfg.repetitions):
                        self.run_one(spec, algorithm, rep)
                self.platform.delete_graph(spec.name)
        finally:
            self.write_report()
        return self.records

    # -- reporting -----------------------------------------------------------

    def write_report(self) -> Path:
        report_dir = Path(self.cfg.report_dir)
        if not _is_primary():
            return report_dir
        report_dir.mkdir(parents=True, exist_ok=True)
        with open(report_dir / "runs.jsonl", "w") as f:
            for rec in self.records:
                f.write(json.dumps(rec.to_json()) + "\n")

        ok = [r for r in self.records if r.success and r.validated in (True, None)]
        summary = {
            "platform": "graphtpu",
            "total_runs": len(self.records),
            "succeeded": len(ok),
            "failed": len(self.records) - len(ok),
            "by_run": {
                f"{r.graph}/{r.algorithm}/rep{r.repetition}": r.processing_time_seconds
                for r in self.records
            },
        }
        (report_dir / "summary.json").write_text(json.dumps(summary, indent=2))

        lines = [
            "graphtpu benchmark report",
            "=" * 60,
            f"{'graph':24} {'algo':6} {'rep':3} {'proc(s)':>9} {'valid':>6} status",
        ]
        for r in self.records:
            status = "ok" if r.success and r.validated in (True, None) else (r.error[:40] or "fail")
            lines.append(
                f"{r.graph:24} {r.algorithm:6} {r.repetition:3d} "
                f"{r.processing_time_seconds:9.3f} {str(r.validated):>6} {status}"
            )
        (report_dir / "report.txt").write_text("\n".join(lines) + "\n")
        log.info("report written to %s", report_dir)
        return report_dir
