"""Harness tests: suite runner, CLI, collector, config parsing."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

from graphtpu.harness.collector import Collector, ceil3
from graphtpu.harness.suite import BenchmarkSuite
from graphtpu.utils.config import BenchmarkConfig, GraphSpec, PlatformConfig

from conftest import FIXTURES
REPO = Path(__file__).resolve().parent.parent


def test_suite_full_run(tmp_path):
    cfg = BenchmarkConfig(
        graphs=["example-directed"],
        algorithms=["bfs", "pr", "wcc", "cdlp", "lcc", "sssp"],
        graphs_root=str(FIXTURES),
        output_dir=str(tmp_path / "output"),
        report_dir=str(tmp_path / "report"),
        repetitions=1,
    )
    suite = BenchmarkSuite(cfg, PlatformConfig(intermediate_dir=str(tmp_path / "im")))
    records = suite.run()
    assert len(records) == 6
    assert all(r.success for r in records), [r.error for r in records]
    assert all(r.validated for r in records), [(r.algorithm, r.error) for r in records]
    assert (tmp_path / "report" / "summary.json").exists()
    assert (tmp_path / "report" / "runs.jsonl").exists()
    assert (tmp_path / "report" / "report.txt").exists()
    summary = json.loads((tmp_path / "report" / "summary.json").read_text())
    assert summary["succeeded"] == 6
    # outputs written in golden-file format
    out = (tmp_path / "output" / "example-directed-BFS").read_text().splitlines()
    assert len(out) == 10


def test_suite_records_failures(tmp_path):
    # inprocess: the failure is injected by mutating the in-memory spec,
    # which a subprocess job (re-reading the spec from disk) wouldn't see
    cfg = BenchmarkConfig(
        graphs=["example-directed"],
        algorithms=["bfs"],
        graphs_root=str(FIXTURES),
        output_dir=str(tmp_path / "output"),
        report_dir=str(tmp_path / "report"),
        job_isolation="inprocess",
    )
    suite = BenchmarkSuite(cfg, PlatformConfig(intermediate_dir=str(tmp_path / "im")))
    spec = suite._resolve_spec("example-directed")
    spec.params["bfs"].source_vertex = None  # force a job error
    rec = suite.run_one(spec, "bfs", 0)
    assert not rec.success
    assert "source-vertex" in rec.error


def _cli(*argv, cwd=None):
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    return subprocess.run(
        [sys.executable, "-m", "graphtpu.cli", *argv],
        capture_output=True,
        text=True,
        env=env,
        cwd=cwd,
        timeout=600,
    )


def test_cli_run_and_validate(tmp_path):
    out_file = tmp_path / "out-bfs"
    r = _cli(
        "run",
        "--graph-properties", str(FIXTURES / "example-directed.properties"),
        "--algorithm", "bfs",
        "--output-file", str(out_file),
        "--validation-file", str(FIXTURES / "example-directed-BFS"),
        "--intermediate-dir", str(tmp_path / "im"),
    )
    assert r.returncode == 0, r.stderr
    assert "validation: PASS" in r.stdout
    assert "processing time:" in r.stdout

    r = _cli(
        "validate",
        "--algorithm", "bfs",
        "--output-file", str(out_file),
        "--validation-file", str(FIXTURES / "example-directed-BFS"),
    )
    assert r.returncode == 0, r.stderr

    # corrupt the output -> validation fails
    lines = out_file.read_text().splitlines()
    lines[0] = lines[0].split()[0] + " 12345"
    out_file.write_text("\n".join(lines) + "\n")
    r = _cli(
        "validate",
        "--algorithm", "bfs",
        "--output-file", str(out_file),
        "--validation-file", str(FIXTURES / "example-directed-BFS"),
    )
    assert r.returncode == 1


def test_cli_load_and_devices(tmp_path):
    r = _cli(
        "load",
        "--graph-properties", str(FIXTURES / "example-undirected.properties"),
        "--intermediate-dir", str(tmp_path / "im"),
    )
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "im" / "example-undirected" / "graph.npz").exists()

    r = _cli("devices")
    assert r.returncode == 0, r.stderr
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["num_devices"] >= 1


def test_cli_benchmark(tmp_path):
    r = _cli(
        "benchmark",
        "--config", str(REPO / "config-template" / "benchmark.properties"),
        "--graphs", "example-directed",
        "--algorithms", "bfs,wcc",
        "--intermediate-dir", str(tmp_path / "im"),
        cwd=str(tmp_path),  # config's output/report dirs are relative
    )
    assert r.returncode == 0, r.stderr + r.stdout
    assert (tmp_path / "report" / "summary.json").exists()
    assert (tmp_path / "output" / "example-directed-BFS").exists()


def test_collector_markers():
    c = Collector()
    c.stream.write("Processing starts at: 1000\n")
    c.stream.write("noise\n")
    c.stream.write("Processing ends at: 2501\n")
    assert c.collect_processing_time() == 1.501
    assert ceil3(0.0001) == 0.001  # ceiling rounding, GraphblasCollector.java:87-91


def test_platform_properties_roundtrip(tmp_path):
    p = tmp_path / "platform.properties"
    p.write_text(
        "platform.graphtpu.precision = float64\n"
        "platform.graphtpu.num-devices = 4\n"
        "platform.graphtpu.cdlp-impl = sort\n"
        "platform.graphtpu.bfs-step-mode = switch\n"
        "platform.graphtpu.sssp-tiers = 1024,65536\n"
    )
    cfg = PlatformConfig.from_properties(p)
    assert cfg.precision == "float64"
    assert cfg.num_devices == 4
    assert cfg.cdlp_impl == "sort"
    assert cfg.bfs_step_mode == "switch"
    assert cfg.sssp_tiers == "1024,65536"


def test_benchmark_properties_roundtrip():
    cfg = BenchmarkConfig.from_properties(REPO / "config-template" / "benchmark.properties")
    assert cfg.graphs == ["example-directed", "example-undirected"]
    assert cfg.algorithms == ["bfs", "pr", "wcc", "cdlp", "lcc", "sssp"]
    assert cfg.timeout_seconds == 3600
    assert cfg.validation_required
