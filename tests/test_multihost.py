"""Multi-host proof: 2 jax.distributed processes over a localhost
coordinator, 4 virtual CPU devices each -> one 8-device global mesh.

Exercises multihost.initialize, process-spanning shard construction
(partition.put_sharded routes through make_array_from_callback when
devices span processes), cross-process collectives (all_gather/psum over
gloo), and rank-0 result parity of ALL SIX algorithms vs the
single-chip kernels — the
SURVEY.md §5.8 contract the README's multi-host claim rests on.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_all_six():
    port = _free_port()
    env_base = dict(os.environ)
    env_base.pop("JAX_PLATFORMS", None)
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env_base["GRAPHTPU_COORDINATOR"] = f"localhost:{port}"
    env_base["GRAPHTPU_NUM_PROCESSES"] = "2"
    env_base["PYTHONPATH"] = f"{REPO}:{env_base.get('PYTHONPATH', '')}"

    procs = []
    for rank in range(2):
        env = dict(env_base)
        env["GRAPHTPU_PROCESS_ID"] = str(rank)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(REPO / "tests" / "multihost_worker.py")],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                cwd=str(REPO),
            )
        )
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
    assert "MULTIHOST_OK" in outs[0], outs[0]
