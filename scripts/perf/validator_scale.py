"""Validator at datagen scale (VERDICT r4 next-round #7).

The validator docstring (graphtpu/harness/validator.py:28-31) claims
datagen-scale outputs "validate in seconds". This script makes that a
measured fact, as the zero-egress proxy for the datagen-7_8-zf
acceptance run (16,521,886 V / 41,025,255 E — the largest graph the
reference family tested, ECE508 report Table 1): it

1. generates a 2^24-vertex (16.8M) / ~41M-edge RMAT graph — the same
   |V|/|E| class as datagen-7_8-zf;
2. runs BFS + WCC + PR through the production kernels, serializes the
   result files through the byte-exact serializers
   (algorithms/common.py);
3. produces an INDEPENDENT second result per algorithm (a different
   kernel arm: bfs device loop / wcc edge-stream / pr float64) and
   serializes it as the "golden";
4. times `validate_files` per algorithm — the full golden-file parse +
   align + match path the suite runs at datagen scale.

    PYTHONPATH=/root/repo python scripts/perf/validator_scale.py [scale] [ef]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault("GRAPHTPU_COMPILE_CACHE", "./intermediate/xla-cache")

import numpy as np

import graphtpu  # noqa: F401

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon sitecustomize pins jax_platforms programmatically; the
    # config update is the authoritative override (tests/conftest.py)
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")


def main():
    import jax

    from graphtpu.algorithms.common import AlgorithmResult, run_algorithm
    from graphtpu.harness.validator import validate_files
    from graphtpu.ingest import cache as cache_mod
    from graphtpu.utils.config import AlgorithmParams, PlatformConfig
    from graphtpu.utils.synth import rmat_graph

    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    ef = int(sys.argv[2]) if len(sys.argv) > 2 else 3  # ~41M stored half-edges
    print(f"backend={jax.devices()[0].platform} scale={scale} ef={ef}", flush=True)

    gname = f"bench-rmat-s{scale}-ef{ef}"
    t0 = time.perf_counter()
    g = cache_mod.load("./intermediate", gname) if cache_mod.exists("./intermediate", gname) else None
    if g is None:
        g = rmat_graph(scale, ef, directed=False, seed=11)
        cache_mod.save(g, "./intermediate", gname)
    print(f"graph ready {time.perf_counter()-t0:.1f}s n={g.n} nnz={g.nnz}", flush=True)

    outdir = "./intermediate/validator-scale"
    os.makedirs(outdir, exist_ok=True)

    arms = {
        # (production cfg, independent-arm cfg)
        "bfs": (PlatformConfig(), PlatformConfig(bfs_impl="device")),
        "wcc": (PlatformConfig(), PlatformConfig(wcc_impl="adaptive")),
        "pr": (PlatformConfig(), PlatformConfig(precision="float64")),
    }
    params = {
        "bfs": AlgorithmParams(source_vertex=0),
        "wcc": AlgorithmParams(),
        "pr": AlgorithmParams(damping_factor=0.85, num_iterations=10),
    }

    for algo, (cfg_a, cfg_b) in arms.items():
        paths = []
        for tag, cfg in (("out", cfg_a), ("golden", cfg_b)):
            t0 = time.perf_counter()
            res = run_algorithm(algo, g, params[algo], cfg)
            run_s = time.perf_counter() - t0
            p = os.path.join(outdir, f"{algo}.{tag}")
            t0 = time.perf_counter()
            res.write(g, p)
            ser_s = time.perf_counter() - t0
            paths.append(p)
            print(f"  {algo} {tag:6s}: run {run_s:6.1f}s serialize {ser_s:6.1f}s", flush=True)
        t0 = time.perf_counter()
        ok, msg = validate_files(algo, paths[0], paths[1])
        val_s = time.perf_counter() - t0
        print(f"{algo:4s}: VALIDATE {val_s:6.2f}s ok={ok} ({msg})", flush=True)
        assert ok, (algo, msg)

    print("VALIDATOR SCALE OK", flush=True)


if __name__ == "__main__":
    main()
