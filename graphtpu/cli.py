"""Command-line interface: ``graphtpu load|run|validate|benchmark|devices``.

The reference exposes its lifecycle through four shell scripts driven by a
Java harness (bin/sh/{load-graph,execute-job,unload-graph,terminate-job}.sh,
GraphblasConfiguration.java:100-110); here the same surface is subcommands
of one CLI. Flag names mirror the reference's ``--key value`` contract
(ParseBenchmarkParameters, src/main/c/src/utils.cpp:19-53) where they
carry over.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _add_platform_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--intermediate-dir", default="./intermediate")
    p.add_argument("--precision", choices=["float32", "float64"], default=None)
    p.add_argument("--num-devices", type=int, default=0,
                   help="mesh size for row-partitioned multi-chip execution (0/1 = single chip)")
    p.add_argument("--cdlp-impl", choices=["auto", "slab", "sort"], default=None)
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace of each processing window here")
    p.add_argument("--platform-properties", default=None,
                   help="platform.properties file (flags override it)")


def _platform_config(args):
    from graphtpu.utils.config import PlatformConfig

    cfg = (
        PlatformConfig.from_properties(args.platform_properties)
        if getattr(args, "platform_properties", None)
        else PlatformConfig()
    )
    cfg.intermediate_dir = args.intermediate_dir
    if args.precision:
        cfg.precision = args.precision
    if args.num_devices:
        cfg.num_devices = args.num_devices
    if getattr(args, "cdlp_impl", None):
        cfg.cdlp_impl = args.cdlp_impl
    if getattr(args, "profile_dir", None):
        cfg.profile_dir = args.profile_dir
    # multi-host: no-op single-host, initializes jax.distributed when the
    # GRAPHTPU_COORDINATOR / TPU-pod env is present
    from graphtpu.parallel import multihost

    multihost.initialize()
    return cfg


def cmd_load(args) -> int:
    from graphtpu.ingest.loader import load_graph, load_graph_from_spec
    from graphtpu.utils.config import GraphSpec

    if args.graph_properties:
        spec = GraphSpec.from_properties(args.graph_properties)
        g = load_graph_from_spec(spec, intermediate_dir=args.intermediate_dir)
    else:
        if not (args.input_vertex_path and args.input_edge_path and args.graph_name):
            print("load: need --graph-properties OR --graph-name + --input-vertex-path + --input-edge-path",
                  file=sys.stderr)
            return 2
        g = load_graph(
            args.input_vertex_path,
            args.input_edge_path,
            args.directed,
            args.weighted,
            graph_name=args.graph_name,
            intermediate_dir=args.intermediate_dir,
        )
    print(f"loaded {g}")
    return 0


def cmd_run(args) -> int:
    from graphtpu.harness.platform import GraphTpuPlatform
    from graphtpu.harness.validator import validate_result
    from graphtpu.utils.config import GraphSpec

    spec = GraphSpec.from_properties(args.graph_properties)
    platform = GraphTpuPlatform(_platform_config(args))
    platform.startup(log_dir=args.log_path)
    graph = platform.load_graph(spec)
    # warm-up outside the metric window: the reference's precompiled C
    # binaries never pay a JIT cost between the markers
    platform.prepare(spec, args.algorithm)
    result = platform.run(spec, args.algorithm)
    metrics = platform.finalize()
    print(f"processing time: {metrics.processing_time_seconds}s "
          f"(iterations: {result.iterations})")
    from graphtpu.parallel import multihost

    if args.output_file and multihost.is_primary():
        result.write(graph, args.output_file)
        print(f"output written to {args.output_file}")
    if args.validation_file:
        ok, msg = validate_result(result, graph, args.validation_file)
        print(f"validation: {'PASS' if ok else 'FAIL'} ({msg})")
        return 0 if ok else 1
    return 0


def cmd_validate(args) -> int:
    from graphtpu.harness.validator import validate_files

    ok, msg = validate_files(args.algorithm, args.output_file, args.validation_file)
    print(f"validation: {'PASS' if ok else 'FAIL'} ({msg})")
    return 0 if ok else 1


def cmd_benchmark(args) -> int:
    from graphtpu.harness.suite import BenchmarkSuite
    from graphtpu.utils.config import BenchmarkConfig

    bench_cfg = BenchmarkConfig.from_properties(args.config)
    if args.graphs:
        bench_cfg.graphs = args.graphs.split(",")
    if args.algorithms:
        bench_cfg.algorithms = args.algorithms.lower().split(",")
    suite = BenchmarkSuite(bench_cfg, _platform_config(args))
    records = suite.run()
    bad = [r for r in records if not (r.success and r.validated in (True, None))]
    print(f"benchmark finished: {len(records) - len(bad)}/{len(records)} runs ok; "
          f"report at {bench_cfg.report_dir}")
    return 1 if bad else 0


def cmd_download(args) -> int:
    import tarfile

    from graphtpu.ingest.download import (
        DEFAULT_BASE_URL,
        SMALL_DATASETS,
        download_dataset,
        download_small_datasets,
    )

    args.base_url = args.base_url or DEFAULT_BASE_URL
    try:
        if args.all_small:
            paths = download_small_datasets(
                args.graphs_dir, base_url=args.base_url, force=args.force
            )
            for p in paths:
                print(f"ready: {p}")
            return 0
        if not args.graph:
            print(f"download: need --graph <name> (known: {', '.join(SMALL_DATASETS)}) "
                  "or --all-small", file=sys.stderr)
            return 2
        p = download_dataset(
            args.graph,
            args.graphs_dir,
            base_url=args.base_url,
            url=args.url,
            force=args.force,
        )
        print(f"ready: {p}")
        return 0
    except (OSError, ValueError, EOFError, tarfile.TarError) as e:
        # OSError: network/fs; TarError/EOFError: corrupt or truncated
        # archive; ValueError: path-traversal member rejected
        print(f"download failed: {e}", file=sys.stderr)
        return 1


def cmd_devices(args) -> int:
    import jax

    devs = jax.devices()
    print(json.dumps({
        "backend": devs[0].platform if devs else "none",
        "num_devices": len(devs),
        "devices": [str(d) for d in devs],
    }))
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="graphtpu",
                                 description="TPU-native LDBC Graphalytics benchmark framework")
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("load", help="ingest a graph into the binary cache (load-graph.sh analogue)")
    p.add_argument("--graph-properties", default=None, help="dataset descriptor .properties file")
    p.add_argument("--graph-name", default=None)
    p.add_argument("--input-vertex-path", default=None)
    p.add_argument("--input-edge-path", default=None)
    p.add_argument("--directed", action="store_true")
    p.add_argument("--weighted", action="store_true")
    p.add_argument("--intermediate-dir", default="./intermediate")
    p.set_defaults(fn=cmd_load)

    p = sub.add_parser("run", help="run one algorithm job (execute-job.sh analogue)")
    p.add_argument("--graph-properties", required=True)
    p.add_argument("--algorithm", required=True,
                   choices=["bfs", "pr", "wcc", "cdlp", "lcc", "sssp"])
    p.add_argument("--output-file", default=None)
    p.add_argument("--validation-file", default=None)
    p.add_argument("--log-path", default=None)
    _add_platform_flags(p)
    p.set_defaults(fn=cmd_run)

    p = sub.add_parser("validate", help="validate an output file against a golden file")
    p.add_argument("--algorithm", required=True,
                   choices=["bfs", "pr", "wcc", "cdlp", "lcc", "sssp"])
    p.add_argument("--output-file", required=True)
    p.add_argument("--validation-file", required=True)
    p.set_defaults(fn=cmd_validate)

    p = sub.add_parser("benchmark", help="run a full benchmark suite from a properties file")
    p.add_argument("--config", required=True, help="benchmark.properties")
    p.add_argument("--graphs", default=None, help="comma list, overrides config")
    p.add_argument("--algorithms", default=None, help="comma list, overrides config")
    _add_platform_flags(p)
    p.set_defaults(fn=cmd_benchmark)

    p = sub.add_parser("download",
                       help="fetch Graphalytics dataset archives (download-dataset-small.sh analogue)")
    p.add_argument("--graph", default=None, help="dataset name (e.g. datagen-7_5-fb)")
    p.add_argument("--all-small", action="store_true",
                   help="fetch the reference's full small-data-set list")
    p.add_argument("--graphs-dir", default="./graphs")
    p.add_argument("--base-url", default=None)
    p.add_argument("--url", default=None,
                   help="explicit archive URL (.tar.zst/.tar.gz/.tar; file:// supported)")
    p.add_argument("--force", action="store_true", help="re-download even if present")
    p.set_defaults(fn=cmd_download)

    p = sub.add_parser("devices", help="show the JAX device inventory")
    p.set_defaults(fn=cmd_devices)

    return ap


def main(argv=None) -> int:
    # honor JAX_PLATFORMS even where a sitecustomize pinned the platform
    # programmatically (the axon TPU plugin does; env alone is ignored).
    # GRAPHTPU_PLATFORM wins: the axon kernel env exports
    # JAX_PLATFORMS=axon AMBIENTLY, so re-applying it here would undo
    # the documented GRAPHTPU_PLATFORM=cpu override (and hang forever
    # when the TPU relay is down).
    import os

    if os.environ.get("JAX_PLATFORMS") and not os.environ.get("GRAPHTPU_PLATFORM"):
        import jax

        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
