"""North-star acceptance dress rehearsal (VERDICT r2 #2).

The literal acceptance test — "download datagen-7_5-fb, ingest it, run
the full validated six-algorithm suite" — cannot run here: the
environment has zero egress (DNS fails) and no local copy of the LDBC
archives. This test runs the EXACT same pipeline end-to-end with a
file:// archive of a vendored micro-dataset standing in for the LDBC
bucket: download → extract → ingest → all six algorithms → golden
validation → report. The moment a mirror is reachable, the same code
path runs the real thing:

    python -m graphtpu.cli download --dataset datagen-7_5-fb --graphs-dir graphs/
    python -m graphtpu.cli benchmark --config <props with graphs=datagen-7_5-fb>

(or GRAPHTPU_DATASET_DIR/GRAPHTPU_DATASET for bench.py's dataset mode).
"""

import io
import shutil
import tarfile

from graphtpu.harness.suite import ALGO_SUFFIX, BenchmarkSuite
from graphtpu.ingest.download import download_dataset
from graphtpu.utils.config import BenchmarkConfig, PlatformConfig
from tests.conftest import FIXTURES


def _make_archive(tmp_path, name, src_graph):
    """Pack a vendored fixture's .v/.e/.properties as <name>.tar.zst —
    the LDBC archive layout download-dataset-small.sh streams."""
    import zstandard

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for suffix in (".v", ".e", ".properties"):
            data = (FIXTURES / f"{src_graph}{suffix}").read_bytes()
            if suffix == ".properties":
                data = data.replace(src_graph.encode(), name.encode())
            info = tarfile.TarInfo(name=f"{name}/{name}{suffix}")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    path = tmp_path / f"{name}.tar.zst"
    path.write_bytes(zstandard.ZstdCompressor().compress(buf.getvalue()))
    return path.as_uri()


def test_download_ingest_validate_all_six(tmp_path):
    name = "mini-datagen"
    src_graph = "example-directed"
    url = _make_archive(tmp_path, name, src_graph)

    graphs_dir = tmp_path / "graphs"
    props = download_dataset(name, graphs_dir, url=url)
    root = props.parent

    # validation data ships separately from the graph archives (the
    # harness's reference-output tree); stage the goldens beside the
    # descriptor like link-matrix-market-graphs.sh pre-seeds caches
    for algo, suffix in ALGO_SUFFIX.items():
        shutil.copy(
            FIXTURES / f"{src_graph}-{suffix}", root / f"{name}-{suffix}"
        )

    cfg = BenchmarkConfig(
        graphs=[name],
        algorithms=list(ALGO_SUFFIX),
        graphs_root=str(root),
        output_dir=str(tmp_path / "output"),
        report_dir=str(tmp_path / "report"),
        validation_required=True,
        job_isolation="inprocess",  # one shared CPU core; subprocess
        #                             isolation is covered by test_timeout
    )
    suite = BenchmarkSuite(cfg, PlatformConfig(intermediate_dir=str(tmp_path / "im")))
    records = suite.run()

    assert len(records) == 6, [r.error for r in records]
    for r in records:
        assert r.success, f"{r.algorithm}: {r.error}"
        assert r.validated is True, f"{r.algorithm}: {r.error}"
    assert (tmp_path / "report" / "summary.json").exists()
