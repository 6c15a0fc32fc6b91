"""Dataset download (download-dataset-small.sh parity) — exercised with
file:// archives so the path is fully testable under zero egress."""

import io
import tarfile

import pytest

from graphtpu.ingest.download import (
    SMALL_DATASETS,
    dataset_url,
    download_dataset,
)
from tests.conftest import FIXTURES


def _make_archive(tmp_path, name, compression="zst", member_prefix=""):
    """Pack the vendored example-directed fixture as <name>.tar[.zst|.gz]."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for suffix in (".v", ".e", ".properties"):
            src = FIXTURES / f"example-directed{suffix}"
            data = src.read_bytes()
            if suffix == ".properties":
                data = data.replace(b"example-directed", name.encode())
            info = tarfile.TarInfo(name=f"{member_prefix}{name}{suffix}")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    raw = buf.getvalue()
    if compression == "zst":
        import zstandard

        path = tmp_path / f"{name}.tar.zst"
        path.write_bytes(zstandard.ZstdCompressor().compress(raw))
    elif compression == "gz":
        import gzip

        path = tmp_path / f"{name}.tar.gz"
        path.write_bytes(gzip.compress(raw))
    else:
        path = tmp_path / f"{name}.tar"
        path.write_bytes(raw)
    return path.as_uri()


@pytest.mark.parametrize("compression", ["zst", "gz", "tar"])
def test_download_extracts_and_loads(tmp_path, compression):
    url = _make_archive(tmp_path, "mini-set", compression)
    gdir = tmp_path / "graphs"
    props = download_dataset("mini-set", gdir, url=url)
    assert props == gdir / "mini-set.properties"
    assert (gdir / "mini-set.v").exists() and (gdir / "mini-set.e").exists()

    # the downloaded descriptor goes straight through ingest
    from graphtpu.ingest.loader import load_graph_from_spec
    from graphtpu.utils.config import GraphSpec

    spec = GraphSpec.from_properties(props)
    g = load_graph_from_spec(spec, intermediate_dir=str(tmp_path / "im"))
    assert g.n == 10


def test_download_skip_if_exists(tmp_path):
    url = _make_archive(tmp_path, "mini-set")
    gdir = tmp_path / "graphs"
    p1 = download_dataset("mini-set", gdir, url=url)
    marker = gdir / "mini-set.v"
    marker.write_text("sentinel")
    # second call must not re-extract (idempotent skip on .properties)
    p2 = download_dataset("mini-set", gdir, url="file:///nonexistent.tar")
    assert p1 == p2 and marker.read_text() == "sentinel"
    # force re-downloads
    download_dataset("mini-set", gdir, url=url, force=True)
    assert marker.read_text() != "sentinel"


def test_download_nested_layout(tmp_path):
    url = _make_archive(tmp_path, "mini-set", member_prefix="mini-set/")
    props = download_dataset("mini-set", tmp_path / "graphs", url=url)
    assert props == tmp_path / "graphs" / "mini-set" / "mini-set.properties"


def test_download_rejects_escaping_members(tmp_path):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo(name="../evil.properties")
        info.size = 4
        tf.addfile(info, io.BytesIO(b"pwnd"))
    path = tmp_path / "evil.tar"
    path.write_bytes(buf.getvalue())
    with pytest.raises(ValueError, match="escapes"):
        download_dataset("evil", tmp_path / "graphs", url=path.as_uri())
    assert not (tmp_path / "evil.properties").exists()


def test_registry_urls():
    assert "datagen-7_5-fb" in SMALL_DATASETS
    assert dataset_url("kgs").endswith("/kgs.tar.zst")


def test_cli_download(tmp_path, capsys):
    from graphtpu.cli import main

    url = _make_archive(tmp_path, "mini-set")
    rc = main([
        "download", "--graph", "mini-set",
        "--graphs-dir", str(tmp_path / "graphs"), "--url", url,
    ])
    assert rc == 0
    assert "ready:" in capsys.readouterr().out
    # unreachable URL → clean exit code, no traceback
    rc = main([
        "download", "--graph", "nope",
        "--graphs-dir", str(tmp_path / "graphs"),
        "--url", (tmp_path / "missing.tar").as_uri(),
    ])
    assert rc == 1
