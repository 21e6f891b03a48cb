"""Dataset bootstrap (download/extract/verify) — SURVEY §2.2 P9.

Exercises the full ensure_dataset path offline via file:// URLs.
"""

from __future__ import annotations

import hashlib
import io
import tarfile
import zipfile
from pathlib import Path

import pytest

from unflow_tpu.data.bootstrap import (
    ArchiveSpec,
    DatasetManifest,
    MANIFESTS,
    ensure_dataset,
    override_manifest,
)


@pytest.fixture()
def quiet():
    return lambda msg: None


def _make_zip(path: Path, members: dict[str, bytes]) -> None:
    with zipfile.ZipFile(path, "w") as z:
        for name, data in members.items():
            z.writestr(name, data)


def _manifest_for(tmp_path: Path, archive: Path, **spec_kw) -> DatasetManifest:
    return DatasetManifest(
        name="testset",
        layout_root="testset/training",
        archives=(ArchiveSpec(url=archive.as_uri(), extract_into="testset",
                              **spec_kw),),
    )


def test_download_extract_layout(tmp_path, quiet, monkeypatch):
    src = tmp_path / "src.zip"
    _make_zip(src, {"training/image_2/000000_10.png": b"fakepng",
                    "testing/image_2/000000_10.png": b"x"})
    monkeypatch.setitem(MANIFESTS, "testset", _manifest_for(tmp_path, src))

    data_dir = tmp_path / "data"
    root = ensure_dataset("testset", data_dir, progress=quiet)
    assert root == data_dir / "testset" / "training"
    assert (root / "image_2" / "000000_10.png").read_bytes() == b"fakepng"
    # archive cached under _downloads
    assert (data_dir / "_downloads" / "src.zip").exists()


def test_idempotent_no_redownload(tmp_path, quiet, monkeypatch):
    src = tmp_path / "src.zip"
    _make_zip(src, {"training/a.txt": b"1"})
    monkeypatch.setitem(MANIFESTS, "testset", _manifest_for(tmp_path, src))
    data_dir = tmp_path / "data"
    ensure_dataset("testset", data_dir, progress=quiet)
    # second call must not touch the source (deleting it proves no fetch)
    src.unlink()
    root = ensure_dataset("testset", data_dir, progress=quiet)
    assert root.exists()


def test_strip_prefix(tmp_path, quiet, monkeypatch):
    src = tmp_path / "src.zip"
    _make_zip(src, {"Release_v1/data/00001_img1.ppm": b"img"})
    m = DatasetManifest(
        name="testset",
        layout_root="testset/data",
        archives=(ArchiveSpec(url=src.as_uri(), extract_into="testset",
                              strip_prefix="Release_v1"),),
    )
    monkeypatch.setitem(MANIFESTS, "testset", m)
    root = ensure_dataset("testset", tmp_path / "data", progress=quiet)
    assert (root / "00001_img1.ppm").read_bytes() == b"img"


def test_tarball(tmp_path, quiet, monkeypatch):
    src = tmp_path / "src.tar.gz"
    with tarfile.open(src, "w:gz") as t:
        data = b"flowdata"
        info = tarfile.TarInfo("training/flow/0000.flo")
        info.size = len(data)
        t.addfile(info, io.BytesIO(data))
    monkeypatch.setitem(MANIFESTS, "testset", _manifest_for(tmp_path, src))
    root = ensure_dataset("testset", tmp_path / "data", progress=quiet)
    assert (root / "flow" / "0000.flo").read_bytes() == b"flowdata"


def test_zip_slip_rejected(tmp_path, quiet, monkeypatch):
    src = tmp_path / "evil.zip"
    _make_zip(src, {"../../escape.txt": b"pwn"})
    monkeypatch.setitem(MANIFESTS, "testset", _manifest_for(tmp_path, src))
    with pytest.raises(ValueError, match="unsafe archive member"):
        ensure_dataset("testset", tmp_path / "data", progress=quiet)
    assert not (tmp_path / "escape.txt").exists()


def test_checksum_mismatch(tmp_path, quiet, monkeypatch):
    src = tmp_path / "src.zip"
    _make_zip(src, {"training/a.txt": b"1"})
    monkeypatch.setitem(
        MANIFESTS, "testset",
        _manifest_for(tmp_path, src, sha256="0" * 64),
    )
    with pytest.raises(ValueError, match="checksum mismatch"):
        ensure_dataset("testset", tmp_path / "data", progress=quiet)
    # bad download was removed so a retry re-fetches
    assert not (tmp_path / "data" / "_downloads" / "src.zip").exists()


def test_checksum_match(tmp_path, quiet, monkeypatch):
    src = tmp_path / "src.zip"
    _make_zip(src, {"training/a.txt": b"1"})
    digest = hashlib.sha256(src.read_bytes()).hexdigest()
    monkeypatch.setitem(
        MANIFESTS, "testset", _manifest_for(tmp_path, src, sha256=digest)
    )
    root = ensure_dataset("testset", tmp_path / "data", progress=quiet)
    assert (root / "a.txt").exists()


def test_missing_no_download(tmp_path, quiet):
    with pytest.raises(FileNotFoundError, match="download=False"):
        ensure_dataset("kitti_2015", tmp_path, download=False, progress=quiet)


def test_registration_gated_dataset(tmp_path, quiet):
    with pytest.raises(FileNotFoundError, match="no direct URL"):
        ensure_dataset("synthia", tmp_path, progress=quiet)


def test_plain_file_archive(tmp_path, quiet, monkeypatch):
    # non-archive URLs (e.g. the FlyingChairs train/val split txt) are
    # copied verbatim into extract_into
    src = tmp_path / "split.txt"
    src.write_bytes(b"1\n2\n1\n")
    zsrc = tmp_path / "src.zip"
    _make_zip(zsrc, {"data/a.ppm": b"x"})
    m = DatasetManifest(
        name="testset",
        layout_root="testset/data",
        archives=(
            ArchiveSpec(url=zsrc.as_uri(), extract_into="testset"),
            ArchiveSpec(url=src.as_uri(), extract_into="testset"),
        ),
    )
    monkeypatch.setitem(MANIFESTS, "testset", m)
    ensure_dataset("testset", tmp_path / "data", progress=quiet)
    assert (tmp_path / "data" / "testset" / "split.txt").read_bytes() == b"1\n2\n1\n"


def test_every_real_manifest_is_wellformed():
    from unflow_tpu.data import DATASETS

    for name in DATASETS:
        assert name in MANIFESTS, f"dataset {name} has no bootstrap manifest"
        m = MANIFESTS[name]
        assert m.layout_root
        for spec in m.archives:
            assert spec.filename  # URL parses to a usable filename


def test_override_manifest(tmp_path, quiet):
    src = tmp_path / "mirror.zip"
    _make_zip(src, {"training/a.txt": b"mirrored"})
    orig = MANIFESTS["kitti_2012"]
    try:
        override_manifest(
            "kitti_2012",
            DatasetManifest(
                name="kitti_2012",
                layout_root="kitti_2012/training",
                archives=(ArchiveSpec(url=src.as_uri(),
                                      extract_into="kitti_2012"),),
            ),
        )
        root = ensure_dataset("kitti_2012", tmp_path / "data", progress=quiet)
        assert (root / "a.txt").read_bytes() == b"mirrored"
    finally:
        override_manifest("kitti_2012", orig)


def test_download_cli(tmp_path, monkeypatch, capsys):
    from unflow_tpu.cli.download import main

    src = tmp_path / "src.zip"
    _make_zip(src, {"training/a.txt": b"1"})
    monkeypatch.setitem(MANIFESTS, "testset", _manifest_for(tmp_path, src))
    rc = main(["testset", "--data-dir", str(tmp_path / "data")])
    assert rc == 0
    assert "ready at" in capsys.readouterr().out
