"""Tarball source (source.rs:95-160 analog): entry enumeration, per-entry
gz/xz decompression, nested tarball recursion, is_fp_valid filtering, both
parallelism modes (plain-tar byte ranges, compressed streaming), and an
end-to-end train-on-good.tar / report-on-fail.tar run.
"""

import gzip
import io
import lzma
import os
import tarfile

import pytest


def _add(tf, name, data: bytes):
    info = tarfile.TarInfo(name)
    info.size = len(data)
    tf.addfile(info, io.BytesIO(data))


def _make_archive(path, entries, mode="w"):
    with tarfile.open(path, mode) as tf:
        for name, data in entries:
            _add(tf, name, data)


GOOD_LINES = [
    f"service check {i} completed status ok latency {i % 7} ms"
    for i in range(40)
]
FAIL_LINES = GOOD_LINES[:20] + [
    "kernel panic unable to mount root filesystem on device",
] + GOOD_LINES[20:]


@pytest.fixture()
def archives(tmp_path):
    base = str(tmp_path)
    inner = io.BytesIO()
    with tarfile.open(fileobj=inner, mode="w") as tf:
        _add(tf, "deep/app.log", b"nested line one\nnested line two\n")
    _make_archive(
        os.path.join(base, "good.tar"),
        [
            ("logs/service.log", "\n".join(GOOD_LINES).encode()),
            ("logs/zuul-info.log.gz", gzip.compress(b"gz line alpha\ngz line beta\n")),
            ("logs/compressed.xz", lzma.compress(b"xz line gamma\n")),
            ("logs/inner.tar", inner.getvalue()),
            ("logs/skipme.pyc", b"binary junk"),
        ],
    )
    _make_archive(
        os.path.join(base, "fail.tar.gz"),
        [("logs/service.log", "\n".join(FAIL_LINES).encode())],
        mode="w:gz",
    )
    return base


def test_is_tarball_path():
    from logjuicer_ray.sources.archives import is_tarball_path

    assert is_tarball_path("a/b.tar")
    assert is_tarball_path("a.tar.gz") and is_tarball_path("a.tgz")
    assert is_tarball_path("a.tar.xz")
    assert not is_tarball_path("a.log.gz") and not is_tarball_path("a.txt")


def test_plain_tar_entries_and_urls(ray_session, archives):
    from logjuicer_ray.sources.archives import read_archive_lines

    tar = os.path.join(archives, "good.tar")
    df = read_archive_lines(tar).to_pandas()
    convs = sorted(df["conv_id"].unique())
    assert f"{tar}?entry=logs/service.log" in convs
    assert f"{tar}?entry=logs/zuul-info.log.gz" in convs
    assert f"{tar}?entry=logs/compressed.xz" in convs
    # nested tarball recursed with &sub= urls (source.rs:142-147)
    assert f"{tar}?entry=logs/inner.tar&sub=deep/app.log" in convs
    svc = df[df["conv_id"].str.endswith("service.log")]
    assert list(svc["text"]) == GOOD_LINES
    assert list(svc["turn_idx"]) == list(range(len(GOOD_LINES)))
    gz = df[df["conv_id"].str.endswith("zuul-info.log.gz")]
    assert list(gz["text"]) == ["gz line alpha", "gz line beta"]
    nested = df[df["conv_id"].str.contains("&sub=")]
    assert list(nested["text"]) == ["nested line one", "nested line two"]
    # grouping: tool = IndexName of the ENTRY path, role = "file"
    assert set(df["role"]) == {"file"}
    assert (svc["tool"] == "logs/service.log").all() or svc["tool"].nunique() == 1


def test_compressed_tar_streaming_matches_plain(ray_session, archives):
    from logjuicer_ray.sources.archives import read_archive_lines

    df = read_archive_lines(os.path.join(archives, "fail.tar.gz")).to_pandas()
    assert len(df) == len(FAIL_LINES)
    assert list(df.sort_values("turn_idx")["text"]) == FAIL_LINES


def test_fp_valid_filters_entries(ray_session, archives):
    from logjuicer_ray.config_file import TargetConfig
    from logjuicer_ray.sources.archives import read_archive_lines

    tc = TargetConfig.from_mapping({"excludes": ["service"]})
    df = read_archive_lines(
        os.path.join(archives, "good.tar"), target_config=tc
    ).to_pandas()
    assert not df["conv_id"].str.contains("service.log").any()
    # default_excludes drop the .pyc member in BOTH runs
    assert not df["conv_id"].str.contains("skipme").any()
    df_all = read_archive_lines(os.path.join(archives, "good.tar")).to_pandas()
    # with no config nothing is filtered (the CLI passes the config)
    assert df_all["conv_id"].str.contains("skipme").any()


def test_directory_of_tarballs(ray_session, archives):
    from logjuicer_ray.sources.archives import read_archive_lines

    df = read_archive_lines(archives).to_pandas()
    assert df["conv_id"].str.contains("good.tar").any()
    assert df["conv_id"].str.contains("fail.tar.gz").any()


def test_entry_cap_drops_tail_at_line_boundary(ray_session, tmp_path):
    from logjuicer_ray.sources.archives import read_archive_lines

    tar = str(tmp_path / "big.tar")
    line = b"x" * 100 + b"\n"
    _make_archive(tar, [("big.log", line * 1000)])
    df = read_archive_lines(tar, max_entry_bytes=1010).to_pandas()
    assert 0 < len(df) <= 10
    assert (df["text"].str.len() == 100).all()  # no torn line


def test_cli_report_over_tarballs(ray_session, archives, tmp_path):
    from logjuicer_ray.cli import main

    out = str(tmp_path / "out")
    rc = main(
        [
            "report",
            "--baseline", os.path.join(archives, "good.tar"),
            "--target", os.path.join(archives, "fail.tar.gz"),
            "--out", out,
            "--quiet",
        ]
    )
    assert rc == 0
    import json

    summary = json.load(open(os.path.join(out, "summary.json")))
    assert summary["sinks"]["anomalies"] >= 1
    import pyarrow.parquet as pq

    from logjuicer_ray.sinks import read_manifest

    man = read_manifest(os.path.join(out, "anomalies"))
    tables = [
        pq.read_table(os.path.join(out, "anomalies", p["file"]))
        for p in man["partitions"]
    ]
    import pyarrow as pa

    anom = pa.concat_tables(tables).to_pandas()
    assert anom["text"].str.contains("kernel panic").any()


def test_dataset_harness_accepts_tarball_pairs(ray_session, tmp_path):
    """A conformance dataset dir whose .good/.fail are tarballs runs the
    same train/report/expect flow as plain text fixtures."""
    import yaml

    from logjuicer_ray.dataset_test import run_dataset_dir

    d = tmp_path / "tar-dataset"
    d.mkdir()
    _make_archive(
        str(d / "svc.good.tar"),
        [("logs/service.log", "\n".join(GOOD_LINES).encode())],
    )
    _make_archive(
        str(d / "svc.fail.tar.gz"),
        [("logs/service.log", "\n".join(FAIL_LINES).encode())],
        mode="w:gz",
    )
    (d / "inf.yaml").write_text(yaml.safe_dump({
        "anomalies": [{"line": "kernel panic unable to mount root"}],
    }))
    res = run_dataset_dir(str(d))
    assert res.ok, res.message
    # a wrong expectation must fail loudly
    (d / "inf.yaml").write_text(yaml.safe_dump({
        "anomalies": [{"line": "this line is not in the data"}],
    }))
    assert not run_dataset_dir(str(d)).ok
