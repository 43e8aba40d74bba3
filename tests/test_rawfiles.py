"""Local raw-file / directory inputs (crates/model/src/files.rs) —
dir walk with hidden/symlink skip, per-file suffix dispatch, rotated
``.0`` baseline discovery, CLI end-to-end."""

import gzip
import json
import os

import pytest

from logjuicer_ray.sources.rawfiles import (
    read_file_lines,
    rotated_baseline_path,
    walk_files,
)


def _write(path, data):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    mode = "wb" if isinstance(data, bytes) else "w"
    with open(path, mode) as f:
        f.write(data)


def test_walk_files_skips_hidden_and_symlinks(tmp_path):
    root = str(tmp_path)
    _write(os.path.join(root, "a.log"), "x\n")
    _write(os.path.join(root, "sub", "b.log"), "y\n")
    _write(os.path.join(root, ".hidden.log"), "z\n")
    _write(os.path.join(root, ".git", "c.log"), "w\n")
    os.symlink(os.path.join(root, "a.log"), os.path.join(root, "link.log"))
    assert walk_files(root) == [
        os.path.join(root, "a.log"),
        os.path.join(root, "sub", "b.log"),
    ]


def test_rotated_baseline_path(tmp_path):
    target = str(tmp_path / "service.log")
    _write(target, "x\n")
    assert rotated_baseline_path(target) is None
    _write(target + ".0", "x\n")
    assert rotated_baseline_path(target) == target + ".0"


def test_read_file_lines_dir(ray_session, tmp_path):
    root = str(tmp_path / "logs")
    _write(os.path.join(root, "app.log"), "one\ntwo\n")
    _write(os.path.join(root, "svc", "db.log.gz"), gzip.compress(b"three\n"))
    ds = read_file_lines(root)
    rows = sorted((r["conv_id"], r["turn_idx"], r["text"]) for r in ds.take_all())
    assert rows == [
        (os.path.join(root, "app.log"), 0, "one"),
        (os.path.join(root, "app.log"), 1, "two"),
        (os.path.join(root, "svc", "db.log.gz"), 0, "three"),
    ]
    # group key comes from the RELATIVE path (IndexName)
    tools = {r["tool"] for r in ds.take_all()}
    assert tools == {"app.log", "log"}  # index_name_from_path of the rel paths


def test_read_file_lines_single_file_and_cap(ray_session, tmp_path):
    p = str(tmp_path / "big.log")
    _write(p, ("x" * 50 + "\n") * 100)
    df = read_file_lines(p, max_entry_bytes=510).to_pandas()
    assert 0 < len(df) <= 10
    assert (df["text"].str.len() == 50).all()  # no torn line


def test_read_file_lines_prunes_with_config(ray_session, tmp_path):
    from logjuicer_ray.config_file import TargetConfig

    root = str(tmp_path / "logs")
    _write(os.path.join(root, "keep.log"), "k\n")
    _write(os.path.join(root, "skip.png"), "p\n")
    tc = TargetConfig.from_mapping({})
    ds = read_file_lines(root, target_config=tc)
    assert [r["text"] for r in ds.take_all()] == ["k"]


def test_cli_report_rotated_baseline(ray_session, tmp_path):
    from logjuicer_ray.cli import main

    good = "".join(f"request {i} served from cache shard {i % 4}\n" for i in range(50))
    target = str(tmp_path / "service.log")
    _write(target + ".0", good)
    _write(target, good + "segfault in worker thread while parsing frame\n")
    out = str(tmp_path / "out")
    rc = main(["report", "--target", target, "--out", out, "--quiet"])
    assert rc == 0
    summary = json.load(open(os.path.join(out, "summary.json")))
    assert summary["sinks"]["anomalies"] >= 1

    # no rotated sibling and no --baseline: a clear error
    lone = str(tmp_path / "alone.log")
    _write(lone, "hello world again\n")
    with pytest.raises(SystemExit, match="no baseline"):
        main(["report", "--target", lone, "--out", str(tmp_path / "out2"), "--quiet"])


def test_cli_report_raw_dirs(ray_session, tmp_path):
    from logjuicer_ray.cli import main

    good = "".join(f"scheduler tick {i} completed normally\n" for i in range(50))
    base = str(tmp_path / "good")
    tgt = str(tmp_path / "fail")
    _write(os.path.join(base, "job-output.txt"), good)
    _write(os.path.join(tgt, "job-output.txt"),
           good + "Traceback (most recent call last): boom\n")
    out = str(tmp_path / "out")
    rc = main(["report", "--baseline", base, "--target", tgt, "--out", out, "--quiet"])
    assert rc == 0
    summary = json.load(open(os.path.join(out, "summary.json")))
    assert summary["sinks"]["anomalies"] >= 1
