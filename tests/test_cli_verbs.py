"""Tests for the round-4 CLI verb surface: the reference's remaining
main.rs subcommands re-expressed over the Ray engine.

Covers (crates/cli/src/main.rs Commands enum):
- zuul-build (main.rs:255-283 / model.rs:344-355): in-CI mode — local
  log_root target, API-discovered baseline, all offline via --mirror.
- download-logs (downloader.rs:21-37)
- check-model (main.rs:285-320)
- read-report / filter-report (main.rs:707-719, filter.rs:150-166)
- http-ls (main.rs:329-333)
- debug-groups / debug-tokenizer / debug-indexname / debug-model /
  debug-config (main.rs DebugGroups/DebugTokenizer/DebugIndexname/
  DebugModel/DebugConfig)
"""

import json
import os
from urllib.parse import urlencode

import pytest

from logjuicer_ray.cli import main
from logjuicer_ray.synth import ensure_turns


def _write(path: str, data) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    mode = "wb" if isinstance(data, bytes) else "w"
    with open(path, mode) as f:
        f.write(data)


# ---------------------------------------------------------------------------
# saved-report verbs


@pytest.fixture(scope="module")
def saved_report(ray_session, tmp_path_factory):
    """One report run shared by read-report / filter-report / check-model."""
    root = tmp_path_factory.mktemp("cliverbs")
    path = ensure_turns(0.0003)
    out = root / "rep"
    model = root / "model"
    rc = main(["report", "--input", path, "--out", str(out), "--quiet",
               "--model", str(model)])
    assert rc == 0
    return {"out": str(out), "model": str(model), "input": path}


def test_read_report(saved_report, capsys):
    rc = main(["read-report", saved_report["out"]])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    counts = json.loads(lines[-1])
    assert counts["anomalies"] > 0 and counts["reports"] >= 1
    # anomaly lines are printed above the summary
    assert len(lines) > 1


def test_read_report_missing_dir(tmp_path):
    os.makedirs(tmp_path / "empty", exist_ok=True)
    assert main(["read-report", str(tmp_path / "empty"), "--quiet"]) == 1


def test_filter_report_self_drops_everything(saved_report, tmp_path, capsys):
    """Filtering a report against itself keeps nothing (every anomaly
    line is in the baseline index by construction, filter.rs:34-70)."""
    out = tmp_path / "filtered"
    rc = main(["filter-report", "--baselines", saved_report["out"],
               "--target-report", saved_report["out"], "--out", str(out)])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["kept"] == 0 and res["dropped"] > 0
    manifest = json.loads((out / "anomalies" / "manifest.json").read_text())
    assert manifest["rows"] == 0


def test_filter_report_unrelated_baseline_keeps_everything(
    saved_report, tmp_path, capsys
):
    """A baseline report with no overlapping groups keeps every target
    anomaly (no index for the group -> keep, filter.rs:150-166)."""
    # fabricate an empty baseline report (no anomalies parquet rows)
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from logjuicer_ray.pipelines.report import load_report
    from logjuicer_ray.sinks import write_sink

    target = load_report(saved_report["out"])
    schema = pa.schema(
        zip(target["anomalies"].schema().names, target["anomalies"].schema().types)
    )
    base_dir = tmp_path / "baseline_rep"
    write_sink(
        rd.from_arrow(schema.empty_table()),
        str(base_dir / "anomalies"),
        inputs=["synthetic"],
    )
    out = tmp_path / "filtered2"
    rc = main(["filter-report", "--baselines", str(base_dir),
               "--target-report", saved_report["out"], "--out", str(out)])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["dropped"] == 0 and res["kept"] > 0
    # output parquet round-trips with the same schema
    filt = load_report(str(out))
    assert filt["anomalies"].count() == res["kept"]


def test_check_model(saved_report, capsys):
    assert main(["check-model", "--model", saved_report["model"]]) == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["groups"] and all(v > 0 for v in info["groups"].values())
    # stale by age -> exit 1 (main.rs:302-313)
    assert main(["check-model", "--model", saved_report["model"],
                 "--max-age", "1e-9", "--quiet"]) == 1
    # fresh enough -> 0
    assert main(["check-model", "--model", saved_report["model"],
                 "--max-age", "365", "--quiet"]) == 0


def test_check_model_invalid_dir(tmp_path):
    assert main(["check-model", "--model", str(tmp_path / "nope"),
                 "--quiet"]) == 1


def test_debug_model_alias(saved_report, capsys):
    assert main(["debug-model", "--model", saved_report["model"]]) == 0
    assert "groups" in capsys.readouterr().out


def test_debug_groups(ray_session, capsys):
    path = ensure_turns(0.0003)
    assert main(["debug-groups", "--target", path]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    parsed = dict(line.rsplit(": ", 1) for line in out)
    assert "assistant/bash" in parsed
    assert all(int(v) > 0 for v in parsed.values())


# ---------------------------------------------------------------------------
# stateless debug verbs


def test_debug_iterator(ray_session, tmp_path, capsys):
    import gzip

    d = tmp_path / "logs"
    os.makedirs(d)
    (d / "a.log").write_text("first line\nsecond line\n")
    with gzip.open(d / "b.log.gz", "wt") as f:
        f.write("zipped line\n")
    assert main(["debug-iterator", str(d)]) == 0
    out = capsys.readouterr().out
    assert f"[{d}/a.log]" in out and "0 | first line" in out
    assert "1 | second line" in out and "0 | zipped line" in out


def test_debug_tokenizer(capsys):
    assert main(["debug-tokenizer", "error at 10:00:00 id=0xdeadbeef"]) == 0
    out = capsys.readouterr().out
    assert "error" in out and "0xdeadbeef" not in out


def test_debug_indexname(capsys):
    assert main(["debug-indexname", "controller/logs/job-output.txt.gz"]) == 0
    assert capsys.readouterr().out.strip() == "controller/job-output"


def test_debug_config(tmp_path, capsys):
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps(
        [{"match_job": "tripleo",
          "config": {"ignore_patterns": ["DEBUG"], "excludes": ["\\.special$"]}}]
    ))
    assert main(["debug-config", "--config", str(cfg), "tripleo-ci",
                 "logs/app.special", "a DEBUG line"]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res == {"file_valid": False, "line_ignored": True}
    # non-matching job falls back to defaults: line not ignored
    assert main(["debug-config", "--config", str(cfg), "other",
                 "logs/app.special", "a DEBUG line"]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["line_ignored"] is False and res["file_valid"] is True


# ---------------------------------------------------------------------------
# mirror-served remote verbs (no network)


@pytest.fixture()
def httpdir_mirror(tmp_path):
    root = str(tmp_path / "mirror")
    base = os.path.join(root, "logs.example.com", "job", "7")
    _write(os.path.join(base, "job-output.txt"), "line one\nline two\n")
    _write(os.path.join(base, "sub", "deep.log"), "deep\n")
    _write(os.path.join(base, "etc", "passwd"), "root:x:0:0\n")
    return root


def test_http_ls(httpdir_mirror, capsys):
    rc = main(["http-ls", "http://logs.example.com/job/7/",
               "--mirror", httpdir_mirror])
    assert rc == 0
    urls = capsys.readouterr().out.strip().splitlines()
    assert "http://logs.example.com/job/7/job-output.txt" in urls
    assert "http://logs.example.com/job/7/sub/deep.log" in urls
    # /etc/ is excluded by the crawler (httpdir.rs dir excludes)
    assert not any("/etc/" in u for u in urls)


def test_download_logs(httpdir_mirror, tmp_path, capsys):
    dest = tmp_path / "dl"
    rc = main(["download-logs", str(dest), "http://logs.example.com/job/7/",
               "--mirror", httpdir_mirror, "--quiet"])
    assert rc == 0
    assert (dest / "job-output.txt").read_text() == "line one\nline two\n"
    assert (dest / "sub" / "deep.log").read_text() == "deep\n"


# ---------------------------------------------------------------------------
# zuul-build: in-CI mode, fully offline


def test_zuul_build_end_to_end(ray_session, tmp_path, capsys):
    log_root = tmp_path / "logroot"
    _write(str(log_root / "zuul-info" / "inventory.yaml"), (
        "all:\n  vars:\n    zuul:\n"
        "      tenant: main\n"
        "      build: " + "f" * 32 + "\n"
        "      job: tox-py311\n"
        "      project:\n        name: acme/widget\n"
        "      branch: main\n"
        "      pipeline: check\n"
        "      change_url: https://review.example.org/7777\n"
    ))
    target_lines = [f"2024-04-02 10:00:{i:02d} INFO step {i} ok" for i in range(40)]
    target_lines.insert(20, "2024-04-02 10:00:20 ERROR everything broke badly here")
    _write(str(log_root / "job-output.txt"), "\n".join(target_lines) + "\n")

    mirror = tmp_path / "mirror"
    base_lines = [f"2024-04-01 10:00:{i:02d} INFO step {i} ok" for i in range(40)]
    _write(str(mirror / "logs.example.com" / "job" / "6" / "job-output.txt"),
           "\n".join(base_lines) + "\n")
    q = "builds?" + urlencode([
        ("project", "acme/widget"), ("job_name", "tox-py311"),
        ("complete", "true"), ("limit", "500"), ("result", "SUCCESS"),
    ])
    candidate = {
        "uuid": "b" * 32, "job_name": "tox-py311", "result": "SUCCESS",
        "start_time": "2024-04-01T10:00:00", "end_time": "2024-04-01T10:10:00",
        "duration": 600.0, "voting": True,
        "log_url": "http://logs.example.com/job/6/",
        "ref_url": "https://review.example.org/1234", "artifacts": [],
        "project": "acme/widget", "branch": "main", "pipeline": "gate",
        "change": 1234, "patchset": "2", "ref": "refs/changes/34/1234/2",
    }
    _write(str(mirror / "zuul.example.com" / "api" / "tenant" / "main" / q),
           json.dumps([candidate]))

    out = tmp_path / "out"
    rc = main(["zuul-build", str(log_root),
               "--api-url", "http://zuul.example.com/",
               "--mirror", str(mirror), "--out", str(out), "--quiet"])
    assert rc == 0
    summary = json.loads((out / "summary.json").read_text())
    assert summary["baselines"] == ["b" * 32]
    assert summary["sinks"]["anomalies"] > 0
    # the planted ERROR line must be among the anomalies
    import glob

    import pyarrow.parquet as pq
    anom = pq.read_table(
        glob.glob(str(out / "anomalies" / "*.parquet"))
    ).to_pandas()
    assert anom["text"].str.contains("everything broke badly").any()


def test_zuul_build_no_baseline_exits(ray_session, tmp_path):
    log_root = tmp_path / "logroot"
    _write(str(log_root / "zuul-info" / "inventory.yaml"), (
        "all:\n  vars:\n    zuul:\n"
        "      tenant: main\n"
        "      build: " + "f" * 32 + "\n"
        "      job: tox-py311\n"
        "      project:\n        name: acme/widget\n"
        "      branch: main\n"
        "      pipeline: check\n"
        "      change_url: https://review.example.org/7777\n"
    ))
    mirror = tmp_path / "mirror"
    os.makedirs(mirror, exist_ok=True)
    with pytest.raises(SystemExit):
        main(["zuul-build", str(log_root),
              "--api-url", "http://zuul.example.com/",
              "--mirror", str(mirror), "--out", str(tmp_path / "o"), "--quiet"])
