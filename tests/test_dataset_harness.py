"""Dataset conformance harness tests (cli/src/dataset.rs:17-135 analog):
good/fail dirs with expected-anomaly substrings under
``tests/data/datasets/``."""

import glob
import os

import pytest

from logjuicer_ray.dataset_test import load_inf, run_dataset_dir
from logjuicer_ray.dataset_test import test_datasets as validate_datasets

DATA = os.path.join(os.path.dirname(__file__), "data", "datasets")
DIRS = sorted(d for d in glob.glob(os.path.join(DATA, "*")) if os.path.isdir(d))


def test_fixture_dirs_exist():
    assert len(DIRS) >= 15


def test_matcher_config_drives_the_run(ray_session):
    """The matcher-ignore dataset passes ONLY because its config.yaml's
    second matcher (match_job: "matcher-.*") injects ignore_patterns —
    with the built-in default config the noisy cache-stats / heartbeat
    lines are extra anomalies and the expectation fails (config.rs:224-310
    per-job matcher analog)."""
    from logjuicer_ray.config import PipelineConfig

    path = os.path.join(DATA, "matcher-ignore")
    assert run_dataset_dir(path).ok
    res_default = run_dataset_dir(path, PipelineConfig())
    assert not res_default.ok
    assert "Expect" in res_default.message or "Expected" in res_default.message


def test_matcher_selection_order():
    """First matching entry wins; non-matching match_job entries are
    skipped; the catch-all tail matches any job."""
    from logjuicer_ray.config_file import load_config

    uc = load_config(os.path.join(DATA, "matcher-ignore", "config.yaml"))
    tc = uc.get_target_config("matcher-ignore")
    assert "cache stats hit ratio" in tc.ignore_patterns
    other = uc.get_target_config("some-other-job")
    assert other.ignore_patterns == []
    assert other.skip_duplicate is False  # the catch-all entry


def test_load_inf():
    inf = load_inf(os.path.join(DATA, "traceback"))
    assert inf["skip"] is False
    assert inf["anomalies"][0].startswith("Traceback")
    assert load_inf(os.path.join(DATA, "skipped"))["skip"] is True


@pytest.mark.parametrize("path", DIRS, ids=[os.path.basename(d) for d in DIRS])
def test_dataset_dir(ray_session, path):
    res = run_dataset_dir(path)
    assert res.ok, res.message


def test_datasets_counts(ray_session, capsys):
    failures = validate_datasets(DIRS)
    assert failures == 0
    out = capsys.readouterr().out
    n_active = sum(1 for d in DIRS if not load_inf(d)["skip"])
    assert f"{n_active} tests succeeded" in out
    assert "-> Skipped" in out


def test_dataset_failure_detected(ray_session, tmp_path):
    # a dataset whose inf.yaml expects an anomaly that never appears
    d = tmp_path / "broken"
    d.mkdir()
    (d / "x.good").write_text("INFO all fine here\nINFO still fine\n")
    (d / "x.fail").write_text("INFO all fine here\nERROR kaboom now\n")
    (d / "inf.yaml").write_text('anomalies:\n  - line: "some other error"\n')
    res = run_dataset_dir(str(d))
    assert not res.ok
    assert "Expected" in res.message


def test_dataset_count_mismatch(ray_session, tmp_path):
    d = tmp_path / "count"
    d.mkdir()
    (d / "x.good").write_text("INFO all fine here\nINFO still fine\n")
    (d / "x.fail").write_text("INFO all fine here\nERROR kaboom now\n")
    (d / "inf.yaml").write_text("anomalies: []\n")
    res = run_dataset_dir(str(d))
    assert not res.ok
    assert "miss-match" in res.message


def test_cli_test_verb(ray_session, capsys):
    from logjuicer_ray.cli import cmd_test

    class A:
        num_cpus = None
        quiet = False
        paths = DIRS
        ignore_pattern = None
        keep_duplicate = False
        config = None
        job_name = ""

    assert cmd_test(A()) == 0
