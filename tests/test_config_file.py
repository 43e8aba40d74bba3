"""User config file loading — mirrors the reference's config tests
(crates/model/src/config.rs:312-436) plus the default-excludes check
(config.rs:312-330)."""

import json

import pytest

from logjuicer_ray.config_file import (
    ConfigError,
    config_from_yaml_str,
    load_config,
)


def check(config, path: str) -> bool:
    return config.get_target_config("test").is_fp_valid(path)


def test_config_default_exclude():
    # config.rs:312-330
    config = config_from_yaml_str("")
    for src in [
        "config.yaml",
        "/config/.git/HEAD",
        "font.ttf.gz",
        "/system/etc/conf",
        "blah/sos_commands/selinux/ps_auxZww",
        "blurp/sos_commands/process/ps_alxwww",
        "foo/sos_commands/process/ps_-elfL",
    ]:
        assert check(config, src) is False, src


def test_config_default():
    # config.rs:330-337
    config = config_from_yaml_str("")
    for src in ["service/api.log", "job-output.txt"]:
        assert check(config, src) is True, src


def test_config_include():
    # config.rs:350-363
    config = config_from_yaml_str(
        """
includes:
  - undercloud/deploy.log
"""
    )
    assert check(config, "service/api.log") is False
    assert check(config, "undercloud/deploy.log") is True
    assert check(config, "undercloud/deploy.log.log") is True
    assert check(config, "undercloud/deploy.log.png") is False


def test_config_exclude():
    # config.rs:365-376
    config = config_from_yaml_str(
        """
excludes:
  - bzImage
"""
    )
    assert check(config, "deploy/bzImage.gz") is False
    assert check(config, "test.png") is False
    assert check(config, "undercloud/deploy.log") is True


def test_config_no_default():
    # config.rs:378-390
    config = config_from_yaml_str(
        """
default_excludes: false
excludes:
  - bzImage
"""
    )
    assert check(config, "test.png") is True
    assert check(config, "/.git/config") is True
    assert check(config, "boot/bzImage") is False


def test_config_bad(tmp_path):
    # config.rs:392-411 — unknown keys rejected in both formats
    with pytest.raises(ConfigError):
        config_from_yaml_str("unknown: true")
    p = tmp_path / "config.json"
    p.write_text(json.dumps({"unknown": True}))
    with pytest.raises(ConfigError):
        load_config(str(p))


def test_config_unknown_format(tmp_path):
    p = tmp_path / "config.toml"
    p.write_text("x = 1")
    with pytest.raises(ConfigError):
        load_config(str(p))


def test_config_match():
    # config.rs:413-436
    config = config_from_yaml_str(
        """
- match_job: config-.*
  config: {}
- match_job: linters
  config:
    ignore_patterns:
    - fetch log
"""
    )
    # the reference probes with Content::sample_job(name), whose job name is
    # "{name}-job" (report.rs:313-318)
    def target_config(name):
        return config.test_target_config(f"{name}-job")

    assert target_config("proj-linters") is not None
    assert target_config("config-check") is not None
    assert target_config("unit") is None

    patterns = target_config("linters")[1]
    assert patterns.is_ignored_line("- task: fetch log")
    assert not patterns.is_ignored_line("traceback")

    no_patterns = target_config("config")[1]
    assert not no_patterns.is_ignored_line("- task: fetch log")
    assert not no_patterns.is_ignored_line("traceback")


def test_empty_matcher_list_rejected():
    with pytest.raises(ConfigError):
        config_from_yaml_str("[]")


def test_keep_duplicate_env(monkeypatch):
    # LOGJUICER_KEEP_DUPLICATE forces skip_duplicate off (config.rs:168-172)
    monkeypatch.setenv("LOGJUICER_KEEP_DUPLICATE", "1")
    config = config_from_yaml_str("skip_duplicate: true")
    assert config.get_target_config("x").skip_duplicate is False
    monkeypatch.delenv("LOGJUICER_KEEP_DUPLICATE")
    config = config_from_yaml_str("skip_duplicate: true")
    assert config.get_target_config("x").skip_duplicate is True


def test_yaml_and_json_file_loading(tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text("excludes:\n  - bzImage\n")
    cfg = load_config(str(y))
    assert check(cfg, "a/bzImage") is False

    j = tmp_path / "c.json"
    j.write_text(json.dumps({"includes": ["keep.log"], "default_excludes": False}))
    cfg = load_config(str(j))
    assert check(cfg, "keep.log") is True
    assert check(cfg, "other.log") is False


def test_to_pipeline_config():
    config = config_from_yaml_str(
        """
ignore_patterns:
  - "^DEBUG"
skip_duplicate: false
"""
    )
    pc = config.get_target_config("x").to_pipeline_config(sorted_input=True)
    assert pc.skip_duplicate is False
    assert pc.sorted_input is True
    assert pc.ignored_fn()("DEBUG noisy line") is True
    assert pc.ignored_fn()("INFO fine") is False


def test_source_valid_filter_dataset(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from logjuicer_ray.config_file import source_valid_filter

    config = config_from_yaml_str("excludes:\n  - noisy\n")
    tc = config.get_target_config("job")
    ds = rd.from_arrow(
        pa.table(
            {
                "conv_id": ["a/keep.log", "a/noisy.log", "b/keep.log", "x.png"],
                "text": ["1", "2", "3", "4"],
            }
        )
    )
    out = source_valid_filter(ds, tc).to_pandas()
    assert sorted(out["conv_id"]) == ["a/keep.log", "b/keep.log"]
