"""User config file loading: includes/excludes/default-excludes/matchers.

Re-expression of the reference's user config surface
(crates/model/src/config.rs:60-310 and
crates/model/src/config/default_excludes.rs:4-62):

- a YAML or JSON file (selected by extension; anything else is an error)
  holding either ONE target-config mapping ("static"), a LIST of
  ``{match_job, config}`` matcher entries, or nothing (empty → defaults);
- unknown keys are rejected (serde ``deny_unknown_fields`` parity);
- ``default_excludes: true`` (the default) appends the built-in exclude
  regex list to the user's ``excludes``;
- ``is_fp_valid`` strips a trailing ``.gz`` then requires an ``includes``
  match (when includes are given) and no ``excludes`` match;
- ``skip_duplicate`` defaults to true and is forced off by the
  ``LOGJUICER_KEEP_DUPLICATE`` environment variable (config.rs:168-172);
- matcher configs resolve first-match-wins against the target's job name
  (``MatcherConfig::matches``, config.rs:224-249); no match → defaults.

The loaded :class:`TargetConfig` converts into the engine's
:class:`~logjuicer_ray.config.PipelineConfig` via :meth:`to_pipeline_config`.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field

__all__ = [
    "DEFAULT_EXCLUDES",
    "TargetConfig",
    "UserConfig",
    "ConfigError",
    "load_config",
    "config_from_yaml_str",
]

# default_excludes.rs:4-62 — same predicate list (Rust regex and Python re
# agree on these patterns: plain suffixes and literal path fragments)
DEFAULT_EXCLUDES: tuple[str, ...] = (
    # binary data with known extension
    ".ico$", ".png$", ".clf$", ".tar.bzip2$", ".subunit$", ".sqlite$",
    ".db$", ".bin$", ".rpm$", ".pcap.log.txt$", ".pkl$", ".jar$", ".pyc$",
    # code
    ".py$", ".sh$",
    # font
    ".eot$", ".otf$", ".woff$", ".woff2$", ".ttf$",
    # config
    ".yaml$", ".ini$", ".conf$",
    # not relevant
    "job-output.json$", "zuul-manifest.json$", ".html$",
    "sos_commands/.*/(lsof|ps|journalctl|ls)_", "sos_commands/scsi",
    # binary data with known location
    "cacerts$", "local/creds$", "/authkey$", "mysql/tc.log.txt$",
    "log/.tmp$", "lib/systemd/systemd-coredump$", "os-diff/os-diff$",
    # swifts
    "object.builder$", "account.builder$", "container.builder$",
    # openshift
    "crio/pods/crictl_inspectp_", "crio/containers/crictl_inspect_",
    # system config
    "/etc/", "/proc/", "/sys/", "/usr/lib/", "/var/lib/selinux/", "/venv/",
    # hidden files
    "/\\.[a-zA-Z0-9]",
)


class ConfigError(ValueError):
    """Bad config file (unknown format / unknown keys / bad regex)."""


_TARGET_KEYS = {
    "includes", "excludes", "default_excludes", "skip_duplicate",
    "ignore_patterns", "extra_baselines",
}


def _compile_set(patterns: list[str]) -> re.Pattern | None:
    """RegexSet analog: one alternation; None when the set is empty (an
    empty alternation would match everything, the Rust RegexSet matches
    nothing)."""
    if not patterns:
        return None
    try:
        return re.compile("|".join(f"(?:{p})" for p in patterns))
    except re.error as e:  # Error::BadRegex
        raise ConfigError(f"bad regex: {e}") from e


@dataclass
class TargetConfig:
    """Loaded per-target config (TargetConfig, config.rs:133-222)."""

    includes: list[str] = field(default_factory=list)
    excludes: list[str] = field(default_factory=list)
    skip_duplicate: bool = True
    ignore_patterns: list[str] = field(default_factory=list)
    extra_baselines: list[str] = field(default_factory=list)

    def __post_init__(self):
        self._includes_re = _compile_set(self.includes)
        self._excludes_re = _compile_set(self.excludes)
        self._ignore_re = _compile_set(self.ignore_patterns)

    @classmethod
    def from_mapping(cls, m: dict) -> "TargetConfig":
        if not isinstance(m, dict):
            raise ConfigError(f"expected a mapping, got {type(m).__name__}")
        unknown = set(m) - _TARGET_KEYS
        if unknown:  # deny_unknown_fields
            raise ConfigError(f"unknown config keys: {sorted(unknown)}")
        excludes = list(m.get("excludes", []))
        if m.get("default_excludes", True):
            excludes = excludes + list(DEFAULT_EXCLUDES)
        skip_duplicate = bool(m.get("skip_duplicate", True))
        if os.environ.get("LOGJUICER_KEEP_DUPLICATE") is not None:
            skip_duplicate = False
        return cls(
            includes=list(m.get("includes", [])),
            excludes=excludes,
            skip_duplicate=skip_duplicate,
            ignore_patterns=list(m.get("ignore_patterns", [])),
            extra_baselines=list(m.get("extra_baselines", [])),
        )

    # --- predicates (config.rs:197-213) ----------------------------------
    def is_fp_valid(self, relative: str) -> bool:
        fp = relative[:-3] if relative.endswith(".gz") else relative
        if self._includes_re is not None and not self._includes_re.search(fp):
            return False
        return self._excludes_re is None or not self._excludes_re.search(fp)

    def is_ignored_line(self, line: str) -> bool:
        return self._ignore_re is not None and bool(self._ignore_re.search(line))

    def to_pipeline_config(self, **overrides):
        """Engine bridge: the loaded file config becomes the pipeline's
        ignore/dedup knobs (the includes/excludes act at the source filter,
        :func:`source_valid_filter`)."""
        from .config import PipelineConfig

        kw = dict(
            ignore_patterns=list(self.ignore_patterns),
            skip_duplicate=self.skip_duplicate,
        )
        kw.update(overrides)
        return PipelineConfig(**kw)


_DEFAULT_TARGET = TargetConfig.from_mapping({})


@dataclass
class UserConfig:
    """Static or matcher-list config (Config, config.rs:30-131)."""

    static: TargetConfig | None = None
    matchers: list[tuple[re.Pattern | None, TargetConfig]] = field(default_factory=list)

    @classmethod
    def from_obj(cls, obj) -> "UserConfig":
        if obj is None:  # ConfigFile::Empty
            return cls(static=TargetConfig.from_mapping({}))
        if isinstance(obj, dict):
            return cls(static=TargetConfig.from_mapping(obj))
        if isinstance(obj, list):
            if not obj:
                raise ConfigError("Target list is empty")
            matchers = []
            for entry in obj:
                if not isinstance(entry, dict) or set(entry) - {"match_job", "config"}:
                    raise ConfigError(f"bad matcher entry: {entry!r}")
                pat = entry.get("match_job")
                try:
                    rx = re.compile(pat) if pat is not None else None
                except re.error as e:
                    raise ConfigError(f"bad regex: {e}") from e
                matchers.append((rx, TargetConfig.from_mapping(entry.get("config") or {})))
            return cls(matchers=matchers)
        raise ConfigError(f"unsupported config shape: {type(obj).__name__}")

    def get_target_config(self, job_name: str) -> TargetConfig:
        """First matcher whose ``match_job`` matches wins; a matcher without
        ``match_job`` matches everything; no match → built-in defaults
        (Config::get_target_config, config.rs:108-119)."""
        if self.static is not None:
            return self.static
        for rx, tc in self.matchers:
            if rx is None or rx.search(job_name):
                return tc
        return _DEFAULT_TARGET

    def test_target_config(self, job_name: str) -> tuple[int, TargetConfig] | None:
        """Debug helper (config.rs:122-131): matcher position, or None."""
        if self.static is not None:
            return (0, self.static)
        for pos, (rx, tc) in enumerate(self.matchers):
            if rx is None or rx.search(job_name):
                return (pos, tc)
        return None


def load_config(path: str) -> UserConfig:
    """Load a ``.yaml`` / ``.json`` config file (extension-dispatched,
    Config::from_reader, config.rs:70-84)."""
    ext = os.path.splitext(path)[1].lower()
    with open(path, "r", encoding="utf-8") as f:
        raw = f.read()
    if ext == ".yaml":
        import yaml

        try:
            obj = yaml.safe_load(raw)
        except yaml.YAMLError as e:
            raise ConfigError(f"invalid yaml: {e}") from e
    elif ext == ".json":
        try:
            obj = json.loads(raw) if raw.strip() else None
        except json.JSONDecodeError as e:
            raise ConfigError(f"invalid json: {e}") from e
    else:
        raise ConfigError(f"unknown format: {ext.lstrip('.')}")
    return UserConfig.from_obj(obj)


def config_from_yaml_str(s: str) -> UserConfig:
    """Test helper (Config::test_from_yaml, config.rs:65-67)."""
    import yaml

    try:
        obj = yaml.safe_load(s)
    except yaml.YAMLError as e:
        raise ConfigError(f"invalid yaml: {e}") from e
    return UserConfig.from_obj(obj)


def source_valid_filter(ds, target_config: TargetConfig, *, path_col: str = "conv_id"):
    """Dataset-level ``is_source_valid`` (config.rs:207-209): keep rows whose
    path column passes the includes/excludes predicate.  Vectorized: the
    filter evaluates once per distinct path value per batch."""
    import pyarrow as pa

    def f(batch: pa.Table) -> pa.Table:
        col = batch.column(path_col)
        # conv-grained predicate: evaluate once per distinct value
        uniq = col.unique()
        verdict = {v.as_py(): target_config.is_fp_valid(v.as_py()) for v in uniq}
        mask = pa.array([verdict[v] for v in col.to_pylist()], pa.bool_())
        return batch.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")
