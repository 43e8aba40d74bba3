"""Dataset conformance harness — the ``logjuicer test DIR...`` analog
(crates/cli/src/dataset.rs:17-135).

A dataset directory holds one ``*.good`` file (baseline lines), one
``*.fail`` file (target lines) and an ``inf.yaml``:

.. code-block:: yaml

    anomalies:
      - line: "substring expected inside anomaly i"
    skip: false

Semantics (dataset.rs:80-135): train a model on the good file, score the
fail file, then (1) each expected line must be contained in the matching
anomaly (in report order) and (2) the anomaly count must equal the expected
count.  ``skip: true`` marks the dataset as skipped.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow as pa

__all__ = [
    "DatasetResult",
    "lines_dataset",
    "load_inf",
    "run_dataset_dir",
    "test_datasets",
]


@dataclass
class DatasetResult:
    path: str
    ok: bool
    skipped: bool = False
    message: str = ""


def lines_dataset(path: str, *, conv_id: str | None = None, role: str = "file",
                  tool: str = ""):
    """A text file of lines → a turns-schema Dataset (one turn per line,
    line number = turn_idx) — the open_raw_source / LinesIterator analog
    for local files, with the reference's format-aware framing by suffix
    (BytesLines sub-line/ansible/JSON/XML splitting + 6000-B drop,
    iterator.rs:150-346 via sources/linesplit.py)."""
    import ray.data as rd

    from .sources.archives import _decompress_member
    from .sources.linesplit import file_type_for, split_log_text

    with open(path, "rb") as f:
        raw = f.read()
    # per-file .gz/.xz decompress like the raw-file ingest (reader.rs
    # from_path suffix dispatch); format dispatch keeps the FULL name so
    # ".json.gz" still frames as JSON (source.rs:37-41)
    data = _decompress_member(path, raw)
    lines = split_log_text(data, file_type=file_type_for(path))
    n = len(lines)
    table = pa.table(
        {
            "conv_id": pa.array([conv_id or os.path.basename(path)] * n, pa.string()),
            "turn_idx": pa.array(range(n), pa.int64()),
            "role": pa.array([role] * n, pa.string()),
            "text": pa.array(lines, pa.string()),
            "tool": pa.array([tool] * n, pa.string()),
            "ts": pa.nulls(n, pa.timestamp("us")),
        }
    )
    return rd.from_arrow(table)


def load_inf(path: str) -> dict:
    """Read ``inf.yaml`` (dataset.rs:33-37): returns
    ``{"anomalies": [str, ...], "skip": bool}``."""
    import yaml

    with open(os.path.join(path, "inf.yaml"), "r", encoding="utf-8") as f:
        raw = yaml.safe_load(f) or {}
    anomalies = [a["line"] for a in raw.get("anomalies", [])]
    return {"anomalies": anomalies, "skip": bool(raw.get("skip", False))}


_ARCHIVE_SUFFIXES = (".tar", ".tar.gz", ".tgz", ".tar.xz")
#: format-dispatch suffixes a pair file may carry after .good/.fail so
#: lines_dataset frames/decompresses it as the reference would
#: (source.rs:36-44 + reader.rs per-file .gz/.xz)
_FORMAT_SUFFIXES = (".json", ".xml", ".gz", ".xz", ".json.gz", ".xml.gz")


def _matches_kind(name: str, kind: str) -> bool:
    # plain text ("x.good"), an archive pair ("x.good.tar.gz"), or a
    # format-dispatched pair ("job-output.good.json")
    if name.endswith(kind):
        return True
    return any(name.endswith(kind + s)
               for s in _ARCHIVE_SUFFIXES + _FORMAT_SUFFIXES)


def _find_pair(path: str) -> tuple[str, str]:
    entries = sorted(os.listdir(path))
    good = next((e for e in entries if _matches_kind(e, ".good")), None)
    fail = next((e for e in entries if _matches_kind(e, ".fail")), None)
    if good is None or fail is None:
        raise FileNotFoundError(f"Can't find .good and .fail files in {path!r}")
    return os.path.join(path, good), os.path.join(path, fail)


def run_dataset_dir(path: str, config=None) -> DatasetResult:
    """Validate one dataset directory (dataset.rs:80-135).

    A dataset dir may carry a ``config.yaml`` (the user config analog,
    config.rs:224-310): static target config OR a list of
    ``{match_job, config}`` matchers.  The matcher key is the dataset
    directory's name (the job-name analog); the first matching entry's
    target config — ignore_patterns, skip_duplicate, excludes — drives the
    run, exactly like per-job matchers drive a Zuul/Prow build."""
    from .config import PipelineConfig
    from .pipelines.report import run_report
    from .pipelines.train import train

    try:
        inf = load_inf(path)
    except Exception as e:
        return DatasetResult(path, ok=False, message=f"Failed to read inf.yaml: {e}")
    if inf["skip"]:
        return DatasetResult(path, ok=True, skipped=True, message="Skipped")
    try:
        good, fail = _find_pair(path)
    except FileNotFoundError as e:
        return DatasetResult(path, ok=False, message=str(e))
    cfg_path = os.path.join(path, "config.yaml")
    if config is None and os.path.exists(cfg_path):
        from .config_file import load_config

        job_name = os.path.basename(os.path.normpath(path))
        try:
            config = load_config(cfg_path).get_target_config(
                job_name
            ).to_pipeline_config()
        except Exception as e:
            return DatasetResult(
                path, ok=False, message=f"Failed to read config.yaml: {e}"
            )
    config = config or PipelineConfig()

    def _load(p: str):
        if p.endswith(_ARCHIVE_SUFFIXES):
            from .sources.archives import read_archive_lines

            return read_archive_lines(p)
        return lines_dataset(p)

    model = train(_load(good), config)
    out = run_report(_load(fail), model, config)
    anomalies = out["anomalies"].select_columns(
        ["conv_id", "turn_idx", "text"]
    ).take_all()
    # report order = (source, line) order — one source for plain-file
    # datasets, one per archive entry for tarball datasets
    anomalies.sort(key=lambda r: (r["conv_id"], r["turn_idx"]))
    expected = inf["anomalies"]
    # pairwise substring check in order (assert_anomaly_includes,
    # dataset.rs:129-135), then the exact-count check
    for exp, got in zip(expected, anomalies):
        if exp.strip() not in got["text"]:
            return DatasetResult(
                path, ok=False,
                message=f"Expected {exp!r}, got {got['text']!r} (line {got['turn_idx']})",
            )
    if len(anomalies) != len(expected):
        lines = [r["text"] for r in anomalies]
        return DatasetResult(
            path, ok=False,
            message=f"Expect miss-match: expected {len(expected)}, got {len(anomalies)}: {lines}",
        )
    return DatasetResult(path, ok=True)


def test_datasets(paths: list[str], config=None, *, quiet: bool = False) -> int:
    """Validate each dataset dir; returns the number of failures
    (test_datasets, dataset.rs:39-78)."""
    fail_count = 0
    success_count = 0
    for path in paths:
        if not quiet:
            print(f"[+] Validating: {path}")
        res = run_dataset_dir(path, config)
        if res.skipped:
            if not quiet:
                print("-> Skipped")
        elif res.ok:
            success_count += 1
            if not quiet:
                print("-> OK")
        else:
            fail_count += 1
            if not quiet:
                print(res.message)
    if not quiet:
        if fail_count:
            print(f"{fail_count}/{fail_count + success_count} tests failed")
        else:
            print(f"{success_count} tests succeeded")
    return fail_count
