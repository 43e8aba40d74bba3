"""Local raw log files and directories — the reference's plain-path
inputs (crates/model/src/files.rs).

- ``content_from_path`` classifies a path as File/Directory
  (files.rs:12-22); here the CLI dispatches and :func:`read_file_lines`
  handles both.
- ``dir_iter`` walks a directory skipping symlinks and hidden entries
  (files.rs:38-68); every surviving file becomes one source whose group
  key is the IndexName of its path relative to the walk root.
- ``discover_baselines_from_path`` tries the rotated sibling ``<file>.0``
  when a raw-file target has no explicit baseline (files.rs:25-31) —
  :func:`rotated_baseline_path`.

Scale shape: enumeration is driver-side metadata (names only); the data
plane is one Ray task per file reading only its own bytes, with per-file
``.gz``/``.xz`` decompression, ``.journal`` members parsed as binary
journals, and tarballs expanded through the archive reader — the same
dispatch-by-suffix the reference applies per source (source.rs:34).
"""

from __future__ import annotations

import io
import os
import tarfile

__all__ = ["read_file_lines", "rotated_baseline_path", "walk_files"]

#: plain-text entries larger than this are cut at the last full line
#: (archives.DEFAULT_MAX_ENTRY_BYTES twin, re-exported for callers)
from .archives import DEFAULT_MAX_ENTRY_BYTES  # noqa: E402


def walk_files(root: str) -> list[str]:
    """files.rs:38-68 ``dir_iter``: recursive walk, skipping symlinks and
    hidden files/directories; deterministic (sorted) order."""
    out: list[str] = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = sorted(
            d
            for d in dirnames
            if not d.startswith(".") and not os.path.islink(os.path.join(dirpath, d))
        )
        for f in sorted(filenames):
            p = os.path.join(dirpath, f)
            if f.startswith(".") or os.path.islink(p):
                continue
            out.append(p)
    return out


def rotated_baseline_path(target: str) -> str | None:
    """files.rs:25-31: the implicit baseline of ``service.log`` is the
    rotated ``service.log.0`` next to it (None when absent)."""
    candidate = target + ".0"
    return candidate if os.path.isfile(candidate) else None


def read_file_lines(
    path: str,
    *,
    target_config=None,
    role: str = "file",
    max_entry_bytes: int = DEFAULT_MAX_ENTRY_BYTES,
    error_collector=None,
):
    """Turns-schema Dataset over a raw log file or a directory of them.

    One Ray task per file; group key = IndexName of the path relative to
    the directory root (the file's own name for a single-file input).
    Suffix dispatch per file: ``.gz``/``.xz`` decompress, ``.journal``
    parses as a binary journal, tarballs expand entry-wise; everything
    else is UTF-8 lines (lossy decode).

    Corrupt sources are skipped, and — with an ``error_collector``
    (``sources/read_errors.py``) — recorded as the reference Report's
    ``read_errors`` (report.rs:112): skipped, never silent.
    """
    import pyarrow as pa
    import ray.data as rd

    from .archives import (
        _TURNS_SCHEMA,
        _decompress_member,
        _entry_rows,
        is_tarball_path,
        iter_archive_entries,
    )
    from .read_errors import report_read_error
    from .remote import _remote_rows_table

    if os.path.isdir(path):
        root = path.rstrip(os.sep)
        files = walk_files(root)
        prefix = len(root) + 1
    elif os.path.isfile(path):
        files = [path]
        prefix = len(os.path.dirname(path)) + 1 if os.path.dirname(path) else 0
    else:
        raise FileNotFoundError(f"Unknown path: {path!r}")

    fp_valid = target_config.is_fp_valid if target_config is not None else None
    specs = []
    for f in files:
        rel = f[prefix:]
        if fp_valid is not None and not fp_valid(rel):
            continue
        specs.append({"path": f, "rel": rel})
    if not specs:
        return rd.from_arrow(_TURNS_SCHEMA.empty_table())

    def load(batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            p, rel = row["path"], row["rel"]
            if is_tarball_path(rel):
                try:
                    entries = [
                        (u, u.split("?entry=", 1)[-1].rsplit("&sub=", 1)[-1],
                         lines)
                        for u, lines in iter_archive_entries(
                            p, fp_valid=fp_valid,
                            max_entry_bytes=max_entry_bytes
                        )
                    ]
                except (OSError, EOFError, tarfile.TarError) as e:
                    # corrupt archive: skip, never fail the scan — but
                    # record it (report.rs:112 read_errors)
                    report_read_error(error_collector, p, e)
                    continue
                out.append(_remote_rows_table(entries, role))
                continue
            read_n = -1
            if not rel.endswith((".gz", ".xz")):
                # plain text: the read itself stops at the cap
                read_n = max_entry_bytes + 1
            with open(p, "rb") as f:
                raw = f.read(read_n)
            try:
                data = _decompress_member(rel, raw)
            except Exception as e:
                # corrupt compressed file: skip, never fail the scan
                report_read_error(error_collector, p, e)
                continue
            url, lines = _entry_rows(p, data, max_entry_bytes)
            out.append(_remote_rows_table([(url, rel, lines)], role))
        if not out:
            return _TURNS_SCHEMA.empty_table()
        return pa.concat_tables(out)

    return rd.from_items(specs).map_batches(load, batch_format="pyarrow", batch_size=4)
