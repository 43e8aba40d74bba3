"""Tarball sources — the offline half of the reference's archive support
(crates/model/src/source.rs:95-160 ``with_tarball_source``,
crates/report/src/report.rs:473-475 ``is_tarball_path``).

A tarball is a container of log files: every regular-file entry becomes
its own source (``<archive>?entry=<path>``, nested entries append
``&sub=<path>``), entries are filtered by the config's ``is_fp_valid``
(includes/excludes, with a trailing ``.gz`` stripped first), per-entry
``.gz``/``.xz`` members are decompressed, and a member that is itself a
tarball recurses (source.rs:142-147).  Each surviving entry yields
turns-schema rows (one line per row) grouped by the entry path's
IndexName — exactly how a directory of raw log files is grouped.

Scale shape (how this parallelizes on a cluster):

- **plain ``.tar``**: the driver walks only the 512-byte entry HEADERS
  (seek-based — O(entries) reads, never the data), then ships
  ``(archive, name, offset, size)`` specs through ``from_items``; each
  Ray task preads its byte ranges directly.  Entry-level parallelism
  inside a single large archive.
- **compressed ``.tar.gz`` / ``.tgz`` / ``.tar.xz``**: a gzip/xz stream
  has no random access, so one task streams one archive end-to-end —
  parallelism comes from the NUMBER of archives (the realistic 100-TB
  layout: many build archives, not one).  A spec row with
  ``offset == -1`` marks this mode.

Entry payloads are capped at ``max_entry_bytes`` (64 MiB default) so a
pathological member cannot blow a worker's heap; larger entries are
truncated at the cap with the tail dropped at the last full line.
"""

from __future__ import annotations

import gzip
import io
import lzma
import os
import tarfile

import pyarrow as pa

__all__ = ["is_tarball_path", "read_archive_lines", "iter_archive_entries"]

_TURNS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int64()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

DEFAULT_MAX_ENTRY_BYTES = 64 << 20


def is_tarball_path(s: str) -> bool:
    """report.rs:473-475 plus the common ``.tgz`` spelling."""
    return s.endswith((".tar", ".tar.gz", ".tar.xz", ".tgz"))


def _decompress_member(name: str, data: bytes) -> bytes:
    if name.endswith(".gz"):
        return gzip.decompress(data)
    if name.endswith(".xz"):
        return lzma.decompress(data)
    return data


def _entry_rows(url: str, data: bytes, max_entry_bytes: int):
    from .journal import is_journal_path, journal_lines
    from .linesplit import file_type_for, split_log_text

    entry_path = url.rsplit("&sub=", 1)[-1].split("?entry=", 1)[-1]
    if is_journal_path(entry_path):
        # a .journal member inside an archive parses as a binary journal
        # (source.rs:34 dispatches by entry suffix, not container)
        try:
            lines = [line for line, _pos in journal_lines(io.BytesIO(data))]
        except (ValueError, EOFError):
            lines = []  # not actually a journal / truncated: no rows
        return url, lines
    if len(data) > max_entry_bytes:
        cut = data.rfind(b"\n", 0, max_entry_bytes)
        data = data[: cut + 1 if cut >= 0 else max_entry_bytes]
    # BytesLines framing with format-aware sub-line splitting: literal-\n
    # sublines + ansible stdout markers in every mode, JSON scalar / XML
    # '><' splits by suffix, 6000-B over-long lines dropped
    # (iterator.rs:150-346, dispatch source.rs:28-48)
    return url, split_log_text(data, file_type=file_type_for(entry_path))


def iter_archive_entries(
    archive_path: str,
    fileobj=None,
    *,
    fp_valid=None,
    base_url: str | None = None,
    max_entry_bytes: int = DEFAULT_MAX_ENTRY_BYTES,
):
    """Yield ``(url, lines)`` for every valid file entry, recursing into
    nested tarballs (source.rs:95-160).  ``fileobj`` streams the archive
    when given (nested / compressed case); otherwise the path opens
    directly."""
    kwargs = {"fileobj": fileobj} if fileobj is not None else {"name": archive_path}
    with tarfile.open(mode="r|*", **kwargs) as tf:
        for member in tf:
            if not member.isfile():
                continue
            path = member.name
            if fp_valid is not None and not fp_valid(path):
                continue
            url = (
                f"{base_url}&sub={path}"
                if base_url
                else f"{archive_path}?entry={path}"
            )
            f = tf.extractfile(member)
            if f is None:
                continue
            # members read whole (compressed/nested payloads can't be cut
            # mid-stream); the line-framing cap bounds the ROWS produced
            raw = f.read()
            try:
                data = _decompress_member(path, raw)
            except Exception:
                continue  # corrupt member: skip, never fail the archive
            if is_tarball_path(path):
                yield from iter_archive_entries(
                    archive_path,
                    io.BytesIO(data),
                    fp_valid=fp_valid,
                    base_url=url,
                    max_entry_bytes=max_entry_bytes,
                )
            else:
                yield _entry_rows(url, data, max_entry_bytes)


def _plain_tar_specs(archive_path: str) -> list[dict]:
    """Header-only walk of an uncompressed tar: TarInfo gives the exact
    (offset_data, size) of every member, so workers can pread ranges."""
    specs = []
    with tarfile.open(archive_path, mode="r:") as tf:
        for member in tf:
            if member.isfile():
                specs.append(
                    {
                        "archive": archive_path,
                        "name": member.name,
                        "offset": int(member.offset_data),
                        "size": int(member.size),
                    }
                )
    return specs


def _rows_table(entries, role: str) -> pa.Table:
    from ..index_name import index_name_from_path

    conv, idx, text, tool = [], [], [], []
    for url, lines in entries:
        # group key = (role, IndexName of the entry path) — per-index
        # baselines, the same grouping a directory of raw files gets
        entry_path = url.split("?entry=", 1)[-1].rsplit("&sub=", 1)[-1]
        name = index_name_from_path(entry_path)
        n = len(lines)
        conv.extend([url] * n)
        idx.extend(range(n))
        text.extend(lines)
        tool.extend([name] * n)
    n = len(conv)
    return pa.table(
        {
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(idx, pa.int64()),
            "role": pa.array([role] * n, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.nulls(n, pa.timestamp("us")),
        },
        schema=_TURNS_SCHEMA,
    )


def read_archive_lines(
    path: str | list[str],
    *,
    target_config=None,
    role: str = "file",
    max_entry_bytes: int = DEFAULT_MAX_ENTRY_BYTES,
    error_collector=None,
):
    """Turns-schema Dataset over one or more tarballs (or a directory of
    them).  See the module docstring for the parallelism contract.
    Corrupt archives/members are skipped and recorded through the
    optional ``error_collector`` (report.rs:112 read_errors analog)."""
    import ray.data as rd

    from .read_errors import report_read_error

    paths = [path] if isinstance(path, str) else list(path)
    archives: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            archives.extend(
                os.path.join(p, f)
                for f in sorted(os.listdir(p))
                if is_tarball_path(f)
            )
        else:
            archives.append(p)
    if not archives:
        raise FileNotFoundError(f"no tarballs under {path!r}")

    fp_valid = target_config.is_fp_valid if target_config is not None else None

    specs: list[dict] = []
    for a in archives:
        if a.endswith(".tar"):
            try:
                specs.extend(_plain_tar_specs(a))
            except (OSError, EOFError, tarfile.TarError) as e:
                # corrupt archive header walk: skip the archive, record it
                report_read_error(error_collector, a, e)
        else:
            specs.append({"archive": a, "name": "", "offset": -1, "size": -1})
    if not specs:
        return rd.from_arrow(_TURNS_SCHEMA.empty_table())

    def expand(batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            a = row["archive"]
            if row["offset"] < 0:
                # compressed archive: stream it whole (one task's worth)
                try:
                    out.append(
                        _rows_table(
                            iter_archive_entries(
                                a, fp_valid=fp_valid,
                                max_entry_bytes=max_entry_bytes,
                            ),
                            role,
                        )
                    )
                except (OSError, EOFError, tarfile.TarError) as e:
                    report_read_error(error_collector, a, e)
                    continue
            else:
                name = row["name"]
                if fp_valid is not None and not fp_valid(name):
                    continue
                read_n = row["size"]
                if not is_tarball_path(name) and not name.endswith((".gz", ".xz")):
                    # plain-text member: the pread itself can stop at the cap
                    read_n = min(read_n, max_entry_bytes + 1)
                with open(a, "rb") as f:
                    f.seek(row["offset"])
                    raw = f.read(read_n)
                try:
                    data = _decompress_member(name, raw)
                except Exception as e:
                    report_read_error(error_collector, f"{a}?entry={name}", e)
                    continue
                url = f"{a}?entry={name}"
                if is_tarball_path(name):
                    out.append(
                        _rows_table(
                            iter_archive_entries(
                                a, io.BytesIO(data), fp_valid=fp_valid,
                                base_url=url,
                                max_entry_bytes=max_entry_bytes,
                            ),
                            role,
                        )
                    )
                else:
                    out.append(
                        _rows_table(
                            [_entry_rows(url, data, max_entry_bytes)], role
                        )
                    )
        if not out:
            return _TURNS_SCHEMA.empty_table()
        return pa.concat_tables(out)

    return rd.from_items(specs).map_batches(
        expand, batch_format="pyarrow", batch_size=16
    )
