"""Single-file binary report bundle — the Cap'n Proto codec analog.

The reference serializes a whole ``Report`` into ONE binary artifact
(``crates/report/src/codec.rs:33-331``, ``report.rs:198-237``): a
versioned schema, a ``.gz`` filename suffix switching on whole-file
compression, and load-time decode errors on corrupt input.  The
parquet-sink directory this repo writes is the pipeline-side analog; this
module is the artifact-side analog — a compact single file you can attach
to a CI job, copy around, or hand to ``read-report`` — built on public
Arrow IPC instead of Cap'n Proto:

layout (all offsets from file start)::

    MAGIC(8) | section 0 | section 1 | ... | footer JSON | len(8 LE) | MAGIC(8)

- each section is one Arrow IPC stream (zstd-compressed record batches),
  one named table per section (``anomalies`` / ``reports`` / ``unknown`` /
  anything);
- the footer records ``version``, ``kind``, free-form ``meta``, and every
  section's ``(name, offset, length, rows)`` — so a reader can seek to
  ONE section without decoding the others (the lazy-reader property the
  reference gets from Cap'n Proto's arena layout);
- the trailing ``len + MAGIC`` makes truncation detectable in O(1), like
  parquet's ``PAR1`` trailer;
- a ``.gz`` path gzips the whole container (reference parity,
  report.rs:200-205); gz streams do not seek, so section laziness degrades
  to a single whole-file read there.

Driver-side by design: a report is a k-bounded artifact (anomalies are
threshold-filtered, reports one row per conversation), so materializing it
on the driver mirrors the reference, which builds the whole ``Report`` in
memory before encoding.  Bulk data stays in the parquet sinks.
"""

from __future__ import annotations

import gzip
import io
import json
import os
import struct

import pyarrow as pa

__all__ = [
    "write_report_bundle",
    "read_report_bundle",
    "save_report_bundle",
    "load_report_bundle",
    "BundleError",
]

MAGIC = b"LJRBND1\n"
VERSION = 1


class BundleError(ValueError):
    """Corrupt, truncated, or incompatible bundle (DecodeError analog)."""


def _ipc_bytes(table: pa.Table) -> bytes:
    sink = pa.BufferOutputStream()
    opts = pa.ipc.IpcWriteOptions(compression="zstd")
    with pa.ipc.new_stream(sink, table.schema, options=opts) as w:
        w.write_table(table)
    return sink.getvalue().to_pybytes()


def write_report_bundle(path: str, tables: dict[str, pa.Table],
                        *, kind: str = "report",
                        meta: dict | None = None) -> dict:
    """Write named tables as one bundle file (atomic tmp + rename).
    Returns the footer that was written."""
    sections = []
    body = io.BytesIO()
    body.write(MAGIC)
    for name, table in tables.items():
        data = _ipc_bytes(table)
        sections.append({"name": name, "offset": body.tell(),
                         "length": len(data), "rows": table.num_rows})
        body.write(data)
    footer = {"version": VERSION, "kind": kind, "meta": meta or {},
              "sections": sections}
    fb = json.dumps(footer, sort_keys=True).encode()
    body.write(fb)
    body.write(struct.pack("<Q", len(fb)))
    body.write(MAGIC)

    raw = body.getvalue()
    tmp = f"{path}.tmp-{os.getpid()}"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if path.endswith(".gz"):
        # mtime=0 + empty filename: byte-identical artifact for identical
        # content (no tmp-path or timestamp leaks into the gzip header)
        with open(tmp, "wb") as f:
            with gzip.GzipFile(filename="", fileobj=f, mode="wb",
                               mtime=0) as gz:
                gz.write(raw)
    else:
        with open(tmp, "wb") as f:
            f.write(raw)
    os.replace(tmp, path)
    return footer


def _parse_footer(footer_bytes: bytes) -> dict:
    try:
        footer = json.loads(footer_bytes)
    except ValueError as e:
        raise BundleError(f"corrupt report bundle footer: {e}") from e
    if footer.get("version") != VERSION:
        raise BundleError(
            f"unsupported bundle version {footer.get('version')} "
            f"(this reader supports {VERSION})")
    return footer


def read_report_bundle(path: str, *, sections: list[str] | None = None
                       ) -> tuple[dict[str, pa.Table], dict]:
    """Read a bundle back → ``(tables, footer)``.  ``sections`` limits the
    read to the named tables; on a plain (non-.gz) file only those byte
    ranges are read from disk."""
    tail_len = len(MAGIC) + 8
    if path.endswith(".gz"):
        with gzip.open(path, "rb") as gz:
            buf = gz.read()
        if (len(buf) < len(MAGIC) + tail_len or buf[: len(MAGIC)] != MAGIC
                or buf[-len(MAGIC):] != MAGIC):
            raise BundleError("not a report bundle or truncated")
        (flen,) = struct.unpack("<Q", buf[-tail_len: -len(MAGIC)])
        start = len(buf) - tail_len - flen
        if start < len(MAGIC):
            raise BundleError("corrupt report bundle (footer length)")
        footer = _parse_footer(buf[start: start + flen])
        f = None
        get = lambda off, ln: buf[off: off + ln]  # noqa: E731
    else:
        size = os.path.getsize(path)
        f = open(path, "rb")
        head = f.read(len(MAGIC))
        if size < len(MAGIC) + tail_len or head != MAGIC:
            f.close()
            raise BundleError("not a report bundle (bad magic)")
        f.seek(size - tail_len)
        tail = f.read(tail_len)
        if tail[-len(MAGIC):] != MAGIC:
            f.close()
            raise BundleError("truncated report bundle (missing trailer)")
        (flen,) = struct.unpack("<Q", tail[:8])
        start = size - tail_len - flen
        if start < len(MAGIC):
            f.close()
            raise BundleError("corrupt report bundle (footer length)")
        f.seek(start)
        try:
            footer = _parse_footer(f.read(flen))
        except BundleError:
            f.close()
            raise

        def get(off, ln, _f=f):
            _f.seek(off)
            return _f.read(ln)

    tables: dict[str, pa.Table] = {}
    try:
        for sec in footer["sections"]:
            if sections is not None and sec["name"] not in sections:
                continue
            data = get(sec["offset"], sec["length"])
            try:
                table = pa.ipc.open_stream(pa.py_buffer(data)).read_all()
            except pa.ArrowInvalid as e:
                raise BundleError(f"corrupt section {sec['name']!r}: {e}") from e
            if table.num_rows != sec["rows"]:
                raise BundleError(
                    f"section {sec['name']!r} rows {table.num_rows} "
                    f"!= footer {sec['rows']}")
            tables[sec["name"]] = table
    finally:
        if f is not None:
            f.close()
    if sections is not None:
        missing = set(sections) - set(tables)
        if missing:
            raise BundleError(f"bundle has no section(s) {sorted(missing)}")
    return tables, footer


# ---------------------------------------------------------------- Dataset API

def save_report_bundle(report: dict, path: str, *, kind: str = "report",
                       meta: dict | None = None) -> dict:
    """Persist a ``run_report``-shaped dict (Datasets or Arrow tables) as
    one bundle file.  The ``scan`` entry (bulk intermediate) is excluded —
    only the k-bounded artifact tables travel."""
    import ray

    tables: dict[str, pa.Table] = {}
    for name, val in report.items():
        if name == "scan" or val is None:
            continue
        if isinstance(val, pa.Table):
            tables[name] = val
        elif hasattr(val, "to_arrow_refs"):
            parts = [t for t in ray.get(val.to_arrow_refs()) if t.num_rows]
            if parts:
                tables[name] = pa.concat_tables(parts)
            else:
                # Ray's Schema wrapper exposes names/types, not pa.Schema
                s = val.schema()
                tables[name] = pa.schema(zip(s.names, s.types)).empty_table()
        else:
            tables[name] = pa.Table.from_pandas(val, preserve_index=False)
    return write_report_bundle(path, tables, kind=kind, meta=meta)


def load_report_bundle(path: str, *, sections: list[str] | None = None
                       ) -> dict:
    """Load a bundle back into the ``load_report`` output shape
    (name → Ray Dataset) plus ``"_meta"`` (the footer)."""
    import ray.data as rd

    tables, footer = read_report_bundle(path, sections=sections)
    out: dict = {name: rd.from_arrow(t) for name, t in tables.items()}
    out["_meta"] = footer
    return out
