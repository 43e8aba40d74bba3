"""JSON-Lines source: read a jsonl sink directory (or loose files) back
into a Dataset.

Counterpart of :func:`logjuicer_ray.sinks.write_jsonl_sink` — the
interchange format most LLM training pipelines exchange corpora in.  A
sink directory's ``manifest.json`` is excluded from the file list; row
counts can be cross-checked against the manifest by callers that want a
read-side integrity check.
"""

from __future__ import annotations

import os

__all__ = ["read_jsonl"]


def read_jsonl(path: str, *, columns: list[str] | None = None):
    """Read ``path`` (a jsonl sink dir, any dir of ``*.json``/``*.jsonl``
    files, or a single file) as a Dataset.  ``columns`` prunes to the named
    columns right after the read (JSON is row-major — pruning at the read
    is not possible, so this is a projection, not a scan optimization)."""
    import ray.data as rd

    from logjuicer_ray.sinks import MANIFEST

    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith((".json", ".jsonl")) and f != MANIFEST
        )
        if not files:
            raise FileNotFoundError(f"no .json/.jsonl files under {path}")
    else:
        files = [path]
    ds = rd.read_json(files)
    if columns:
        ds = ds.select_columns(columns)
    return ds
