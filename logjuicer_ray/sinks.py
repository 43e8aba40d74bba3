"""Sink layout: resumable partitioned Parquet + per-sink manifests.

Fan-out analog of the reference report writer (cli/src/main.rs:675-705,
report.rs:198-237), restated for a distributed engine (north rule): each sink
is a directory of part files written by ``ds.write_parquet``, finalized by a
``manifest.json`` recording row count, schema and lineage.  A rerun that
finds a finished manifest skips the sink (checkpoint-based resume).
"""

from __future__ import annotations

import json
import os
import shutil
import time

__all__ = ["write_sink", "write_jsonl_sink", "sink_finished", "read_manifest"]

MANIFEST = "manifest.json"


def sink_finished(path: str) -> bool:
    return os.path.exists(os.path.join(path, MANIFEST))


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST)) as f:
        return json.load(f)


def write_sink(ds, path: str, *, inputs=None, extra=None, resume: bool = True) -> dict:
    """Write a Dataset to ``path`` atomically (tmp dir + rename) with a
    manifest; returns the manifest.  ``resume=True`` skips a finished sink."""
    if resume and sink_finished(path):
        return read_manifest(path)
    tmp = path + ".inprogress"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    t0 = time.monotonic()
    ds.write_parquet(tmp)
    # row count / schema from the written files (no dataset re-execution)
    import pyarrow.parquet as pq

    part_files = [f for f in sorted(os.listdir(tmp)) if f.endswith(".parquet")]
    # per-partition lineage: each part file with its row count and size, so a
    # resumed or audited run can account for every partition (north rule)
    partitions = []
    rows = 0
    for f in part_files:
        meta = pq.read_metadata(os.path.join(tmp, f))
        partitions.append(
            {
                "file": f,
                "rows": meta.num_rows,
                "bytes": os.path.getsize(os.path.join(tmp, f)),
            }
        )
        rows += meta.num_rows
    names = list(pq.read_schema(os.path.join(tmp, part_files[0])).names) if part_files else []
    manifest = {
        "rows": rows,
        "schema": names,
        "inputs": inputs or [],
        "wall_time_s": round(time.monotonic() - t0, 3),
        "partitions": partitions,
    }
    if extra:
        manifest.update(extra)
    with open(os.path.join(tmp, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)
    return manifest


def write_jsonl_sink(ds, path: str, *, inputs=None, extra=None,
                     resume: bool = True) -> dict:
    """JSON-Lines variant of :func:`write_sink` — the training-export
    interchange format (one JSON object per line, one shard file per
    block via ``ds.write_json``).  Same atomic tmp-dir + rename protocol,
    same manifest schema (rows / schema / per-partition lineage), same
    ``resume=True`` skip of a finished sink."""
    if resume and sink_finished(path):
        return read_manifest(path)
    tmp = path + ".inprogress"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    t0 = time.monotonic()
    schema = ds.schema()
    ds.write_json(tmp)
    part_files = [f for f in sorted(os.listdir(tmp)) if f.endswith(".json")]
    partitions = []
    rows = 0
    for f in part_files:
        fp = os.path.join(tmp, f)
        with open(fp, "rb") as fh:
            n = sum(1 for _ in fh)
        partitions.append(
            {"file": f, "rows": n, "bytes": os.path.getsize(fp)}
        )
        rows += n
    manifest = {
        "rows": rows,
        "schema": list(schema.names),
        "format": "jsonl",
        "inputs": inputs or [],
        "wall_time_s": round(time.monotonic() - t0, 3),
        "partitions": partitions,
    }
    if extra:
        manifest.update(extra)
    with open(os.path.join(tmp, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)
    return manifest
