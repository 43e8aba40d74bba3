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

__all__ = ["write_sink", "write_jsonl_sink", "compact_sink",
           "sink_finished", "read_manifest"]

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


def compact_sink(path: str, *, target_mb: float = 128.0) -> dict:
    """Compact a parquet sink's small part files into
    ``ceil(total_bytes / target_mb)`` larger ones — the periodic
    maintenance pass every long-running partitioned layout needs (many
    small incremental writes degrade read parallelism and metadata cost
    at 100-TB scale).  Streams through ``read_parquet`` →
    ``repartition`` → the same atomic tmp-dir + manifest protocol
    (``write_sink`` with ``resume=False``); the new manifest records the
    old file count under ``compacted_from`` for lineage."""
    import math

    import ray.data as rd

    files = [f for f in sorted(os.listdir(path)) if f.endswith(".parquet")]
    if not files:
        raise FileNotFoundError(f"no parquet part files under {path}")
    total = sum(os.path.getsize(os.path.join(path, f)) for f in files)
    n_out = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    if n_out >= len(files):
        return read_manifest(path) if sink_finished(path) else {
            "rows": None, "skipped": "already compact"}
    ds = rd.read_parquet([os.path.join(path, f) for f in files])
    return write_sink(
        ds.repartition(n_out), path, resume=False,
        inputs=[path],
        extra={"compacted_from": len(files)},
    )
