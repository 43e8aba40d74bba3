"""Schema-drift-tolerant parquet reader: union heterogeneous shards by
column NAME (missing columns null-filled), like DuckDB's
``read_parquet(..., union_by_name=true)``.

A 100-TB ingest accumulates shards written by different pipeline
versions — columns get added, dropped, and reordered over time.  Plain
``ray.data.read_parquet`` over such a directory fails or silently
misaligns; this reader aligns every shard to the union schema instead:

- union schema = first-seen column order across shards (footer metadata
  only — no data read during planning);
- each shard is read separately (its own column pruning applies) and a
  stateless ``map_batches`` adds typed null columns for whatever the
  shard lacks and reorders to the union layout;
- shards chain with ``Dataset.union`` — still lazy, still streaming.

Type conflicts across shards for the SAME column name are an error (a
real pipeline bug — silently casting hides corruption).
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["read_parquet_union"]


def read_parquet_union(paths: list[str], *, columns: list[str] | None = None):
    """Read parquet files/dirs with heterogeneous schemas as ONE Dataset
    with the union-by-name schema.  ``columns`` restricts the union to
    the named columns (pruned at each shard's read)."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p))
                if f.endswith(".parquet")
            )
        else:
            files.append(p)
    if not files:
        raise FileNotFoundError(f"no parquet files under {paths}")

    union_fields: dict[str, pa.DataType] = {}
    per_file_cols: list[list[str]] = []
    for f in files:
        schema = pq.read_schema(f)
        cols = []
        for name, typ in zip(schema.names, schema.types):
            if columns is not None and name not in columns:
                continue
            if name in union_fields:
                if union_fields[name] != typ:
                    raise TypeError(
                        f"column {name!r} has conflicting types across "
                        f"shards: {union_fields[name]} vs {typ} ({f})"
                    )
            else:
                union_fields[name] = typ
            cols.append(name)
        per_file_cols.append(cols)

    names = list(union_fields)

    def _align(batch: pa.Table) -> pa.Table:
        arrays = []
        for name in names:
            if name in batch.column_names:
                arrays.append(batch.column(name))
            else:
                arrays.append(pa.nulls(batch.num_rows, union_fields[name]))
        return pa.table(dict(zip(names, arrays)))

    parts = []
    for f, cols in zip(files, per_file_cols):
        ds = rd.read_parquet(f, columns=cols or None)
        parts.append(ds.map_batches(_align, batch_format="pyarrow"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
