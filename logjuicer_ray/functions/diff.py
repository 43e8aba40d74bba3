"""Keyed dataset diff — added / removed / changed classification between
two corpus versions.

The data-ops primitive behind incremental curation: given version A and
version B of a keyed table, emit one row per key whose content differs
(``changed``), exists only in A (``removed``) or only in B (``added``).
Unchanged keys are dropped (at corpus scale they are ~all of the data).

Scale shape: each side is first REDUCED to (key, content_digest) inside
``map_batches`` — the full content never enters the wide exchange; the
classification is one native full-outer hash join on the key plus a
vectorized CASE.  The digest is the full 128-bit md5 hex of the
concatenated compare columns (collision odds ~2^-128 per key — the
content-equality analog of the exact-dedup operator's verified groups,
functions/dedup.py:44-69, where grouping-by-hash demanded in-group text
verification; here the compare is per-key, so the digest IS the cheap
and sufficient certificate).

No reference analog (the logjuicer reference diffs nothing; its nearest
concept is model staleness detection, crates/web-service/src/worker.rs:
463-493) — extends the engine for training-data pipeline ops.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["dataset_diff"]


def _digest_side(ds, key_col: str, compare_cols: list[str], out: str):
    def _digest(batch: pa.Table) -> pa.Table:
        cols = [pc.fill_null(pc.cast(batch.column(c), pa.string()), "\x00")
                for c in compare_cols]
        joined = cols[0] if len(cols) == 1 else pc.binary_join_element_wise(
            *cols, "\x1f"
        )
        dig = pa.array(
            [hashlib.md5(s.encode()).hexdigest() for s in joined.to_pylist()],
            pa.string(),
        )
        return pa.table({key_col: batch.column(key_col), out: dig})

    return ds.map_batches(_digest, batch_format="pyarrow")


def dataset_diff(ds_a, ds_b, *, key_col: str, compare_cols: list[str],
                 num_partitions: int = 16):
    """Diff two keyed Datasets; returns (key, status) rows with status in
    {'added', 'removed', 'changed'}.  Keys must be unique per side."""
    a = _digest_side(ds_a, key_col, compare_cols, "dig_a")
    b = _digest_side(ds_b, key_col, compare_cols, "dig_b")
    joined = a.join(b, join_type="full_outer", on=(key_col,),
                    num_partitions=num_partitions)

    def _classify(batch: pa.Table) -> pa.Table:
        da, db = batch.column("dig_a"), batch.column("dig_b")
        in_a, in_b = pc.is_valid(da), pc.is_valid(db)
        status = pc.if_else(
            pc.invert(in_b), pa.scalar("removed"),
            pc.if_else(
                pc.invert(in_a), pa.scalar("added"),
                pc.if_else(pc.not_equal(da, db), pa.scalar("changed"),
                           pa.scalar(None, pa.string())),
            ),
        )
        out = pa.table({key_col: batch.column(key_col), "status": status})
        return out.filter(pc.is_valid(status))

    return joined.map_batches(_classify, batch_format="pyarrow")
