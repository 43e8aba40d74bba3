"""Distributed global rank / ntile — ordered enumeration without a
single-node sort.

``global_rank`` assigns every row its exact 1-based rank under
``ORDER BY value [DESC], tie_col ASC`` (SQL ``row_number()`` semantics —
``tie_col`` must be unique, e.g. a primary key) and, optionally, its
``ntile(k)`` bucket.  The classic three-step range-partition scheme:

1. **Boundaries**: one tiny min/max aggregate picks ``n_buckets``
   equi-width cut points over the value domain (production note: for
   heavily skewed domains substitute sampled quantile boundaries — the
   rank math below is boundary-agnostic, any monotone cut set works).
2. **Exclusive offsets**: one ``map_batches`` pass emits a per-task
   histogram over the cut points (``np.searchsorted`` — a few hundred
   ints per task, never rows); the driver's cumulative sum over the
   n_buckets-sized array yields each range's global rank offset.
3. **Local rank**: ``groupby(bucket).map_groups`` sorts each range
   independently and adds ``offset + local position``.  Equal values
   always share a bucket (binning is on the value alone), so tie-breaks
   never cross a boundary.

Shuffle cost: one keyed exchange of (value, tie, bucket) rows — the same
volume ``Dataset.sort`` moves, but the output carries the global rank,
which Ray Data's sort cannot produce (blocks have no ordinal identity
downstream).  Driver state: O(n_buckets) integers.

``ntile`` follows SQL semantics: the first ``N mod k`` buckets hold
``N // k + 1`` rows.  Derived from the global rank arithmetically, no
extra pass.

No reference analog (the logjuicer reference never enumerates rows
globally; its per-file line numbers come from the reader,
crates/iterator/src/iterator.rs:115-127) — this extends the engine for
training-data pipelines (deterministic ordered export, quantile bucketing).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["global_rank", "grouped_global_rank"]


def global_rank(ds, *, value_col: str, tie_col: str, descending: bool = True,
                ntile: int | None = None, n_buckets: int = 64,
                rank_col: str = "rnk", keep_cols: list | None = None):
    """Exact global ``row_number()`` (and optional ``ntile``) over
    ``(value_col [desc], tie_col asc)``.  ``tie_col`` values must be
    unique.  Returns the input columns plus ``rank_col`` (int64, 1-based)
    and, if ``ntile`` is given, ``bucket`` (int64, 1-based).
    ``keep_cols``: extra payload columns to carry through the exchange
    (default none — rank over the narrowest possible rows)."""
    from ray.data.aggregate import Max, Min

    ds = ds.select_columns([tie_col, value_col] + list(keep_cols or []))
    mm = ds.aggregate(Min(value_col), Max(value_col))
    lo, hi = mm[f"min({value_col})"], mm[f"max({value_col})"]
    if lo is None:
        return ds.map_batches(
            lambda b: b.append_column(rank_col, pa.array([], pa.int64())),
            batch_format="pyarrow",
        )
    # internal cut points (n_buckets-1 of them); equal values can never
    # straddle a cut, so within-bucket tie-breaks are globally correct
    cuts = np.linspace(float(lo), float(hi), n_buckets + 1)[1:-1]

    def _bucket_of(vals: np.ndarray) -> np.ndarray:
        b = np.searchsorted(cuts, vals, side="right")
        return (len(cuts) - b) if descending else b

    def _hist(batch: pa.Table) -> pa.Table:
        vals = batch.column(value_col).to_numpy(zero_copy_only=False).astype(float)
        counts = np.bincount(_bucket_of(vals), minlength=n_buckets)
        return pa.table({
            "bucket": pa.array(np.arange(n_buckets), pa.int64()),
            "cnt": pa.array(counts.astype(np.int64), pa.int64()),
        })

    per_bucket = (
        ds.map_batches(_hist, batch_format="pyarrow").groupby("bucket").sum("cnt")
    )
    # driver state: n_buckets rows, independent of data size
    counts = {r["bucket"]: r["sum(cnt)"] for r in per_bucket.take_all()}
    totals = np.array([counts.get(i, 0) for i in range(n_buckets)], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(totals)[:-1]])
    n_total = int(totals.sum())

    def _tag(batch: pa.Table) -> pa.Table:
        vals = batch.column(value_col).to_numpy(zero_copy_only=False).astype(float)
        return batch.append_column(
            "bucket", pa.array(_bucket_of(vals).astype(np.int64), pa.int64())
        )

    def _rank_group(group: pa.Table) -> pa.Table:
        b = int(group.column("bucket")[0].as_py())
        idx = pc.sort_indices(group, sort_keys=[
            (value_col, "descending" if descending else "ascending"),
            (tie_col, "ascending"),
        ])
        g = group.take(idx)
        rnk = offsets[b] + np.arange(1, g.num_rows + 1, dtype=np.int64)
        out = g.drop_columns(["bucket"]).append_column(
            rank_col, pa.array(rnk, pa.int64())
        )
        if ntile:
            big = n_total // ntile + 1  # size of the first (n_total % ntile) tiles
            n_big = n_total % ntile
            cut = n_big * big
            r0 = rnk - 1
            tile = np.where(r0 < cut, r0 // big,
                            n_big + (r0 - cut) // max(n_total // ntile, 1))
            out = out.append_column("bucket", pa.array(tile + 1, pa.int64()))
        return out

    return (
        ds.map_batches(_tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_rank_group, batch_format="pyarrow")
    )


def grouped_global_rank(ds, *, part_col: str, value_col: str, tie_col: str,
                        descending: bool = True, n_buckets: int = 64,
                        rank_col: str = "rnk", max_parts: int = 100_000):
    """Exact ``row_number() OVER (PARTITION BY part_col ORDER BY value
    [DESC], tie ASC)`` — the partitioned form of ``global_rank``.

    Same three-step range-partition scheme, with the histogram and the
    offsets keyed by ``(part, bucket)``: the cut points stay GLOBAL (any
    monotone cut set is correct per partition too, since equal values
    still never straddle a cut), the driver holds one offsets array per
    part (``n_parts × n_buckets`` ints — ``max_parts`` is the documented
    bound: ``part_col`` must be low-cardinality, e.g. corpus sources or
    shard labels, not a per-row key), and the keyed exchange groups by
    ``(part, bucket)`` so a hot part still spreads over ``n_buckets``
    groups.  ``tie_col`` must be unique within a part.

    Returns (part, tie, value) + ``rank_col`` (int64, 1-based per part).
    """
    from ray.data.aggregate import Max, Min

    ds = ds.select_columns([part_col, tie_col, value_col])
    mm = ds.aggregate(Min(value_col), Max(value_col))
    lo, hi = mm[f"min({value_col})"], mm[f"max({value_col})"]
    if lo is None:
        return ds.map_batches(
            lambda b: b.append_column(rank_col, pa.array([], pa.int64())),
            batch_format="pyarrow",
        )
    cuts = np.linspace(float(lo), float(hi), n_buckets + 1)[1:-1]

    def _bucket_of(vals: np.ndarray) -> np.ndarray:
        b = np.searchsorted(cuts, vals, side="right")
        return (len(cuts) - b) if descending else b

    def _hist(batch: pa.Table) -> pa.Table:
        vals = batch.column(value_col).to_numpy(zero_copy_only=False).astype(float)
        buckets = _bucket_of(vals)
        # per-(part, bucket) counts via a tiny in-batch group_by
        t = pa.table({
            "part": batch.column(part_col),
            "bucket": pa.array(buckets.astype(np.int64), pa.int64()),
        })
        g = t.group_by(["part", "bucket"]).aggregate([([], "count_all")])
        return g.rename_columns(["part", "bucket", "cnt"])

    per_pb = (
        ds.map_batches(_hist, batch_format="pyarrow")
        .groupby(["part", "bucket"])
        .sum("cnt")
    )
    # driver state: n_parts × n_buckets rows, independent of data size
    counts: dict = {}
    for r in per_pb.take_all():
        counts.setdefault(r["part"], np.zeros(n_buckets, np.int64))[
            r["bucket"]
        ] = r["sum(cnt)"]
    assert len(counts) <= max_parts, (
        f"{len(counts)} parts exceeds max_parts={max_parts}; "
        f"grouped_global_rank needs a low-cardinality part_col"
    )
    offsets = {
        p: np.concatenate([[0], np.cumsum(c)[:-1]]) for p, c in counts.items()
    }

    def _tag(batch: pa.Table) -> pa.Table:
        vals = batch.column(value_col).to_numpy(zero_copy_only=False).astype(float)
        return batch.append_column(
            "bucket", pa.array(_bucket_of(vals).astype(np.int64), pa.int64())
        )

    def _rank_group(group: pa.Table) -> pa.Table:
        part = group.column(part_col)[0].as_py()
        b = int(group.column("bucket")[0].as_py())
        idx = pc.sort_indices(group, sort_keys=[
            (value_col, "descending" if descending else "ascending"),
            (tie_col, "ascending"),
        ])
        g = group.take(idx)
        rnk = offsets[part][b] + np.arange(1, g.num_rows + 1, dtype=np.int64)
        return g.drop_columns(["bucket"]).append_column(
            rank_col, pa.array(rnk, pa.int64())
        )

    return (
        ds.map_batches(_tag, batch_format="pyarrow")
        .groupby([part_col, "bucket"])
        .map_groups(_rank_group, batch_format="pyarrow")
    )
