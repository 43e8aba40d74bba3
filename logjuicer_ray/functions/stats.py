"""Robust statistics and table-integrity operators.

- :func:`grouped_mad`: per-group median absolute deviation — the robust
  dispersion measure.  Two passes of the exact-quantile machinery
  (functions/corpus.py): pass 1 reduces to unique (group, value) counts
  and picks each group's percentile_disc median; pass 2 broadcasts the
  medians (one per group) and repeats over |x − median|.  Shuffles move
  unique values, never rows.
- :func:`grouped_linreg`: per-group least-squares slope/intercept from
  EXACT integer moments (n, Σx, Σy, Σxy, Σx²) — the same
  order-independent-integer-partials contract as zscore_normalize; the
  final two float divisions run once per group in a fixed order, so the
  e6-floored output is reproducible and SQL-recomputable.  Driver-side
  moment math uses Python ints (no int64 overflow at any scale; an
  external SQL engine uses HUGEINT).
- :func:`table_checksum`: order-independent whole-table fingerprint —
  modular SUM (mod 2^64) of per-row md5-u64 hashes over the concatenated
  columns, plus the row count.  The anti-entropy primitive: two copies of
  a table compare by exchanging 16 bytes.  SUM partials per batch; the
  driver folds one (sum, count) pair per block.  md5 keeps it portable
  (SQL ``SUM(u) % 2^64`` mirror); SUM, not XOR, so paired duplicate rows
  cannot cancel; see dataset_diff for the fast-hash variant of this trade.

No reference analog; extends the engine's data-ops surface per the brief.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import md5_u64_str

__all__ = ["grouped_mad", "grouped_linreg", "table_checksum"]


def grouped_mad(ds, *, group_col: str, col: str):
    """Per-group (percentile_disc-style) median and median absolute
    deviation of an integer column.  Returns (group, med, mad)."""
    from .corpus import grouped_quantiles

    med_tbl = grouped_quantiles(ds, group_cols=[group_col], col=col, qs=[0.5])
    med = {r[group_col]: r["p50"] for r in med_tbl.take_all()}  # one per group

    def _dev(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_pylist()
        x = batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.fromiter((med[v] for v in g), dtype=np.int64, count=batch.num_rows)
        return pa.table({
            group_col: batch.column(group_col),
            "dev": pa.array(np.abs(x - m), pa.int64()),
        })

    devs = ds.select_columns([group_col, col]).map_batches(
        _dev, batch_format="pyarrow"
    )
    mad_tbl = grouped_quantiles(devs, group_cols=[group_col], col="dev", qs=[0.5])

    def _shape(batch: pa.Table) -> pa.Table:
        meds = pa.array([med[v] for v in batch.column(group_col).to_pylist()],
                        pa.int64())
        return pa.table({
            group_col: batch.column(group_col),
            "med": meds,
            "mad": pc.cast(batch.column("p50"), pa.int64()),
        })

    return mad_tbl.map_batches(_shape, batch_format="pyarrow")


def grouped_linreg(ds, *, group_col: str, x_col: str, y_col: str):
    """Per-group least-squares fit y ≈ slope·x + intercept from exact
    integer moments; emits (group, n, slope_e6, intercept_e6).
    ``x_col`` / ``y_col`` must be integer columns (cast/scale upstream:
    cents, counts).  Groups with zero x-variance emit nulls."""
    from ray.data.aggregate import Sum

    def _moments(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col)
        y = batch.column(y_col)
        t = pa.table({
            group_col: batch.column(group_col),
            "n": pa.array([1] * batch.num_rows, pa.int64()),
            "sx": pc.cast(x, pa.int64()),
            "sy": pc.cast(y, pa.int64()),
            "sxy": pc.multiply_checked(pc.cast(x, pa.int64()),
                                       pc.cast(y, pa.int64())),
            "sxx": pc.multiply_checked(pc.cast(x, pa.int64()),
                                       pc.cast(x, pa.int64())),
        })
        g = pa.TableGroupBy(t, group_col).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxy", "sum"), ("sxx", "sum")]
        )
        return g.rename_columns([group_col, "n", "sx", "sy", "sxy", "sxx"])

    moments = (
        ds.select_columns([group_col, x_col, y_col])
        .map_batches(_moments, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(*[Sum(c, alias_name=c) for c in ("n", "sx", "sy", "sxy", "sxx")])
    )
    rows = moments.take_all()  # one row per group
    out = {group_col: [], "n": [], "slope_e6": [], "intercept_e6": []}
    for r in rows:
        n, sx, sy, sxy, sxx = (int(r[c]) for c in ("n", "sx", "sy", "sxy", "sxx"))
        den = n * sxx - sx * sx
        out[group_col].append(r[group_col])
        out["n"].append(n)
        if den == 0:
            out["slope_e6"].append(None)
            out["intercept_e6"].append(None)
            continue
        # fixed float sequence, mirrored by the SQL oracle.  Each exact
        # integer converts to double FIRST (CAST(... AS DOUBLE) semantics)
        # — Python's int/int would be correctly rounded from the true
        # rational and can differ once the moments exceed 2^53.
        slope = float(n * sxy - sx * sy) / float(den)
        intercept = (float(sy) - slope * float(sx)) / float(n)
        out["slope_e6"].append(int(np.floor(slope * 1e6 + 0.5)))
        out["intercept_e6"].append(int(np.floor(intercept * 1e6 + 0.5)))
    import ray.data as rd

    return rd.from_arrow(pa.table({
        group_col: pa.array(out[group_col]),
        "n": pa.array(out["n"], pa.int64()),
        "slope_e6": pa.array(out["slope_e6"], pa.int64()),
        "intercept_e6": pa.array(out["intercept_e6"], pa.int64()),
    }))


def table_checksum(ds, columns: list[str]):
    """Order-independent table fingerprint: (n_rows, sum_hash) where
    sum_hash folds md5-u64 over each row's columns joined with US (0x1f)
    with modular SUM (mod 2^64), nulls rendered as NUL (0x00).  Identical
    content ⇒ identical checksum under ANY partitioning or row order.
    SUM (not XOR) so duplicate rows stay checksum-visible: an XOR fold
    cancels paired duplicates, letting distinct tables with equal row
    counts collide ({A,A,B} vs {B,C,C}).  SQL mirror:
    ``SUM(md5_u64)::HUGEINT % 2^64``."""

    def _partial(batch: pa.Table) -> pa.Table:
        cols = [pc.fill_null(pc.cast(batch.column(c), pa.string()), "\x00")
                for c in columns]
        joined = cols[0] if len(cols) == 1 else pc.binary_join_element_wise(
            *cols, "\x1f"
        )
        acc = 0
        for s in joined.to_pylist():
            acc = (acc + md5_u64_str(s)) & 0xFFFFFFFFFFFFFFFF
        return pa.table({
            "n_rows": pa.array([batch.num_rows], pa.int64()),
            "sum_hash": pa.array([acc], pa.uint64()),
        })

    parts = ds.select_columns(columns).map_batches(
        _partial, batch_format="pyarrow"
    ).take_all()  # one row per block
    n = sum(p["n_rows"] for p in parts)
    acc = 0
    for p in parts:
        acc = (acc + int(p["sum_hash"])) & 0xFFFFFFFFFFFFFFFF
    return pa.table({"n_rows": pa.array([n], pa.int64()),
                     "sum_hash": pa.array([acc], pa.uint64())})
