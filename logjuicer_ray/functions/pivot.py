"""Pivot (long -> wide conditional aggregation) and melt (wide -> long).

Engine addition beyond the reference (whose only aggregation surface is the
per-IndexName line/byte counters, crates/model/src/model.rs:451-470): the
standard reshape pair an analytics/training-data pipeline needs.

Distribution shape:

- ``pivot_counts``: per-batch partial pivot (one Arrow ``group_by`` over the
  batch with a boolean-mask sum per category — no Python per row), then ONE
  keyed shuffle of the already-wide partials and a Sum combine.  The shuffle
  moves O(keys x categories x tasks) small integer rows, never the events.
  The category list is explicit and fixed (exactly like SQL's
  ``SUM(CASE WHEN ...)`` pivot), so the output schema is stable across
  blocks — a requirement for streaming execution.
- ``melt``: stateless per-batch explode of value columns into
  (variable, value) rows — no shuffle at all.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["pivot_counts", "melt", "melt_batch"]


def _pivot_partial(batch: pa.Table, *, key_col: str, pivot_col: str,
                   categories: list[str]) -> pa.Table:
    cat = batch.column(pivot_col)
    cols = {key_col: batch.column(key_col)}
    for c in categories:
        cols[f"n_{c}"] = pc.cast(
            pc.fill_null(pc.equal(cat, c), False), pa.int64()
        )
    cols["n_total"] = pa.array([1] * len(batch), pa.int64())
    t = pa.table(cols)
    agg = pa.TableGroupBy(t, key_col).aggregate(
        [(f"n_{c}", "sum") for c in categories] + [("n_total", "sum")]
    )
    return agg.rename_columns(
        [key_col] + [f"n_{c}" for c in categories] + ["n_total"]
    )


def pivot_counts(ds, *, key_col: str, pivot_col: str, categories: list[str]):
    """Wide per-key category counts: one int64 column ``n_<cat>`` per entry
    of ``categories`` plus ``n_total`` — SQL's
    ``SUM(CASE WHEN pivot_col = cat THEN 1 ELSE 0 END)`` pivot.  Rows whose
    category is not listed count toward ``n_total`` only."""
    from ray.data.aggregate import Sum

    partials = ds.select_columns([key_col, pivot_col]).map_batches(
        _pivot_partial, batch_format="pyarrow",
        fn_kwargs={"key_col": key_col, "pivot_col": pivot_col,
                   "categories": categories},
    )
    names = [f"n_{c}" for c in categories] + ["n_total"]
    return partials.groupby(key_col).aggregate(
        *[Sum(n, alias_name=n) for n in names]
    )


def melt_batch(batch: pa.Table, *, id_cols: list[str], value_cols: list[str],
               var_name: str = "variable", value_name: str = "value") -> pa.Table:
    """Unpivot: each input row yields ``len(value_cols)`` output rows
    (id_cols..., variable, value).  Vectorized — one concat of column
    slices, no Python per row."""
    pieces = []
    for c in value_cols:
        cols = {ic: batch.column(ic) for ic in id_cols}
        cols[var_name] = pa.array([c] * len(batch), pa.string())
        cols[value_name] = batch.column(c).cast(pa.int64())
        pieces.append(pa.table(cols))
    return pa.concat_tables(pieces)


def melt(ds, **kw):
    """Dataset-level :func:`melt_batch` — stateless, shuffle-free."""
    return ds.map_batches(melt_batch, batch_format="pyarrow", fn_kwargs=kw)
