"""Per-group feature normalization (z-score) with exact integer moments.

The classic feature-scaling step, built so the float result is
bit-reproducible under any partitioning AND recomputable by an external
SQL engine:

- moments per group come from INTEGER partial sums (n, Σx, Σx²) — the
  keyed shuffle moves three ints per (group, task), and integer addition
  is order-independent, so the moments are exact;
- the float sequence per row is then FIXED:
  ``mean = Σx / n``; ``var = (n·Σx² - Σx·Σx) / (n·n)`` (population);
  ``z = (x - mean) / sqrt(var)``; emitted as ``floor(z·10⁶ + 0.5)``.
  Each division/sqrt happens once per group or row in a prescribed
  order, so DuckDB reproduces the doubles exactly.
- groups live in a broadcast dict (one row per group — labels/languages,
  not data rows); zero-variance groups emit z = 0 by definition.

``int_col`` must be an integer column (lengths, counts, cents) so the
moment sums stay exact; Σx² of a 32-bit-ish feature over 10¹² rows needs
the int64 headroom this assumes — document per use.

No reference analog; extends the engine's ML-prep surface per the brief.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["zscore_normalize"]


def zscore_normalize(ds, *, group_col: str, int_col: str,
                     id_cols: list[str] | None = None,
                     out_col: str = "z_e6"):
    """Per-group population z-score of ``int_col``, floored to e6 ints.
    Returns ``id_cols`` + group/value columns plus ``out_col``."""
    id_cols = list(id_cols or [])
    from ray.data.aggregate import Sum

    def _moments(batch: pa.Table) -> pa.Table:
        x = batch.column(int_col)
        sq = pc.multiply_checked(x, x)
        t = pa.table({
            group_col: batch.column(group_col),
            "n": pa.array([1] * batch.num_rows, pa.int64()),
            "s": pc.cast(x, pa.int64()),
            "ss": pc.cast(sq, pa.int64()),
        })
        g = pa.TableGroupBy(t, group_col).aggregate(
            [("n", "sum"), ("s", "sum"), ("ss", "sum")]
        )
        return g.rename_columns([group_col, "n", "s", "ss"])

    moments = (
        ds.select_columns([group_col, int_col])
        .map_batches(_moments, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                   Sum("ss", alias_name="ss"))
    )
    # one row per group — broadcast-sized driver state
    stats = {}
    for r in moments.take_all():
        n, s, ss = int(r["n"]), int(r["s"]), int(r["ss"])
        mean = s / n
        var = (n * ss - s * s) / (n * n)
        std = math.sqrt(var)
        stats[r[group_col]] = (mean, std)

    def _z(batch: pa.Table) -> pa.Table:
        x = batch.column(int_col).to_numpy(zero_copy_only=False).astype(np.float64)
        groups = batch.column(group_col).to_pylist()
        means = np.fromiter((stats[g][0] for g in groups), dtype=np.float64,
                            count=batch.num_rows)
        stds = np.fromiter((stats[g][1] for g in groups), dtype=np.float64,
                           count=batch.num_rows)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (x - means) / stds
        z = np.where(stds == 0.0, 0.0, z)
        e6 = np.floor(z * 1e6 + 0.5).astype(np.int64)
        return batch.append_column(out_col, pa.array(e6, pa.int64()))

    return ds.select_columns(id_cols + [group_col, int_col]).map_batches(
        _z, batch_format="pyarrow"
    )
