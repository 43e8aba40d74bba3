"""Data-quality operators: table profiling and declarative constraint
checking — the validation layer a 100-TB ingest needs before training.

- :func:`profile_table`: one long-format row per profiled column with
  null count, non-null count, and min/max (rendered as strings so mixed
  column types share one output schema).  Mergeable per-batch partials:
  each batch contributes one tiny row per column; the driver never sees
  data rows.
- :func:`check_constraints`: declarative expectations → one row per
  constraint with its violation count.  Three constraint kinds cover the
  common contracts:
    ``("not_null", col)``          — col IS NULL counts as a violation
    ``("range", col, lo, hi)``     — non-null value outside [lo, hi]
    ``("in_set", col, values)``    — non-null value not in the list
    ``("unique", col)``            — rows beyond the first per value
  The first three are stateless vectorized predicates (no shuffle);
  ``unique`` is the only one that must exchange data and moves one row
  per DISTINCT value (in-batch pre-dedup + keyed count, the same shape
  as exact dedup, functions/dedup.py:44-69).

No reference analog (the reference validates nothing beyond config
regexes, crates/model/src/config.rs:197-213); extends the engine's
data-ops surface per the brief.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["profile_table", "check_constraints", "grouped_histogram",
           "check_foreign_key", "percentile_band"]


def percentile_band(ds, *, value_col: str, tie_col: str,
                    lo: float, hi: float, descending: bool = False,
                    keep_cols: list | None = None):
    """Keep rows whose exact global percentile rank over
    ``(value_col, tie_col)`` lies in ``[lo, hi]`` — the middle-band
    quality-filter recipe (drop the worst tail AND the
    suspiciously-perfect head; cf. the percentile filtering used by
    CCNet/Gopher-style curation).

    ``pct_rank = (row_number - 1) / (n - 1)``, identical to SQL
    ``PERCENT_RANK()`` with a unique tie-break, computed from the exact
    distributed rank (:func:`~logjuicer_ray.functions.rank.global_rank`:
    range-partition histogram, O(n_buckets) driver state, one keyed
    exchange).  The corpus never concentrates anywhere; the band filter is
    a stateless vectorized map over the ranked stream.  Returns the input
    columns plus ``rnk`` (1-based) and ``pct_rank`` (float64, unrounded —
    the same IEEE division SQL performs)."""
    from .rank import global_rank

    n = ds.count()
    ranked = global_rank(ds, value_col=value_col, tie_col=tie_col,
                         descending=descending, keep_cols=keep_cols)
    denom = float(max(n - 1, 1))

    def _band(b: pa.Table) -> pa.Table:
        rnk = b.column("rnk").to_numpy(zero_copy_only=False)
        pct = (rnk - 1) / denom
        t = b.append_column("pct_rank", pa.array(pct, pa.float64()))
        return t.filter(pa.array((pct >= lo) & (pct <= hi)))

    return ranked.map_batches(_band, batch_format="pyarrow")


def profile_table(ds, columns: list[str]):
    """Long-format profile: (column, n_null, n_value, min_str, max_str)
    per requested column.  min/max are cast to strings AFTER the typed
    comparison (numeric columns compare numerically, then render)."""

    def _kind(typ: pa.DataType) -> str:
        # carried into the merge so partials re-compare in the ORIGINAL
        # column type: a string column of digit-like values stays
        # lexicographic and int64 > 2^53 never round-trips through float
        if pa.types.is_integer(typ):
            return "int"
        if pa.types.is_floating(typ) or pa.types.is_decimal(typ):
            return "float"
        return "str"

    def _partial(batch: pa.Table) -> pa.Table:
        names, nn, nv, mins, maxs, kinds = [], [], [], [], [], []
        for c in columns:
            col = batch.column(c)
            n_null = col.null_count
            valid = pc.drop_null(col)
            names.append(c)
            nn.append(n_null)
            nv.append(len(valid))
            kinds.append(_kind(col.type))
            if len(valid):
                mm = pc.min_max(valid)
                mins.append(str(mm["min"].as_py()))
                maxs.append(str(mm["max"].as_py()))
            else:
                mins.append(None)
                maxs.append(None)
        return pa.table({
            "column": pa.array(names, pa.string()),
            "n_null": pa.array(nn, pa.int64()),
            "n_value": pa.array(nv, pa.int64()),
            "min_str": pa.array(mins, pa.string()),
            "max_str": pa.array(maxs, pa.string()),
            "kind": pa.array(kinds, pa.string()),
        })

    def _merge(group: pa.Table) -> pa.Table:
        name = group.column("column")[0].as_py()
        kind = group.column("kind")[0].as_py()
        mins = pc.drop_null(group.column("min_str"))
        maxs = pc.drop_null(group.column("max_str"))

        def _typed_extreme(vals, biggest: bool):
            pyv = vals.to_pylist()
            if not pyv:
                return None
            if kind == "int":
                key = [int(x) for x in pyv]        # arbitrary precision
            elif kind == "float":
                key = [float(x) for x in pyv]
            else:
                key = pyv                          # lexicographic
            pick = max(range(len(key)), key=key.__getitem__) if biggest \
                else min(range(len(key)), key=key.__getitem__)
            return pyv[pick]

        return pa.table({
            "column": pa.array([name], pa.string()),
            "n_null": pa.array([pc.sum(group.column("n_null")).as_py()], pa.int64()),
            "n_value": pa.array([pc.sum(group.column("n_value")).as_py()], pa.int64()),
            "min_str": pa.array([_typed_extreme(mins, False)], pa.string()),
            "max_str": pa.array([_typed_extreme(maxs, True)], pa.string()),
        })

    return (
        ds.select_columns(columns)
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("column")
        .map_groups(_merge, batch_format="pyarrow")
    )


def check_constraints(ds, constraints: list[tuple]):
    """Evaluate declarative constraints; returns one row per constraint:
    (constraint, n_violations).  See module docstring for kinds."""
    stateless = []
    uniques = []
    for spec in constraints:
        kind = spec[0]
        if kind == "unique":
            uniques.append(spec)
        elif kind in ("not_null", "range", "in_set"):
            stateless.append(spec)
        else:
            raise ValueError(f"unknown constraint kind: {kind!r}")

    def _label(spec) -> str:
        kind, col = spec[0], spec[1]
        if kind == "range":
            return f"range:{col}:[{spec[2]},{spec[3]}]"
        if kind == "in_set":
            return f"in_set:{col}"
        return f"{kind}:{col}"

    def _partial(batch: pa.Table) -> pa.Table:
        labels, counts = [], []
        for spec in stateless:
            kind, col = spec[0], spec[1]
            c = batch.column(col)
            if kind == "not_null":
                n = c.null_count
            elif kind == "range":
                lo, hi = spec[2], spec[3]
                bad = pc.or_(pc.less(c, lo), pc.greater(c, hi))
                n = pc.sum(pc.cast(pc.fill_null(bad, False), pa.int64())).as_py() or 0
            else:  # in_set
                ok = pc.is_in(c, value_set=pa.array(list(spec[2])))
                bad = pc.and_(pc.invert(ok), pc.is_valid(c))
                n = pc.sum(pc.cast(bad, pa.int64())).as_py() or 0
            labels.append(_label(spec))
            counts.append(int(n))
        return pa.table({
            "constraint": pa.array(labels, pa.string()),
            "n_violations": pa.array(counts, pa.int64()),
        })

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("constraint")
        .aggregate(Sum("n_violations", alias_name="n_violations"))
    )

    for spec in uniques:
        col = spec[1]

        def _pairs(batch: pa.Table, col=col) -> pa.Table:
            # NULLs are not duplicate-able values: mirror SQL's
            # COUNT(col) - COUNT(DISTINCT col), which ignores NULLs
            t = batch.select([col]).drop_null()
            t = t.group_by([col]).aggregate([([], "count_all")])
            return t.rename_columns([col, "cnt"])

        dup = (
            ds.map_batches(_pairs, batch_format="pyarrow")
            .groupby(col)
            .aggregate(Sum("cnt", alias_name="cnt"))
        )

        def _excess(batch: pa.Table) -> pa.Table:
            cnt = batch.column("cnt").to_numpy(zero_copy_only=False)
            extra = int((cnt - 1).clip(min=0).sum())
            return pa.table({
                "constraint": pa.array([f"unique:{col}"], pa.string()),
                "n_violations": pa.array([extra], pa.int64()),
            })

        u = (
            dup.map_batches(_excess, batch_format="pyarrow")
            .groupby("constraint")
            .aggregate(Sum("n_violations", alias_name="n_violations"))
        )
        out = out.union(u)
    return out


def grouped_histogram(ds, *, group_col: str, value_col: str,
                      bin_width: float):
    """Fixed-width histogram per group: (group, bin, n) with
    ``bin = floor(value / bin_width)`` — the distribution-monitoring
    companion to :func:`profile_table`.  In-batch bincount partials, one
    keyed sum over (group, bin) — values never shuffle."""
    import numpy as np

    def _bins(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        b = np.floor(v / bin_width).astype(np.int64)
        t = pa.table({
            group_col: batch.column(group_col),
            "bin": pa.array(b, pa.int64()),
        })
        g = t.group_by([group_col, "bin"]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, "bin", "n"])

    from ray.data.aggregate import Sum

    return (
        ds.select_columns([group_col, value_col])
        .map_batches(_bins, batch_format="pyarrow")
        .groupby([group_col, "bin"])
        .aggregate(Sum("n", alias_name="n"))
    )


def check_foreign_key(ds, *, col: str, ref, ref_col: str,
                      broadcast_limit: int = 1_000_000):
    """Referential-integrity check: count rows of ``ds`` whose non-null
    ``col`` has no match in ``ref[ref_col]``.  Returns a one-row pyarrow
    Table (n_rows, n_orphans).

    Scale shape: the reference is first REDUCED to its distinct keys
    (in-batch pre-dedup + keyed count — bounded by key cardinality, not
    ref rows).  If the distinct-key count fits ``broadcast_limit``, the
    key set broadcasts via ``ray.put`` and each fact batch runs one
    vectorized ``is_in`` — no fact shuffle at all.  Above the limit the
    orphan count comes from a native left_anti hash join (both sides
    key-reduced; the fact side ships (key, count) partials, never rows).
    """
    import ray
    from ray.data.aggregate import Sum

    def _keys(b: pa.Table) -> pa.Table:
        return b.select([ref_col]).group_by([ref_col]).aggregate([])

    ref_keys = (
        ref.map_batches(_keys, batch_format="pyarrow")
        .groupby(ref_col).count()
        .select_columns([ref_col])
        .materialize()
    )
    n_ref = ref_keys.count()

    def _fact_counts(b: pa.Table) -> pa.Table:
        # nulls are not FK violations — drop them before the key groupby
        # (the null group would otherwise survive the anti-join as a
        # phantom orphan)
        t = b.select([col]).drop_null().group_by([col]).aggregate(
            [([], "count_all")]
        )
        return t.rename_columns([col, "cnt"])

    if n_ref <= broadcast_limit:
        # ≤ broadcast_limit distinct keys: a bounded driver materialization
        key_ref = ray.put(pa.array([r[ref_col] for r in ref_keys.take_all()]))

        def _count(b: pa.Table) -> pa.Table:
            keys = ray.get(key_ref)
            c = b.column(col)
            orphan = pc.and_(pc.invert(pc.is_in(c, value_set=keys)),
                             pc.is_valid(c))
            n = pc.sum(pc.cast(orphan, pa.int64())).as_py() or 0
            return pa.table({
                "n_rows": pa.array([b.num_rows], pa.int64()),
                "n_orphans": pa.array([int(n)], pa.int64()),
            })

        parts = ds.map_batches(_count, batch_format="pyarrow").take_all()
        return pa.table({
            "n_rows": pa.array([sum(p["n_rows"] for p in parts)], pa.int64()),
            "n_orphans": pa.array([sum(p["n_orphans"] for p in parts)],
                                  pa.int64()),
        })

    facts = (
        ds.map_batches(_fact_counts, batch_format="pyarrow")
        .groupby(col).aggregate(Sum("cnt", alias_name="cnt"))
        .repartition(4)
    )
    orphans = facts.join(ref_keys.repartition(4), join_type="left_anti",
                         on=(col,), right_on=(ref_col,),
                         num_partitions=8).materialize()
    n_total = sum(r["cnt"] for r in
                  ds.map_batches(
                      lambda b: pa.table({"cnt": pa.array([b.num_rows], pa.int64())}),
                      batch_format="pyarrow").take_all())
    n_orph = 0 if orphans.count() == 0 else sum(
        r["cnt"] for r in orphans.take_all()
    )
    return pa.table({"n_rows": pa.array([n_total], pa.int64()),
                     "n_orphans": pa.array([int(n_orph)], pa.int64())})
