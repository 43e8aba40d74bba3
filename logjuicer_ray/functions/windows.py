"""Keyed windowing operators: gap-based sessionization, rolling/window
functions, funnels, dense resampling, transitions, cohort retention.

Engine addition beyond the reference (which has only whole-source scans):
the standard event-stream operators a training-data pipeline needs for
"group user activity into visits".

Distribution shape: the per-key operators run on the sorted grouped-apply
exchange (``functions/segments.py sorted_group_apply``): ONE range-shuffle
sort on (key, ts, id), then a vectorized SEGMENT kernel per block that
processes every complete key group at once (reduceat / cumsum / repeat
over the group offsets — zero per-group Python), with only the
O(2 × n_blocks) boundary segments taking the tiny repair pass.  This
replaces ``groupby(key).map_groups``: Ray's hash-aggregate exchange is
~50× slower than its sort at high key cardinality (segments.py module
docstring), and one Python call per key is a 100M-interpreter-round-trip
tax at 100M users.  Skewed keys: a single user's events must still be
co-resident for gap semantics; a pathological hot key is bounded by
per-user event counts, not dataset size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["sessionize", "hopping_window_agg", "rolling_agg", "window_funcs",
           "funnel_users", "resample_dense", "event_transitions", "cohort_retention"]


def _np_col(table: pa.Table, name: str, cast=None) -> np.ndarray:
    col = table.column(name)
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if cast is not None:
        col = col.cast(cast)
    return col.to_numpy(zero_copy_only=False)


def _seg_ids(offsets: np.ndarray, n: int) -> np.ndarray:
    """Row → segment index for rows 0..n-1 given sorted segment starts."""
    counts = np.diff(np.append(offsets, n))
    return np.repeat(np.arange(len(offsets), dtype=np.int64), counts)


def sessionize(ds, *, key: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id", gap_minutes: int = 30):
    """Split each key's event stream into sessions separated by silence
    longer than ``gap_minutes``; one output row per session with start/end
    timestamps, event count and min/max event id.

    Semantics match the SQL window formulation (LAG gap flags → running sum
    → GROUP BY session): events are ordered by (ts, id) within a key; a new
    session starts strictly when the gap to the previous event exceeds the
    threshold.  Runs on the sorted grouped-apply exchange (module
    docstring): every complete key in a block is sessionized by one
    vectorized pass (diff + reduceat over the session starts)."""
    from .segments import sorted_group_apply

    gap_us = gap_minutes * 60 * 1_000_000

    def _session_block(sub: pa.Table, offsets) -> pa.Table:
        import pyarrow.compute as pc  # noqa: F401

        n = sub.num_rows
        ts_type = sub.schema.field(ts_col).type
        if n == 0:
            return pa.table({
                key: sub.column(key),
                "session_idx": pa.array([], pa.int64()),
                "session_start": pa.array([], pa.int64()).cast(ts_type),
                "session_end": pa.array([], pa.int64()).cast(ts_type),
                "n_events": pa.array([], pa.int64()),
                "min_event_id": pa.array([], pa.int64()),
                "max_event_id": pa.array([], pa.int64()),
            })
        offsets = np.asarray(offsets, dtype=np.int64)
        t = _np_col(sub, ts_col, pa.int64())
        ids = _np_col(sub, id_col)
        brk = np.zeros(n, dtype=bool)
        brk[0] = True
        brk[1:] = (t[1:] - t[:-1]) > gap_us
        brk[offsets] = True
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], n]
        # session ordinal within its key segment
        off_end = np.append(offsets, n)
        sess_seg = np.searchsorted(off_end, starts, side="right") - 1
        first_sess = np.searchsorted(starts, offsets)
        session_idx = np.arange(len(starts), dtype=np.int64) - first_sess[sess_seg]
        heads = pa.array(starts, pa.int64())
        return pa.table({
            key: sub.column(key).take(heads),
            "session_idx": pa.array(session_idx, pa.int64()),
            "session_start": pa.array(t[starts], pa.int64()).cast(ts_type),
            "session_end": pa.array(t[ends - 1], pa.int64()).cast(ts_type),
            "n_events": pa.array(ends - starts, pa.int64()),
            "min_event_id": pa.array(np.minimum.reduceat(ids, starts), pa.int64()),
            "max_event_id": pa.array(np.maximum.reduceat(ids, starts), pa.int64()),
        })

    return sorted_group_apply(
        ds.select_columns([key, ts_col, id_col]),
        key_cols=[key], order_cols=[ts_col, id_col],
        apply_block=_session_block,
    )


def rolling_agg(ds, *, key: str = "user_id", ts_col: str = "ts",
                id_col: str = "event_id", val_col: str, window: int = 4):
    """Per-key rolling sum/count over the last ``window`` rows (the SQL
    ``ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW`` frame), ordered by
    (ts, id) within each key — the standard moving-average primitive.

    ``val_col`` must already be an exact integer column (e.g. micro-units):
    prefix-sum differences are then bit-exact regardless of partitioning and
    match the SQL window frame's term-by-term sum.

    Sorted grouped-apply exchange: one global cumsum per block, each row's
    frame start clipped to its own key segment — all keys in a block roll
    in one vectorized pass."""
    from .segments import sorted_group_apply

    def _rolling_block(sub: pa.Table, offsets) -> pa.Table:
        n = sub.num_rows
        if n == 0:
            return pa.table({
                key: sub.column(key),
                id_col: pa.array([], pa.int64()),
                "roll_sum": pa.array([], pa.int64()),
                "roll_n": pa.array([], pa.int64()),
            })
        offsets = np.asarray(offsets, dtype=np.int64)
        ids = _np_col(sub, id_col)
        v = _np_col(sub, val_col).astype(np.int64)
        cs = np.cumsum(v, dtype=np.int64)
        i = np.arange(n, dtype=np.int64)
        seg_start = offsets[_seg_ids(offsets, n)]
        lo = np.maximum(seg_start, i - window + 1)
        roll = cs - np.where(lo > 0, cs[np.maximum(lo - 1, 0)], 0)
        return pa.table({
            key: sub.column(key),
            id_col: pa.array(ids.astype(np.int64), pa.int64()),
            "roll_sum": pa.array(roll, pa.int64()),
            "roll_n": pa.array(i - lo + 1, pa.int64()),
        })

    return sorted_group_apply(
        ds.select_columns([key, ts_col, id_col, val_col]),
        key_cols=[key], order_cols=[ts_col, id_col],
        apply_block=_rolling_block,
    )


def window_funcs(ds, *, key: str, order_cols: list[str], val_col: str,
                 lag_default: int = -1):
    """The classic SQL window-function trio per key, ordered by
    ``order_cols`` (all integer-castable, e.g. timestamp + id tie-break):

    - ``rn``              = ROW_NUMBER() OVER w            (1-based)
    - ``lag_<val_col>``   = LAG(val) OVER w                (``lag_default``
      on the first row — an explicit sentinel instead of SQL NULL so the
      column stays non-null int64 end to end)
    - ``run_<val_col>``   = SUM(val) OVER w ROWS UNBOUNDED PRECEDING

    ``val_col`` must be an exact integer column (cents / micro-units) so
    running sums are bit-exact under any partitioning.

    Sorted grouped-apply exchange: rn/lag/run computed for every key in a
    block with one arange/shift/cumsum pass over the segment offsets."""
    from .segments import sorted_group_apply

    def _window_block(sub: pa.Table, offsets) -> pa.Table:
        n = sub.num_rows
        if n == 0:
            out = {key: sub.column(key)}
            for c in order_cols:
                out[c] = sub.column(c)
            out["rn"] = pa.array([], pa.int64())
            out[f"lag_{val_col}"] = pa.array([], pa.int64())
            out[f"run_{val_col}"] = pa.array([], pa.int64())
            return pa.table(out)
        offsets = np.asarray(offsets, dtype=np.int64)
        v = _np_col(sub, val_col).astype(np.int64)
        cs = np.cumsum(v, dtype=np.int64)
        i = np.arange(n, dtype=np.int64)
        seg_start = offsets[_seg_ids(offsets, n)]
        rn = i - seg_start + 1
        lag = np.empty(n, dtype=np.int64)
        lag[0] = lag_default
        lag[1:] = v[:-1]
        lag[offsets] = lag_default
        run = cs - np.where(seg_start > 0, cs[np.maximum(seg_start - 1, 0)], 0)
        out = {key: sub.column(key)}
        for c in order_cols:
            out[c] = sub.column(c)
        out["rn"] = pa.array(rn, pa.int64())
        out[f"lag_{val_col}"] = pa.array(lag, pa.int64())
        out[f"run_{val_col}"] = pa.array(run, pa.int64())
        return pa.table(out)

    return sorted_group_apply(
        ds.select_columns([key, *order_cols, val_col]),
        key_cols=[key], order_cols=list(order_cols),
        apply_block=_window_block,
    )


def hopping_window_agg(ds, *, ts_col: str = "ts", value_col: str,
                       window_minutes: int, hop_minutes: int,
                       group_cols: list[str] | None = None):
    """Hopping (sliding) window aggregate: every event lands in the
    ``window/hop`` windows whose start lies in ``(ts - window, ts]`` on the
    hop grid.  Per-batch: vectorized window explode + in-batch partial
    aggregation (so the keyed shuffle moves (window, group) partial rows,
    never ``window/hop`` copies of the events), then one small groupby.

    Emits (group_cols..., window_start, n_events, sum_<value_col>) with
    ``window_start`` as timestamp[us].  ``window_minutes`` must be a
    multiple of ``hop_minutes``."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc  # noqa: F401

    if window_minutes % hop_minutes:
        raise ValueError("window must be a multiple of hop")
    w_us = window_minutes * 60 * 1_000_000  # noqa: F841 (documents the frame)
    h_us = hop_minutes * 60 * 1_000_000
    n_hops = window_minutes // hop_minutes
    group_cols = list(group_cols or [])
    sum_name = f"sum_{value_col}"

    def explode_partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = (ts // h_us) * h_us
        n = len(ts)
        # window starts: base - j*h for j in 0..n_hops-1 (all within (ts-w, ts])
        starts = np.repeat(base, n_hops) - np.tile(
            np.arange(n_hops, dtype=np.int64) * h_us, n
        )
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), n_hops))
        t = batch.select(group_cols + [value_col]).take(idx)
        t = t.append_column("window_start", pa.array(starts, pa.int64()))
        agg = t.group_by(group_cols + ["window_start"]).aggregate(
            [(value_col, "sum"), ([], "count_all")]
        )
        return agg.rename_columns(group_cols + ["window_start", sum_name, "n_events"])

    from ray.data.aggregate import Sum

    partial = ds.map_batches(explode_partial, batch_format="pyarrow")
    out = partial.groupby(group_cols + ["window_start"]).aggregate(
        Sum(sum_name, alias_name=sum_name), Sum("n_events", alias_name="n_events")
    )

    def finish(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("window_start")
        ws = batch.column("window_start").cast(pa.timestamp("us"))
        batch = batch.set_column(i, "window_start", ws)
        j = batch.schema.get_field_index("n_events")
        return batch.set_column(
            j, "n_events", batch.column("n_events").cast(pa.int64())
        )

    return out.map_batches(finish, batch_format="pyarrow")


def funnel_users(ds, *, key: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type", steps: list[str]):
    """Ordered funnel analysis: keys whose event stream contains the
    ``steps`` sequence with strictly increasing timestamps, greedily
    matched (each step takes the EARLIEST occurrence after the previous
    step — the standard product-analytics funnel definition; greedy
    earliest-match is optimal for existence, so no backtracking).
    Returns one row per completing key with ``t_<step>_us`` epoch-µs
    columns.

    Sorted grouped-apply exchange; per step, ALL keys in a block advance
    together with one masked ``minimum.reduceat`` over the segment
    offsets."""
    from .segments import sorted_group_apply

    if not steps:
        raise ValueError("funnel_users needs at least one step")
    steps = list(steps)
    INT64_MAX = np.iinfo(np.int64).max

    def _funnel_block(sub: pa.Table, offsets) -> pa.Table:
        n = sub.num_rows
        if n == 0:
            return pa.table({
                key: sub.column(key),
                **{f"t_{s}_us": pa.array([], pa.int64()) for s in steps},
            })
        offsets = np.asarray(offsets, dtype=np.int64)
        t = _np_col(sub, ts_col, pa.int64())
        et = sub.column(type_col).to_pandas().to_numpy()
        seg = _seg_ids(offsets, n)
        nseg = len(offsets)
        prev = np.full(nseg, -(2 ** 63), dtype=np.int64)
        alive = np.ones(nseg, dtype=bool)
        hits = []
        for step in steps:
            cand = (et == step) & (t > prev[seg])
            vals = np.where(cand, t, INT64_MAX)
            m = np.minimum.reduceat(vals, offsets)
            alive &= m != INT64_MAX
            prev = np.where(alive, m, prev)
            hits.append(m)
        heads = pa.array(offsets[alive], pa.int64())
        return pa.table({
            key: sub.column(key).take(heads),
            **{f"t_{s}_us": pa.array(h[alive], pa.int64())
               for s, h in zip(steps, hits)},
        })

    return sorted_group_apply(
        ds.select_columns([key, ts_col, type_col]),
        key_cols=[key], order_cols=[ts_col],
        apply_block=_funnel_block,
    )


def resample_dense(ds, *, key: str = "user_id", ts_col: str = "ts",
                   unit_us: int = 3_600_000_000):
    """Dense time-series resample: one row per ``unit_us`` bucket per key
    between that key's first and last event, zero-filled — the gap-filling
    step before windowed feature extraction.  Emits (key, bucket_us,
    n_events); a key's output is bounded by its time span / unit,
    independent of dataset size.

    Sorted grouped-apply exchange: per-key spans via min/max reduceat, one
    composite bincount fills every key's dense grid in a single pass."""
    from .segments import sorted_group_apply

    def _resample_block(sub: pa.Table, offsets) -> pa.Table:
        n = sub.num_rows
        if n == 0:
            return pa.table({
                key: sub.column(key),
                "bucket_us": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
            })
        offsets = np.asarray(offsets, dtype=np.int64)
        t = _np_col(sub, ts_col, pa.int64())
        hr = t // unit_us
        lo_k = np.minimum.reduceat(hr, offsets)
        hi_k = np.maximum.reduceat(hr, offsets)
        n_k = hi_k - lo_k + 1
        out_off = np.concatenate([[0], np.cumsum(n_k)])
        seg = _seg_ids(offsets, n)
        counts = np.bincount(
            out_off[seg] + (hr - lo_k[seg]), minlength=int(out_off[-1])
        ).astype(np.int64)
        total = int(out_off[-1])
        seg_of_out = np.repeat(np.arange(len(offsets), dtype=np.int64), n_k)
        within = np.arange(total, dtype=np.int64) - out_off[seg_of_out]
        bucket = (lo_k[seg_of_out] + within) * unit_us
        heads = pa.array(offsets[seg_of_out], pa.int64())
        return pa.table({
            key: sub.column(key).take(heads),
            "bucket_us": pa.array(bucket, pa.int64()),
            "n_events": pa.array(counts, pa.int64()),
        })

    return sorted_group_apply(
        ds.select_columns([key, ts_col]),
        key_cols=[key], order_cols=[ts_col],
        apply_block=_resample_block,
    )


def event_transitions(ds, *, key: str = "user_id", ts_col: str = "ts",
                      id_col: str = "event_id", type_col: str = "event_type"):
    """First-order Markov transition counts over each key's event stream
    ordered by (ts, id): global (from_type, to_type, cnt) — the sequence-
    mining primitive behind session-flow analysis.  Sorted grouped-apply
    exchange emits in-block adjacent-pair partials (segment boundaries
    masked out), then a tiny keyed sum over unique type pairs."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from .segments import sorted_group_apply

    def _pairs_block(sub: pa.Table, offsets) -> pa.Table:
        n = sub.num_rows
        if n < 2:
            return pa.table({
                "from_type": pa.array([], pa.string()),
                "to_type": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            })
        offsets = np.asarray(offsets, dtype=np.int64)
        ta = sub.column(type_col)
        ta = ta.combine_chunks() if isinstance(ta, pa.ChunkedArray) else ta
        mask = np.ones(n - 1, dtype=bool)
        internal = offsets[1:] - 1  # row i where i+1 starts a new key
        mask[internal] = False
        keep = pa.array(mask)
        tt = pa.table({
            "from_type": pc.cast(ta.slice(0, n - 1), pa.string()).filter(keep),
            "to_type": pc.cast(ta.slice(1, n - 1), pa.string()).filter(keep),
        })
        g = tt.group_by(["from_type", "to_type"]).aggregate([([], "count_all")])
        g = g.rename_columns(["from_type", "to_type", "cnt"])
        return g.set_column(2, "cnt", g.column("cnt").cast(pa.int64()))

    partials = sorted_group_apply(
        ds.select_columns([key, ts_col, id_col, type_col]),
        key_cols=[key], order_cols=[ts_col, id_col],
        apply_block=_pairs_block,
    )
    return partials.groupby(["from_type", "to_type"]).aggregate(
        Sum("cnt", alias_name="cnt")
    )


def cohort_retention(ds, *, key: str = "user_id", ts_col: str = "ts",
                     week_us: int = 7 * 86_400_000_000):
    """Weekly cohort retention: users grouped by their FIRST active week
    (absolute weeks since epoch — deterministic, no calendar config), then
    counted per (cohort_week, week_offset) over their distinct active
    weeks.  The standard retention triangle.

    Three reduced exchanges, none row-sized: distinct (user, week) pairs
    (in-batch pre-dedup), per-user Min for the cohort, a broadcast-free
    native join back on user, and the final pair count."""
    from ray.data.aggregate import Min, Sum

    def _weeks(batch: pa.Table) -> pa.Table:
        t = batch.column(ts_col)
        t = t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t
        wk = t.cast(pa.int64()).to_numpy(zero_copy_only=False) // week_us
        p = pa.table({key: batch.column(key), "week": pa.array(wk, pa.int64())})
        return p.group_by([key, "week"]).aggregate([])

    active = (
        ds.select_columns([key, ts_col])
        .map_batches(_weeks, batch_format="pyarrow")
        .groupby([key, "week"]).count()
        .select_columns([key, "week"])
        .materialize()  # feeds both the cohort Min and the join
    )
    cohorts = active.groupby(key).aggregate(Min("week", alias_name="cohort_week"))
    joined = active.join(cohorts.repartition(4), join_type="inner", on=(key,),
                         num_partitions=_cohort_partitions())

    def _offsets(batch: pa.Table) -> pa.Table:
        wk = batch.column("week").to_numpy(zero_copy_only=False)
        cw = batch.column("cohort_week").to_numpy(zero_copy_only=False)
        t = pa.table({
            "cohort_week": batch.column("cohort_week"),
            "week_offset": pa.array(wk - cw, pa.int64()),
        })
        g = t.group_by(["cohort_week", "week_offset"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["cohort_week", "week_offset", "n_users"])

    return (
        joined.map_batches(_offsets, batch_format="pyarrow")
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


def _cohort_partitions() -> int:
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, cpus // 2)
