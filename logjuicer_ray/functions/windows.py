"""Keyed windowing operators: gap-based sessionization.

Engine addition beyond the reference (which has only whole-source scans):
the standard event-stream sessionization a training-data pipeline needs for
"group user activity into visits".

Distribution shape: ONE keyed shuffle (``groupby(key)``), then a fully
vectorized per-group kernel (numpy lexsort + diff + reduceat) — the same
partitioning key should be reused by neighboring stages at scale.  Skewed
keys: a single user's events must be co-resident for gap semantics; a
pathological hot key is bounded by per-user event counts, not dataset size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["sessionize", "hopping_window_agg", "rolling_agg", "window_funcs",
           "funnel_users", "resample_dense", "event_transitions", "cohort_retention"]


def _session_group(
    group: pa.Table, *, key: str, ts_col: str, id_col: str, gap_us: int
) -> pa.Table:
    ts = group.column(ts_col)
    ts = ts.combine_chunks() if isinstance(ts, pa.ChunkedArray) else ts
    t = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
    ids = group.column(id_col)
    ids = (ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids).to_numpy(
        zero_copy_only=False
    )
    n = len(t)
    order = np.lexsort((ids, t))
    t_s, id_s = t[order], ids[order]
    brk = np.zeros(n, dtype=np.int64)
    brk[1:] = (t_s[1:] - t_s[:-1]) > gap_us
    sess = np.cumsum(brk)
    starts = np.flatnonzero(np.r_[True, sess[1:] != sess[:-1]])
    ends = np.r_[starts[1:], n]
    key_val = group.column(key)[0].as_py()
    n_out = len(starts)
    min_ids = np.minimum.reduceat(id_s, starts)
    max_ids = np.maximum.reduceat(id_s, starts)
    return pa.table(
        {
            key: pa.array([key_val] * n_out, group.schema.field(key).type),
            "session_idx": pa.array(sess[starts], pa.int64()),
            "session_start": pa.array(t_s[starts], pa.int64()).cast(ts.type),
            "session_end": pa.array(t_s[ends - 1], pa.int64()).cast(ts.type),
            "n_events": pa.array(ends - starts, pa.int64()),
            "min_event_id": pa.array(min_ids, pa.int64()),
            "max_event_id": pa.array(max_ids, pa.int64()),
        }
    )


def sessionize(ds, *, key: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id", gap_minutes: int = 30):
    """Split each key's event stream into sessions separated by silence
    longer than ``gap_minutes``; one output row per session with start/end
    timestamps, event count and min/max event id.

    Semantics match the SQL window formulation (LAG gap flags → running sum
    → GROUP BY session): events are ordered by (ts, id) within a key; a new
    session starts strictly when the gap to the previous event exceeds the
    threshold.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    import pyarrow as _pa  # noqa: F401

    ds = ds.select_columns([key, ts_col, id_col])
    return ds.groupby(key).map_groups(
        lambda g: _session_group(g, key=key, ts_col=ts_col, id_col=id_col, gap_us=gap_us),
        batch_format="pyarrow",
    )


def _rolling_group(group: pa.Table, *, key: str, ts_col: str, id_col: str,
                   val_col: str, window: int) -> pa.Table:
    ts = group.column(ts_col)
    ts = ts.combine_chunks() if isinstance(ts, pa.ChunkedArray) else ts
    t = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
    ids_arr = group.column(id_col)
    ids = (ids_arr.combine_chunks() if isinstance(ids_arr, pa.ChunkedArray) else ids_arr
           ).to_numpy(zero_copy_only=False)
    vals = group.column(val_col)
    v = (vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals
         ).to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ids, t))
    id_s, v_s = ids[order], v[order]
    n = len(v_s)
    cs = np.cumsum(v_s, dtype=np.int64)
    roll = cs.copy()
    if n > window:
        roll[window:] = cs[window:] - cs[:-window]
    cnt = np.minimum(np.arange(1, n + 1, dtype=np.int64), window)
    key_val = group.column(key)[0].as_py()
    return pa.table(
        {
            key: pa.array([key_val] * n, group.schema.field(key).type),
            id_col: pa.array(id_s, pa.int64()),
            "roll_sum": pa.array(roll, pa.int64()),
            "roll_n": pa.array(cnt, pa.int64()),
        }
    )


def rolling_agg(ds, *, key: str = "user_id", ts_col: str = "ts",
                id_col: str = "event_id", val_col: str, window: int = 4):
    """Per-key rolling sum/count over the last ``window`` rows (the SQL
    ``ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW`` frame), ordered by
    (ts, id) within each key — the standard moving-average primitive.

    ``val_col`` must already be an exact integer column (e.g. micro-units):
    prefix-sum differences are then bit-exact regardless of partitioning and
    match the SQL window frame's term-by-term sum.

    Distribution shape: ONE keyed shuffle (``groupby(key)``), then a fully
    vectorized per-group kernel (lexsort + cumsum + shifted difference,
    O(n) per key).  Hot keys are bounded by per-key row counts."""
    ds = ds.select_columns([key, ts_col, id_col, val_col])
    return ds.groupby(key).map_groups(
        lambda g: _rolling_group(
            g, key=key, ts_col=ts_col, id_col=id_col, val_col=val_col, window=window
        ),
        batch_format="pyarrow",
    )


def _window_funcs_group(group: pa.Table, *, key: str, order_cols: list[str],
                        val_col: str, lag_default: int) -> pa.Table:
    cols = []
    for c in reversed(order_cols):
        arr = group.column(c)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        cols.append(arr.cast(pa.int64()).to_numpy(zero_copy_only=False))
    order = np.lexsort(tuple(cols))
    vals = group.column(val_col)
    v = (vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals
         ).to_numpy(zero_copy_only=False).astype(np.int64)[order]
    n = len(v)
    rn = np.arange(1, n + 1, dtype=np.int64)
    lag = np.empty(n, dtype=np.int64)
    lag[0] = lag_default
    lag[1:] = v[:-1]
    run = np.cumsum(v, dtype=np.int64)
    key_val = group.column(key)[0].as_py()
    out = {key: pa.array([key_val] * n, group.schema.field(key).type)}
    for c in order_cols:
        arr = group.column(c)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        out[c] = arr.take(pa.array(order, pa.int64()))
    out["rn"] = pa.array(rn, pa.int64())
    out[f"lag_{val_col}"] = pa.array(lag, pa.int64())
    out[f"run_{val_col}"] = pa.array(run, pa.int64())
    return pa.table(out)


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

    Distribution shape: ONE keyed shuffle (``groupby(key)``) then a fully
    vectorized per-group kernel (lexsort + cumsum + shift, O(n log n) per
    key).  Hot keys are bounded by per-key row counts — the same bound the
    SQL window frame itself requires."""
    ds = ds.select_columns([key, *order_cols, val_col])
    return ds.groupby(key).map_groups(
        lambda g: _window_funcs_group(
            g, key=key, order_cols=order_cols, val_col=val_col,
            lag_default=lag_default,
        ),
        batch_format="pyarrow",
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
    import pyarrow.compute as pc

    if window_minutes % hop_minutes:
        raise ValueError("window must be a multiple of hop")
    w_us = window_minutes * 60 * 1_000_000
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


def _funnel_group(group: pa.Table, *, key: str, ts_col: str, type_col: str,
                  steps: list[str]) -> pa.Table:
    """Strictly-ordered funnel match for one key: t_i = min ts of step i
    with ts > t_{i-1}.  Vectorized per step (one boolean mask + min), no
    per-event Python."""
    ts = group.column(ts_col)
    ts = ts.combine_chunks() if isinstance(ts, pa.ChunkedArray) else ts
    t = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
    et = group.column(type_col).to_pandas().to_numpy()
    prev = -(2**63)
    hits: list[int] = []
    for step in steps:
        cand = t[(et == step) & (t > prev)]
        if not len(cand):
            return pa.table({
                key: group.column(key).slice(0, 0),
                **{f"t_{s}_us": pa.array([], pa.int64()) for s in steps},
            })
        prev = int(cand.min())
        hits.append(prev)
    return pa.table({
        key: group.column(key).slice(0, 1),
        **{f"t_{s}_us": pa.array([h], pa.int64()) for s, h in zip(steps, hits)},
    })


def funnel_users(ds, *, key: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type", steps: list[str]):
    """Ordered funnel analysis: keys whose event stream contains the
    ``steps`` sequence with strictly increasing timestamps, greedily
    matched (each step takes the EARLIEST occurrence after the previous
    step — the standard product-analytics funnel definition; greedy
    earliest-match is optimal for existence, so no backtracking).
    Returns one row per completing key with ``t_<step>_us`` epoch-µs
    columns.

    One keyed shuffle (``groupby(key)``), per-group work O(events of that
    key) with one vectorized mask per funnel step.  Same key-skew bound as
    :func:`sessionize`."""
    if not steps:
        raise ValueError("funnel_users needs at least one step")
    return (
        ds.select_columns([key, ts_col, type_col])
        .groupby(key)
        .map_groups(
            lambda g: _funnel_group(
                g, key=key, ts_col=ts_col, type_col=type_col, steps=list(steps)
            ),
            batch_format="pyarrow",
        )
    )


def _resample_group(group: pa.Table, *, key: str, ts_col: str,
                    unit_us: int) -> pa.Table:
    ts = group.column(ts_col)
    ts = ts.combine_chunks() if isinstance(ts, pa.ChunkedArray) else ts
    t = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
    hr = t // unit_us
    lo, hi = int(hr.min()), int(hr.max())
    counts = np.bincount(hr - lo, minlength=hi - lo + 1).astype(np.int64)
    key_val = group.column(key)[0].as_py()
    n = hi - lo + 1
    return pa.table({
        key: pa.array([key_val] * n, group.schema.field(key).type),
        "bucket_us": pa.array((np.arange(lo, hi + 1) * unit_us), pa.int64()),
        "n_events": pa.array(counts, pa.int64()),
    })


def resample_dense(ds, *, key: str = "user_id", ts_col: str = "ts",
                   unit_us: int = 3_600_000_000):
    """Dense time-series resample: one row per ``unit_us`` bucket per key
    between that key's first and last event, zero-filled — the gap-filling
    step before windowed feature extraction.  One keyed shuffle, then a
    vectorized per-group kernel (floor-div + bincount over the key's own
    span).  Emits (key, bucket_us, n_events); a key's output is bounded by
    its time span / unit, independent of dataset size."""
    return (
        ds.select_columns([key, ts_col])
        .groupby(key)
        .map_groups(
            lambda g: _resample_group(g, key=key, ts_col=ts_col, unit_us=unit_us),
            batch_format="pyarrow",
        )
    )


def _transitions_group(group: pa.Table, *, key: str, ts_col: str,
                       id_col: str, type_col: str) -> pa.Table:
    ts = group.column(ts_col)
    ts = ts.combine_chunks() if isinstance(ts, pa.ChunkedArray) else ts
    t = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
    ids = group.column(id_col)
    ids = (ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
           ).to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, t))
    et = group.column(type_col)
    et = et.combine_chunks() if isinstance(et, pa.ChunkedArray) else et
    ordered = et.take(pa.array(order, pa.int64()))
    n = len(order)
    if n < 2:
        return pa.table({"from_type": pa.array([], pa.string()),
                         "to_type": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    frm = ordered.slice(0, n - 1)
    to = ordered.slice(1, n - 1)
    tt = pa.table({"from_type": frm, "to_type": to})
    g = tt.group_by(["from_type", "to_type"]).aggregate([([], "count_all")])
    return g.rename_columns(["from_type", "to_type", "cnt"])


def event_transitions(ds, *, key: str = "user_id", ts_col: str = "ts",
                      id_col: str = "event_id", type_col: str = "event_type"):
    """First-order Markov transition counts over each key's event stream
    ordered by (ts, id): global (from_type, to_type, cnt) — the sequence-
    mining primitive behind session-flow analysis.  One keyed shuffle +
    vectorized per-group adjacent pairs (in-group Arrow group_by partial),
    then a tiny keyed sum over unique type pairs."""
    from ray.data.aggregate import Sum

    partials = (
        ds.select_columns([key, ts_col, id_col, type_col])
        .groupby(key)
        .map_groups(
            lambda g: _transitions_group(
                g, key=key, ts_col=ts_col, id_col=id_col, type_col=type_col
            ),
            batch_format="pyarrow",
        )
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
