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

__all__ = ["sessionize"]


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
