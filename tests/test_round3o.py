"""Round-3o surfaces: windowed event dedup, transition probabilities,
exact join-size statistics."""

import pyarrow as pa
import pytest


def test_round3o_queries_vs_duckdb(ray_session):
    """events_windowed_dedup / transition_probs / join_size_stats
    hash-match their DuckDB oracles at sf0.001."""
    import duckdb

    import ray

    import __ray_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for tbl in ("events", "orders"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{tbl}.parquet')"
        )
    for name in ("events_windowed_dedup", "transition_probs",
                 "join_size_stats"):
        got = q[name]("/root/testdata/sf0.001")
        if isinstance(got, (ray.data.Dataset, pa.Table)):
            got = got.to_pandas()
        want = con.execute(o[name]).fetchdf()
        cols = sorted(got.columns)
        assert cols == sorted(want.columns), name
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        for c in cols:
            b[c] = b[c].astype(a[c].dtype)
        b = b[cols].sort_values(cols).reset_index(drop=True)
        assert a.equals(b), f"{name}: value mismatch"


def test_windowed_dedup_first_wins(ray_session):
    import ray.data as rd

    import __ray_entry__ as e  # uses the 6h window constant

    from logjuicer_ray.functions.topk import topk_per_group

    H6 = 6 * 3_600_000_000
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "event_type": pa.array(["a", "a", "a", "b"]),
        # two in window 0 (tie on ts → min id), one in window 1
        "ts_us": pa.array([100, 100, H6 + 5, 50], pa.int64()),
        "win": pa.array([0, 0, 1, 0], pa.int64()),
        "event_id": pa.array([9, 3, 7, 1], pa.int64()),
    })
    out = topk_per_group(
        rd.from_arrow(t).repartition(2),
        group_cols=["user_id", "event_type", "win"],
        order_col="ts_us", k=1, tie_cols=["event_id"], descending=False,
    ).to_pandas()
    got = {(r.event_type, r.win): r.event_id for r in out.itertuples()}
    assert got == {("a", 0): 3, ("a", 1): 7, ("b", 0): 1}
