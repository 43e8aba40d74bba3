"""Round-3n surfaces: frequent pairs, cohort retention, grouped histogram."""

import numpy as np
import pyarrow as pa
import pytest


def test_frequent_pairs_support_threshold(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.graph import frequent_pairs

    # baskets: {1,2} x3 times, {1,3} x1, dup items inside one basket
    rows = [(10, 1), (10, 2), (10, 2),
            (11, 1), (11, 2),
            (12, 1), (12, 2),
            (13, 1), (13, 3)]
    t = pa.table({"g": pa.array([r[0] for r in rows], pa.int64()),
                  "i": pa.array([r[1] for r in rows], pa.int64())})
    out = frequent_pairs(rd.from_arrow(t).repartition(3), group_col="g",
                         item_col="i", min_support=2).to_pandas()
    got = {(r.u, r.v): r.support for r in out.itertuples()}
    assert got == {(1, 2): 3}


def test_cohort_retention_triangle(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.windows import cohort_retention

    W = 7 * 86_400_000_000
    rows = [
        (1, 0), (1, 0), (1, 1), (1, 3),   # cohort 0, active weeks {0,1,3}
        (2, 1), (2, 2),                   # cohort 1, active weeks {1,2}
        (3, 0),                           # cohort 0, week 0 only
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * W + 5 for r in rows], pa.timestamp("us")),
    })
    out = cohort_retention(rd.from_arrow(t).repartition(2)).to_pandas()
    got = {(r.cohort_week, r.week_offset): r.n_users for r in out.itertuples()}
    assert got == {(0, 0): 2, (0, 1): 1, (0, 3): 1, (1, 0): 1, (1, 1): 1}


def test_grouped_histogram_bins(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.quality import grouped_histogram

    t = pa.table({
        "g": pa.array(["a", "a", "a", "b"]),
        "v": pa.array([0.5, 24.9, 25.0, -1.0]),
    })
    out = grouped_histogram(rd.from_arrow(t).repartition(2), group_col="g",
                            value_col="v", bin_width=25.0).to_pandas()
    got = {(r.g, r.bin): r.n for r in out.itertuples()}
    # floor semantics: 25.0 → bin 1; -1.0 → bin -1
    assert got == {("a", 0): 2, ("a", 1): 1, ("b", -1): 1}


def test_round3n_queries_vs_duckdb(ray_session):
    """frequent_part_pairs / cohort_retention / events_value_hist
    hash-match their DuckDB oracles at sf0.001."""
    import duckdb

    import __ray_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for tbl in ("events", "lineitem"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{tbl}.parquet')"
        )
    for name in ("frequent_part_pairs", "cohort_retention",
                 "events_value_hist"):
        got = q[name]("/root/testdata/sf0.001").to_pandas()
        want = con.execute(o[name]).fetchdf()
        cols = sorted(got.columns)
        assert cols == sorted(want.columns), name
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        for c in cols:
            b[c] = b[c].astype(a[c].dtype)
        b = b[cols].sort_values(cols).reset_index(drop=True)
        assert a.equals(b), f"{name}: value mismatch"
