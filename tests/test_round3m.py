"""Round-3m surfaces: grouped MAD, grouped least-squares, table checksum."""

import numpy as np
import pyarrow as pa
import pytest


def test_grouped_mad_known_values(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.stats import grouped_mad

    t = pa.table({
        "g": pa.array(["a"] * 5 + ["b"] * 4),
        "x": pa.array([1, 2, 3, 4, 100, 10, 10, 10, 10], pa.int64()),
    })
    out = grouped_mad(rd.from_arrow(t).repartition(3), group_col="g",
                      col="x").to_pandas().set_index("g")
    # a: median=3 (percentile_disc), devs {2,1,0,1,97} → median dev = 1
    assert out.loc["a", "med"] == 3 and out.loc["a", "mad"] == 1
    # b: constant → mad 0
    assert out.loc["b", "med"] == 10 and out.loc["b", "mad"] == 0


def test_grouped_linreg_exact_line_and_degenerate(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.stats import grouped_linreg

    xs = np.arange(1, 21, dtype=np.int64)
    ys = 3 * xs + 7          # exact line: slope 3, intercept 7
    t = pa.table({
        "g": pa.array(["l"] * 20 + ["c"] * 3),
        "x": pa.array(list(xs) + [5, 5, 5], pa.int64()),
        "y": pa.array(list(ys) + [1, 2, 9], pa.int64()),
    })
    out = grouped_linreg(rd.from_arrow(t).repartition(4), group_col="g",
                         x_col="x", y_col="y").to_pandas().set_index("g")
    assert out.loc["l", "slope_e6"] == 3_000_000
    assert out.loc["l", "intercept_e6"] == 7_000_000
    # zero x-variance → nulls
    assert out.loc["c", ["slope_e6", "intercept_e6"]].isna().all()


def test_table_checksum_order_and_partition_invariant(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.stats import table_checksum

    rng = np.random.default_rng(23)
    ids = list(range(50))
    texts = [f"t{i}-{rng.integers(0, 9)}" for i in ids]
    t = pa.table({"id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    base = table_checksum(rd.from_arrow(t), ["id", "text"])
    # shuffled rows, different partitioning → identical checksum
    perm = rng.permutation(50)
    t2 = t.take(pa.array(perm, pa.int64()))
    again = table_checksum(rd.from_arrow(t2).repartition(7), ["id", "text"])
    assert base.equals(again)
    # one changed value → different checksum, same count
    t3 = t.set_column(1, "text", pa.array(texts[:-1] + ["tampered"]))
    changed = table_checksum(rd.from_arrow(t3), ["id", "text"])
    assert changed.column("n_rows")[0].as_py() == 50
    assert changed.column("sum_hash")[0] != base.column("sum_hash")[0]
    # duplicate-sensitivity: XOR would cancel paired duplicates — the
    # modular-SUM fold must distinguish {A,A,B} from {B,C,C}
    a = pa.table({"id": pa.array([1, 1, 2], pa.int64()),
                  "text": pa.array(["A", "A", "B"])})
    b = pa.table({"id": pa.array([2, 3, 3], pa.int64()),
                  "text": pa.array(["B", "C", "C"])})
    ca = table_checksum(rd.from_arrow(a), ["text"])
    cb = table_checksum(rd.from_arrow(b), ["text"])
    assert ca.column("n_rows")[0].as_py() == cb.column("n_rows")[0].as_py() == 3
    assert ca.column("sum_hash")[0] != cb.column("sum_hash")[0]


def test_round3m_queries_vs_duckdb(ray_session):
    """lineitem_mad / lineitem_trend / docs_checksum hash-match their
    DuckDB oracles at sf0.001."""
    import duckdb

    import __ray_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for tbl in ("documents", "lineitem"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{tbl}.parquet')"
        )
    import ray

    for name in ("lineitem_mad", "lineitem_trend", "docs_checksum"):
        got = q[name]("/root/testdata/sf0.001")
        if isinstance(got, ray.data.Dataset):
            got = got.to_pandas()
        elif isinstance(got, pa.Table):
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
