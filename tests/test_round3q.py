"""Round-3q surfaces: referential-integrity (foreign-key) checks."""

import pyarrow as pa
import pytest


def test_check_foreign_key_broadcast_and_antijoin_paths(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.quality import check_foreign_key

    fact = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 3, 9, None], pa.int64())}))
    ref = rd.from_arrow(pa.table({
        "r": pa.array([1, 2, 3, 3, 4], pa.int64())}))
    for limit in (1_000_000, 1):   # broadcast path, then anti-join path
        out = check_foreign_key(fact, col="k", ref=ref, ref_col="r",
                                broadcast_limit=limit)
        assert out.column("n_rows")[0].as_py() == 6, limit
        # orphans: the 9 (nulls don't count)
        assert out.column("n_orphans")[0].as_py() == 1, limit


def test_fk_checks_query_vs_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as e

    got = e.queries()["fk_checks"]("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    for tbl in ("orders", "customer", "lineitem", "part"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{tbl}.parquet')"
        )
    want = con.execute(e.oracle_sql()["fk_checks"]).fetchdf()
    a = got.sort_values("fk").reset_index(drop=True)
    b = want[a.columns].sort_values("fk").reset_index(drop=True)
    for c in a.columns:
        b[c] = b[c].astype(a[c].dtype)
    assert a.equals(b)
    assert a.set_index("fk").loc["orders->even_customer", "n_orphans"] > 0
