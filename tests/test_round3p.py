"""Round-3p surfaces: per-conversation context windows, collect_set."""

import pyarrow as pa
import pytest


def test_context_windows_query_vs_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as e

    got = e.queries()["turns_context_windows"]("/root/testdata/sf0.001").to_pandas()
    sql = e.oracle_sql()["turns_context_windows"].replace("sf0.01", "sf0.001")
    want = duckdb.sql(sql).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        b[c] = b[c].astype(a[c].dtype)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)
    # windows are monotone within a conversation and start at 0
    g = got.groupby("conv_id")["window_idx"]
    assert (g.min() == 0).all()
    assert got.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")[
        "window_idx"].apply(lambda s: s.is_monotonic_increasing).all()


def test_langs_by_source_query_vs_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as e

    got = e.queries()["langs_by_source"]("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = con.execute(e.oracle_sql()["langs_by_source"]).fetchdf()
    a = got.sort_values("source").reset_index(drop=True)
    b = want[a.columns].sort_values("source").reset_index(drop=True)
    for c in a.columns:
        b[c] = b[c].astype(a[c].dtype)
    assert a.equals(b)
