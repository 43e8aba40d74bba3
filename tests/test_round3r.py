"""Round-3r surface: corpus-mix composition report."""

import pytest


def test_corpus_mix_query_vs_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as e

    got = e.queries()["corpus_mix"]("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = con.execute(e.oracle_sql()["corpus_mix"]).fetchdf()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        b[c] = b[c].astype(a[c].dtype)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)
    # shares sum to ~1e6 (floor slack below the number of groups)
    assert 1_000_000 - len(a) <= a["doc_share_e6"].sum() <= 1_000_000
