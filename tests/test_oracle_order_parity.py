"""Order-parity sweep (VERDICT r3 ask #3): every oracle-bearing query in
``__ray_entry__.queries()`` runs at sf0.001 and must equal its DuckDB oracle
EXACTLY — schema, values AND row order (no row sorting before compare).

This is strictly stronger than the driver's hash compare and catches the
``fk_checks`` class of bug: values correct but emitted in a different order
than the oracle's ORDER BY.
"""

import os

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _oracle_names():
    import __ray_entry__ as e

    return sorted(e.oracle_sql().keys())


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    yield con
    con.close()


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_order_parity(ray_session, duck, name):
    import __ray_entry__ as e

    out = e.queries()[name](SF_DIR)
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    sql = e.oracle_sql()[name].replace("sf0.01", "sf0.001")
    want = duck.sql(sql).df()

    assert len(out) == len(want), f"rows {len(out)} vs {len(want)}"
    assert sorted(out.columns) == sorted(want.columns)
    cols = sorted(out.columns)
    a = out[cols].reset_index(drop=True)
    b = want[cols].reset_index(drop=True)
    for c in cols:
        av, bv = a[c], b[c]
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(
            bv.dtype, np.floating
        ):
            assert np.allclose(
                av.astype(float).fillna(-9e99),
                bv.astype(float).fillna(-9e99),
                rtol=1e-9,
                atol=1e-12,
            ), f"float column {c} diverges (order-sensitive)"
        else:
            assert av.astype(str).equals(bv.astype(str)), (
                f"column {c} diverges (order-sensitive); first diff at row "
                f"{int(np.argmax((av.astype(str) != bv.astype(str)).values))}"
            )
