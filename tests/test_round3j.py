"""Round-3j surfaces: BM25 retrieval, reciprocal-rank fusion, table
profiling, constraint checking."""

import numpy as np
import pyarrow as pa
import pytest


def test_bm25_known_scores(ray_session):
    """Hand-checked BM25 on a 3-doc corpus: term-frequency saturation and
    length normalization behave."""
    import math

    import ray.data as rd

    from logjuicer_ray.functions.retrieval import bm25_topk

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "cat dog",          # one 'cat', short
            "cat cat cat bird fish mouse",  # tf saturation, longer
            "bird fish",        # no query terms
        ]),
    })
    out = bm25_topk(rd.from_arrow(docs).repartition(2), ["cat"], k=10
                    ).to_pandas().set_index("doc_id")
    assert set(out.index) == {1, 2}
    # brute-force: N=3, df=2, avgdl = 10/3
    idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    for did, tf, dl in ((1, 1, 2), (2, 3, 6)):
        norm = 1.2 * (0.25 + 0.75 * dl / (10 / 3))
        want = math.floor(idf * (tf * 2.2) / (tf + norm) * 1e6 + 0.5)
        assert out.loc[did, "score_e6"] == want
    assert list(out.sort_values("rank").index) == [2, 1]


def test_bm25_partition_invariance(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.retrieval import bm25_topk

    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 25)))
             for _ in range(200)]
    t = pa.table({"doc_id": pa.array(range(200), pa.int64()),
                  "text": pa.array(texts)})
    outs = []
    for parts in (1, 7):
        out = bm25_topk(rd.from_arrow(t).repartition(parts), ["w1", "w2"], k=15)
        outs.append(out.to_pandas().sort_values("rank").reset_index(drop=True))
    assert outs[0].equals(outs[1])


def test_rrf_fuse_integer_contributions(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.retrieval import rrf_fuse

    a = rd.from_arrow(pa.table({"id": pa.array([1, 2], pa.int64()),
                                "rank": pa.array([1, 2], pa.int64())}))
    b = rd.from_arrow(pa.table({"id": pa.array([2, 3], pa.int64()),
                                "rank": pa.array([1, 2], pa.int64())}))
    out = rrf_fuse([a, b], id_col="id", k=60).to_pandas().set_index("id")
    assert out.loc[1, "rrf_e6"] == 1_000_000 // 61
    assert out.loc[2, "rrf_e6"] == 1_000_000 // 62 + 1_000_000 // 61
    assert out.loc[3, "rrf_e6"] == 1_000_000 // 62


def test_profile_and_constraints(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.quality import check_constraints, profile_table

    t = pa.table({
        "k": pa.array([3, 1, 2, 2, None], pa.int64()),
        "s": pa.array(["b", "a", None, "c", "c"]),
    })
    ds = rd.from_arrow(t).repartition(3)
    prof = profile_table(ds, ["k", "s"]).to_pandas().set_index("column")
    assert prof.loc["k", "n_null"] == 1 and prof.loc["k", "n_value"] == 4
    assert prof.loc["k", "min_str"] == "1" and prof.loc["k", "max_str"] == "3"
    assert prof.loc["s", "min_str"] == "a" and prof.loc["s", "max_str"] == "c"

    cons = check_constraints(ds, [
        ("not_null", "k"),
        ("range", "k", 1, 2),
        ("in_set", "s", ["a", "b"]),
        ("unique", "k"),
    ]).to_pandas().set_index("constraint")["n_violations"]
    assert cons["not_null:k"] == 1
    assert cons["range:k:[1,2]"] == 1      # the 3; nulls don't count
    assert cons["in_set:s"] == 2           # the two 'c's
    assert cons["unique:k"] == 1           # duplicate 2 (nulls form a group)


def test_profile_numeric_min_across_partials(ray_session):
    """Numeric columns must merge min/max numerically, not lexically:
    '9' < '10' numerically but not as strings."""
    import ray.data as rd

    from logjuicer_ray.functions.quality import profile_table

    t = pa.table({"v": pa.array([9, 10, 100, 2], pa.int64())})
    prof = profile_table(rd.from_arrow(t).repartition(4), ["v"]).to_pandas()
    assert prof.iloc[0]["min_str"] == "2"
    assert prof.iloc[0]["max_str"] == "100"


def test_round3j_queries_vs_duckdb(ray_session):
    """bm25_docs / rrf_docs / docs_profile / docs_constraints hash-match
    their DuckDB oracles at sf0.001."""
    import duckdb

    import __ray_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    for name in ("bm25_docs", "rrf_docs", "docs_profile", "docs_constraints"):
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
