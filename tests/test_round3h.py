"""Round-3h surfaces: ordered conversation export, bigram top-k, n-gram
decontamination, distributed global rank/ntile."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_table(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_export_conversations_orders_and_counts(ray_session):
    """Reassembly joins turns in turn_idx order across fragment/block
    boundaries; counters are exact."""
    import ray.data as rd

    from logjuicer_ray.functions.corpus import export_conversations

    rng = np.random.default_rng(11)
    rows = []
    for c in range(7):
        n = int(rng.integers(1, 40))
        for i in range(n):
            rows.append((f"c{c:02d}", i, f"c{c}-turn{i}-" + "x" * int(rng.integers(0, 5))))
    rng.shuffle(rows)
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "text": pa.array([r[2] for r in rows]),
    })
    # many tiny blocks so conversations straddle block boundaries
    out = export_conversations(
        rd.from_arrow(t).repartition(9), key_col="conv_id",
        order_col="turn_idx", text_col="text", sep="\n",
    ).to_pandas().set_index("conv_id").sort_index()

    import collections
    want = collections.defaultdict(list)
    for c, i, s in sorted(rows):
        want[c].append(s)
    assert len(out) == 7
    for c, parts in want.items():
        assert out.loc[c, "full_text"] == "\n".join(parts)
        assert out.loc[c, "n_turns"] == len(parts)
        assert out.loc[c, "n_bytes"] == sum(len(p.encode()) for p in parts)


def test_bigram_topk_counts(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.corpus import bigram_topk

    docs = _docs_table([
        "a b a b c",      # bigrams: a b, b a, a b, b c
        "a b",            # a b
        "solo",           # none
        "",               # none
    ])
    out = bigram_topk(rd.from_arrow(docs).repartition(3), k=10).to_pandas()
    got = dict(zip(out["bigram"], out["cnt"]))
    assert got == {"a b": 3, "b a": 1, "b c": 1}
    # rank is (count desc, bigram asc)
    assert list(out.sort_values("rank")["bigram"]) == ["a b", "b a", "b c"]


def test_ngram_decontaminate_flags_overlap_only(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.corpus import ngram_decontaminate, probe_grams_of

    probe = _docs_table(["p q r s t u v"], ids=[0])          # grams incl "p q r s t"
    corpus = _docs_table([
        "x p q r s t y",   # contains "p q r s t" once → 1 hit
        "p q r s t u z p q r s t u",  # grams "p q r s t"(x2),"q r s t u"(x2)... count occurrences
        "no overlap here at all friend",
        "short one",       # < 5 tokens → no shingles
    ], ids=[1, 2, 3, 4])
    grams = probe_grams_of(rd.from_arrow(probe), text_col="text", n=5)
    assert "p q r s t" in grams
    out = ngram_decontaminate(
        rd.from_arrow(corpus).repartition(2), grams, n=5
    ).to_pandas().set_index("doc_id")
    assert set(out.index) == {1, 2}
    assert out.loc[1, "n_gram_hits"] == 1
    # doc 2 windows: "p q r s t"(2), "q r s t u"(2), plus overlapping ones
    # crossing the repeat ("s t u z p", ...) — count exactly vs brute force
    toks = "p q r s t u z p q r s t u".split()
    brute = sum(" ".join(toks[i:i + 5]) in set(grams) for i in range(len(toks) - 4))
    assert out.loc[2, "n_gram_hits"] == brute


def test_global_rank_matches_argsort_and_ntile(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.rank import global_rank

    rng = np.random.default_rng(5)
    n = 1000
    vals = np.round(rng.normal(1000, 200, n), 2)
    vals[100:110] = vals[0]  # ties share a bucket, break by key
    keys = rng.permutation(n).astype(np.int64)
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    out = (
        global_rank(rd.from_arrow(t).repartition(7), value_col="v",
                    tie_col="k", descending=True, ntile=7)
        .to_pandas().sort_values("rnk").reset_index(drop=True)
    )
    order = sorted(range(n), key=lambda i: (-vals[i], keys[i]))
    assert list(out["k"]) == [int(keys[i]) for i in order]
    assert list(out["rnk"]) == list(range(1, n + 1))
    # SQL ntile: first n % k tiles get n//k + 1 rows
    sizes = out.groupby("bucket").size()
    big, rem = n // 7 + 1, n % 7
    assert all(sizes.loc[b] == big for b in range(1, rem + 1))
    assert all(sizes.loc[b] == n // 7 for b in range(rem + 1, 8))


def test_global_rank_ascending_no_ntile(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.rank import global_rank

    t = pa.table({"k": pa.array([3, 1, 2], pa.int64()),
                  "v": pa.array([30.0, 10.0, 20.0])})
    out = (
        global_rank(rd.from_arrow(t), value_col="v", tie_col="k",
                    descending=False)
        .to_pandas().sort_values("rnk")
    )
    assert list(out["k"]) == [1, 2, 3]
    assert "bucket" not in out.columns


def test_round3h_queries_vs_duckdb(ray_session):
    """bigram_topk_docs / decontaminated_docs / orders_ranked hash-match
    their DuckDB oracles at sf0.001."""
    import duckdb

    import __ray_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for tbl in ("documents", "orders"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{tbl}.parquet')"
        )
    for name in ("bigram_topk_docs", "decontaminated_docs", "orders_ranked"):
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


def test_turns_export_query_vs_duckdb(ray_session):
    """turns_export hash-matches the ordered string_agg oracle at sf0.001."""
    import duckdb

    import __ray_entry__ as e

    got = e.queries()["turns_export"]("/root/testdata/sf0.001").to_pandas()
    sql = e.oracle_sql()["turns_export"].replace("sf0.01", "sf0.001")
    want = duckdb.sql(sql).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    a = got[cols].sort_values("conv_id").reset_index(drop=True)
    b = want[cols].sort_values("conv_id").reset_index(drop=True)
    for c in cols:
        b[c] = b[c].astype(a[c].dtype)
    assert a.equals(b)
