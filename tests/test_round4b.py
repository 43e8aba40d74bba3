"""Round-4 additions: distributed multinomial Naive Bayes classifier."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_table():
    # deliberately includes: an empty text, a null text, repeated tokens
    # (multinomial counts multiplicity), and a doc full of unseen-ish rares
    rows = [
        (0, "the cat sat on the mat", "en"),
        (1, "le chat est sur le tapis", "fr"),
        (2, "the dog ate the bone", "en"),
        (3, "le chien mange le os", "fr"),
        (4, "cat cat cat dog", "en"),
        (5, "chat chat chien", "fr"),
        (6, "", "en"),
        (7, None, "fr"),
        (8, "  the   cat\tchat  ", "en"),
        (9, "zzz qqq xxx", "fr"),
    ]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def _duck_score(weights: pa.Table, labels: pa.Table, docs: pa.Table):
    import duckdb

    con = duckdb.connect()
    con.register("w", weights)
    con.register("l", labels)
    con.register("documents", docs)
    return con.sql(
        "WITH t AS (SELECT doc_id, unnest(list_filter("
        "regexp_split_to_array(COALESCE(text, ''), '\\s+'), x -> x <> '')) "
        "AS token FROM documents), "
        "s AS (SELECT d.doc_id, l.label, "
        "ANY_VALUE(l.prior_e6) + COALESCE(SUM(CASE WHEN t.token IS NULL "
        "THEN 0 ELSE COALESCE(w.w_e6, l.default_e6) END), 0) AS score_e6 "
        "FROM documents d CROSS JOIN l "
        "LEFT JOIN t ON t.doc_id = d.doc_id "
        "LEFT JOIN w ON w.label = l.label AND w.token = t.token "
        "GROUP BY d.doc_id, l.label), "
        "r AS (SELECT doc_id, label, score_e6, ROW_NUMBER() OVER ("
        "PARTITION BY doc_id ORDER BY score_e6 DESC, label ASC) AS rn FROM s) "
        "SELECT doc_id, label AS pred_label, CAST(score_e6 AS BIGINT) "
        "AS score_e6 FROM r WHERE rn = 1 ORDER BY doc_id"
    ).df()


def test_nb_train_score_matches_duckdb(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.classify import (
        score_naive_bayes,
        train_naive_bayes,
    )

    docs = _docs_table()
    ds = rd.from_arrow(docs).repartition(4)
    model = train_naive_bayes(ds, text_col="text", label_col="lang")
    got = (
        score_naive_bayes(rd.from_arrow(docs).repartition(3), model)
        .sort("doc_id")
        .to_pandas()
    )
    want = _duck_score(model["weights"], model["labels"], docs)
    import pandas as pd

    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False,
    )
    # sanity on the separable part of the toy corpus
    pred = dict(zip(got["doc_id"], got["pred_label"]))
    assert pred[0] == "en" and pred[1] == "fr"
    assert pred[4] == "en" and pred[5] == "fr"


def test_nb_partition_invariance(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.classify import train_naive_bayes

    docs = _docs_table()
    m1 = train_naive_bayes(rd.from_arrow(docs).repartition(1))
    m7 = train_naive_bayes(rd.from_arrow(docs).repartition(7))
    assert m1["weights"].equals(m7["weights"])
    assert m1["labels"].equals(m7["labels"])


def test_nb_model_semantics(ray_session):
    """Weights are exactly log((cnt+1)/(total+V)) e6; priors count docs
    including empty/null-text ones; min_count drops global-rare tokens."""
    import math

    import ray.data as rd

    from logjuicer_ray.functions.classify import train_naive_bayes

    docs = _docs_table()
    model = train_naive_bayes(rd.from_arrow(docs))
    lab = model["labels"].to_pandas().set_index("label")
    # 5 en docs incl. the empty-text one... doc 6 ('' -> en) and 8 count
    assert int(lab.loc["en", "n_docs"]) == 5
    assert int(lab.loc["fr", "n_docs"]) == 5
    w = model["weights"].to_pandas()
    V = w["token"].nunique()
    tot_en = int(lab.loc["en", "total_tokens"])
    row = w[(w.label == "en") & (w.token == "the")]
    cnt_the = round(
        math.exp(int(row.w_e6.iloc[0]) / 1e6) * (tot_en + V) - 1
    )
    assert cnt_the == 5  # 'the' appears 5x in en docs (incl doc 8)
    # min_count=2 drops tokens with global count 1 ('zzz' etc.)
    m2 = train_naive_bayes(rd.from_arrow(docs), min_count=2)
    toks2 = set(m2["weights"].to_pandas()["token"])
    assert "zzz" not in toks2 and "the" in toks2


def test_nb_driver_bound(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.classify import train_naive_bayes

    with pytest.raises(ValueError, match="driver bound"):
        train_naive_bayes(rd.from_arrow(_docs_table()), driver_vocab_rows=3)


def test_nb_save_load_roundtrip(tmp_path, ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    from logjuicer_ray.functions.classify import (
        save_nb_model,
        train_naive_bayes,
    )

    model = train_naive_bayes(rd.from_arrow(_docs_table()))
    paths = save_nb_model(model, str(tmp_path))
    w = pq.read_table(f"{paths['weights']}/part-00000.parquet")
    l = pq.read_table(f"{paths['labels']}/part-00000.parquet")
    assert w.equals(model["weights"]) and l.equals(model["labels"])
    # overwrite is atomic-replace, not append
    paths = save_nb_model(model, str(tmp_path))
    w2 = pq.read_table(f"{paths['weights']}/part-00000.parquet")
    assert w2.equals(model["weights"])


def _pr_edges(pairs):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "u": pa.array([p[0] for p in pairs], pa.int64()),
        "v": pa.array([p[1] for p in pairs], pa.int64()),
    }))


def test_pagerank_broadcast_equals_join_mode(ray_session):
    """The broadcast-vector PageRank path is bit-identical to the
    join+groupby path (same float64 floor per edge, int64 sums) on a
    random graph under multiple partitionings."""
    from logjuicer_ray.functions.graph import pagerank

    rng = np.random.default_rng(11)
    pairs = sorted({(int(a), int(b)) for a, b in
                    rng.integers(0, 40, (150, 2)) if a < b})
    want = (
        pagerank(_pr_edges(pairs), mode="join")
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    for parts in (1, 4):
        got = (
            pagerank(_pr_edges(pairs).repartition(parts), mode="broadcast")
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        assert got.equals(want), parts


def test_pagerank_broadcast_bound_strict_and_auto(ray_session):
    """Above driver_rank_rows: strict broadcast raises, auto falls back
    to the join path and still produces the same ranks."""
    from logjuicer_ray.functions.graph import pagerank

    pairs = [(0, 1), (1, 2), (2, 3), (0, 3)]
    with pytest.raises(ValueError, match="driver_rank_rows"):
        pagerank(_pr_edges(pairs), mode="broadcast", driver_rank_rows=2)
    want = pagerank(_pr_edges(pairs), mode="join").to_pandas()
    got = pagerank(_pr_edges(pairs), mode="auto", driver_rank_rows=2).to_pandas()
    assert (
        got.sort_values("node").reset_index(drop=True)
        .equals(want.sort_values("node").reset_index(drop=True))
    )


def test_cooccurrence_edges_sorted_exchange_vs_bruteforce(ray_session):
    """The sorted-exchange pair generator (vectorized repeat/arange block
    kernel + cross-group dedup on the apply exchange) matches a driver
    brute force on a random incidence table, under several partitionings,
    including duplicate (group, item) rows."""
    import collections

    import ray.data as rd

    from logjuicer_ray.functions.graph import cooccurrence_edges

    rng = np.random.default_rng(7)
    g = rng.integers(0, 120, 1500)
    i = rng.integers(0, 40, 1500)
    t = pa.table({"g": pa.array(g, pa.int64()), "i": pa.array(i, pa.int64())})
    groups = collections.defaultdict(set)
    for a, b in zip(g, i):
        groups[a].add(b)
    want = set()
    for items in groups.values():
        s = sorted(items)
        for x in range(len(s)):
            for y in range(x + 1, len(s)):
                want.add((s[x], s[y]))
    for parts in (1, 4):
        out = cooccurrence_edges(
            rd.from_arrow(t).repartition(parts), group_col="g", item_col="i"
        ).to_pandas()
        got = set(zip(out["u"], out["v"]))
        assert got == want and len(out) == len(want), parts


def test_cooccurrence_edges_string_items(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.graph import cooccurrence_edges

    ts = pa.table({
        "g": pa.array([1, 1, 2, 2, 2], pa.int64()),
        "i": pa.array(["b", "a", "c", "a", "c"]),
    })
    out = cooccurrence_edges(
        rd.from_arrow(ts), group_col="g", item_col="i"
    ).to_pandas()
    assert set(zip(out["u"], out["v"])) == {("a", "b"), ("a", "c")}


def test_triangle_broadcast_equals_join_mode(ray_session):
    """Broadcast-adjacency triangle counting (zero joins, searchsorted
    closure probe) matches the join path on a random graph, plus the
    strict-bound error and auto fallback."""
    import pandas as pd

    from logjuicer_ray.functions.graph import triangle_counts

    rng = np.random.default_rng(13)
    pairs = sorted({(int(a), int(b)) for a, b in
                    rng.integers(0, 120, (800, 2)) if a < b})
    want = (
        triangle_counts(_pr_edges(pairs), mode="join")
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    for parts in (1, 4):
        got = (
            triangle_counts(_pr_edges(pairs).repartition(parts),
                            mode="broadcast")
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    with pytest.raises(ValueError, match="driver_edge_rows"):
        triangle_counts(_pr_edges(pairs), mode="broadcast",
                        driver_edge_rows=10)
    auto = triangle_counts(_pr_edges(pairs), mode="auto",
                           driver_edge_rows=10).to_pandas()
    assert len(auto) == len(want)


def test_frequent_pairs_sorted_exchange_vs_bruteforce(ray_session):
    """frequent_pairs on the shared pair-explosion exchange matches a
    driver brute force (support counts incl. min_support filter) under
    several partitionings."""
    import collections

    import ray.data as rd

    from logjuicer_ray.functions.graph import frequent_pairs

    rng = np.random.default_rng(21)
    g = rng.integers(0, 150, 2000)
    i = rng.integers(0, 25, 2000)
    t = pa.table({"g": pa.array(g, pa.int64()), "i": pa.array(i, pa.int64())})
    groups = collections.defaultdict(set)
    for a, b in zip(g, i):
        groups[a].add(b)
    support = collections.Counter()
    for items in groups.values():
        s = sorted(items)
        for x in range(len(s)):
            for y in range(x + 1, len(s)):
                support[(s[x], s[y])] += 1
    want = {k: c for k, c in support.items() if c >= 3}
    for parts in (1, 4):
        out = frequent_pairs(
            rd.from_arrow(t).repartition(parts),
            group_col="g", item_col="i", min_support=3,
        ).to_pandas()
        got = dict(zip(zip(out["u"], out["v"]), out["support"]))
        assert got == want, parts


def test_unknown_routed_derived_model_equals_retrain(ray_session):
    """Dropping the browser groups from the standard model is identical
    to retraining without them (per-group indexes are independent) —
    the basis for report_unknown_routed reusing the memoized model."""
    import sys

    sys.path.insert(0, "/root/repo")
    import pyarrow.compute as pc

    import __ray_entry__ as e
    from logjuicer_ray.config import PipelineConfig
    from logjuicer_ray.pipelines.report import run_report
    from logjuicer_ray.pipelines.train import train
    from logjuicer_ray.sources.transcripts import baseline_and_target

    sf = "/root/testdata/sf0.001"
    base, target = baseline_and_target(e._turns_path(sf))

    def drop_browser(b):
        return b.filter(
            pc.not_equal(pc.fill_null(b.column("tool"), ""), "browser")
        )

    m_old = train(base.map_batches(drop_browser, batch_format="pyarrow"),
                  PipelineConfig(sorted_input=True))
    want = run_report(target, m_old,
                      PipelineConfig(sorted_input=True))["unknown"].to_pandas()
    got = e.queries()["report_unknown_routed"](sf).to_pandas()
    assert got.equals(want)
    # and the withheld groups really are gone from the derived model
    std = e._standard_model(sf)
    kept = {k for k in std.indexes if k.rsplit("/", 1)[-1] != "browser"}
    assert kept == set(m_old.indexes.keys())
    assert any(k.rsplit("/", 1)[-1] == "browser" for k in std.indexes)
