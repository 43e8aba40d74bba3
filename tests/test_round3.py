"""Round-3 surfaces: report_counts hard oracle, fast-mode MinHash."""

import numpy as np
import pyarrow as pa
import pytest


def test_report_counts_query_vs_duckdb(ray_session):
    """The flagship scan's counts rows hash-match the SQL recomputation
    (non-empty target turns, job-output truncation, first-row role/tool)."""
    import duckdb

    import __ray_entry__ as e

    out = e.queries()["report_counts"]("/root/testdata/sf0.001").to_pandas()
    sql = e.oracle_sql()["report_counts"].replace("sf0.01", "sf0.001")
    want = duckdb.sql(sql).df()
    assert len(out) == len(want)
    cols = sorted(out.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_fast_minhash_finds_planted_near_dups():
    """Fast (multiply-shift) mode must still bucket near-identical docs —
    validity of the non-portable permutation family."""
    from logjuicer_ray.functions.dedup import MinHasher

    rng = np.random.default_rng(7)
    base = " ".join("tok%d" % v for v in rng.integers(0, 500, 300))
    near = base.replace("tok1 ", "tokX ")
    far = " ".join("other%d" % v for v in rng.integers(0, 500, 300))
    mh = MinHasher(portable=False)
    sigs = mh.signatures([base, near, far])
    agree_near = (sigs[0] == sigs[1]).mean()
    agree_far = (sigs[0] == sigs[2]).mean()
    assert agree_near > 0.6
    assert agree_far < 0.2


def test_fast_and_portable_modes_rank_similarity_identically():
    """Both hash families estimate the same Jaccard ordering."""
    from logjuicer_ray.functions.dedup import MinHasher

    docs = [
        "alpha beta gamma delta epsilon zeta eta theta " * 20,
        "alpha beta gamma delta epsilon zeta eta thetaX " * 20,
        "completely different words entirely here now " * 20,
    ]
    for portable in (True, False):
        mh = MinHasher(portable=portable)
        s = mh.signatures(docs)
        near = (s[0] == s[1]).mean()
        far = (s[0] == s[2]).mean()
        assert near > far, portable


def _mk_turns(convs):
    """convs: list of (conv_id, [text, ...]) → turns-schema Arrow table."""
    rows = {"conv_id": [], "turn_idx": [], "role": [], "text": [], "tool": [], "ts": []}
    for cid, texts in convs:
        for i, t in enumerate(texts):
            rows["conv_id"].append(cid)
            rows["turn_idx"].append(i)
            rows["role"].append("svc")
            rows["text"].append(t)
            rows["tool"].append("")
            rows["ts"].append(None)
    return pa.table(
        {
            "conv_id": pa.array(rows["conv_id"], pa.string()),
            "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
            "role": pa.array(rows["role"], pa.string()),
            "text": pa.array(rows["text"], pa.string()),
            "tool": pa.array(rows["tool"], pa.string()),
            "ts": pa.array(rows["ts"], pa.timestamp("ms")),
        }
    )


def test_global_date_two_pass_seeds_time_only_conversations(ray_session):
    """gl_date parity (model.rs:644-648): with config.global_date, the first
    timed anomaly's date seeds time-only timestamps in OTHER conversations."""
    import ray.data as rd

    from logjuicer_ray.config import PipelineConfig
    from logjuicer_ray.pipelines.report import run_report
    from logjuicer_ray.pipelines.train import train

    good = [
        "2026-03-05 09:00:00 INFO request handled path status ok",
        "2026-03-05 09:00:01 INFO cache warmed entries loaded fine",
    ] * 4
    base = rd.from_arrow(_mk_turns([("base-conv", good)]))
    cfg = PipelineConfig(sorted_input=True)
    model = train(base, cfg)

    target = _mk_turns(
        [
            (
                "a-conv",
                [
                    "2026-03-05 10:00:00 INFO request handled path status ok",
                    "2026-03-05 10:00:05 ERROR totally unexpected meltdown visible here",
                ],
            ),
            (
                "b-conv",
                [
                    # kubelet-style time-only stamps (parsed at offset 6,
                    # timestamps.rs:41-44 / timestamps.py _TIME_DOT_RE)
                    "I0305 11:22:33.444 INFO request handled path status ok",
                    "E0305 11:22:40.555 ERROR different catastrophic explosion elsewhere",
                ],
            ),
        ]
    )

    out_plain = run_report(rd.from_arrow(target), model, cfg)
    plain = {
        r["conv_id"]: r["ts"]
        for r in out_plain["anomalies"].select_columns(["conv_id", "ts"]).take_all()
    }
    assert plain["a-conv"] is not None
    assert plain["b-conv"] is None  # time-only, no date anchor

    cfg_gl = PipelineConfig(sorted_input=True, global_date=True)
    out_gl = run_report(rd.from_arrow(target), model, cfg_gl)
    seeded = {
        r["conv_id"]: r["ts"]
        for r in out_gl["anomalies"].select_columns(["conv_id", "ts"]).take_all()
    }
    # a-conv unchanged by the second pass
    assert seeded["a-conv"] == plain["a-conv"]
    # b-conv inherits a-conv's date: 2026-03-05T11:22:40.555
    from datetime import datetime

    assert seeded["b-conv"].replace(tzinfo=None) == datetime(2026, 3, 5, 11, 22, 40, 555000)


def test_global_date_noop_without_timed_anomalies(ray_session):
    """No timed anomaly anywhere → pass 1 result returned unchanged."""
    import ray.data as rd

    from logjuicer_ray.config import PipelineConfig
    from logjuicer_ray.pipelines.report import run_report
    from logjuicer_ray.pipelines.train import train

    good = ["INFO request handled path status ok"] * 6
    base = rd.from_arrow(_mk_turns([("base-conv", good)]))
    cfg = PipelineConfig(sorted_input=True, global_date=True)
    model = train(base, cfg)
    target = _mk_turns(
        [("t-conv", ["INFO request handled path status ok",
                     "ERROR surprising breakdown words appear suddenly"])]
    )
    out = run_report(rd.from_arrow(target), model, cfg)
    rows = out["anomalies"].select_columns(["conv_id", "ts"]).take_all()
    assert len(rows) == 1 and rows[0]["ts"] is None


def test_metrics_rows_written_by_cli(ray_session, tmp_path):
    """Per-stage metrics/lineage rows (model.rs:451-470 counter analog):
    the report CLI writes metrics/part-0.parquet with one row per stage."""
    import pyarrow.parquet as pq

    from logjuicer_ray.cli import main
    from logjuicer_ray.synth import ensure_turns

    path = ensure_turns(0.0003)
    out = tmp_path / "out"
    rc = main(["report", "--input", str(path), "--out", str(out), "--quiet"])
    assert rc == 0
    t = pq.read_table(out / "metrics" / "part-0.parquet")
    stages = {(r["pipeline"], r["stage"]) for r in t.to_pylist()}
    assert ("train", "tokenize+dedup+index") in stages
    assert ("report", "scan") in stages
    assert ("report", "dedup+reports") in stages
    rows = {(r["pipeline"], r["stage"]): r for r in t.to_pylist()}
    scan = rows[("report", "scan")]
    assert scan["rows_in"] > 0 and scan["rows_out"] > 0 and scan["wall_s"] > 0
    tr = rows[("train", "tokenize+dedup+index")]
    assert tr["rows_in"] >= tr["rows_out"] > 0


def test_vectorized_global_filter_parity():
    """The Arrow RE2 global filter in the tokenize stage must agree with the
    per-line Python filter on every corpus line (RE2 vs re divergence would
    silently change which lines are trained/scored)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from logjuicer_ray import tokenizer as tk
    from logjuicer_ray.stages.tokenize import _GL_FILTER_PATTERN

    lines = [
        "single", "  padded  ", "GET / HTTP/1.1 extra", "* foo: bar",
        "Trying other mirror.", "ovs-ofctl br dump-ports", "iptables -t nat -L",
        "^+ ntp1.example 10", "dnsmasq[123]: query A example.com",
        "ab3s/f>42 get", "x y z", "", "\t", "a b", "ERROR failed to start",
        "2026-01-01 00:00:00 INFO ok fine", "%GL_FILTER", "a\tb", "a\nb",
    ]
    import glob as _g, os as _o
    for p in _g.glob(_o.path.join(_o.path.dirname(__file__), "data", "datasets", "*", "*.good")):
        lines.extend(open(p).read().splitlines())
    arr = pa.array(lines, pa.string())
    stripped = pc.utf8_trim_whitespace(arr)
    vec = pc.or_(
        pc.invert(pc.match_substring_regex(stripped, r"\s")),
        pc.match_substring_regex(stripped, _GL_FILTER_PATTERN),
    ).to_pylist()
    ref = [tk._global_filter(t.strip()) for t in lines]
    assert vec == ref


def test_tokenize_stage_matches_process(ray_session):
    """End-to-end: the vectorized stage path equals per-line process()."""
    import pyarrow as pa

    from logjuicer_ray import tokenizer as tk
    from logjuicer_ray.stages.tokenize import tokenize_batch

    texts = [
        "ERROR failed to acquire lease for partition 7",
        "GET / HTTP/1.1 trailing", "lonely", "  spaced words here  ",
        "sha256://toto tata finished in 28ms by systemd[4248]", "",
    ]
    n = len(texts)
    batch = pa.table(
        {
            "conv_id": pa.array(["c"] * n), "turn_idx": pa.array(range(n), pa.int32()),
            "role": pa.array(["r"] * n), "text": pa.array(texts),
            "tool": pa.array([""] * n),
        }
    )
    out = tokenize_batch(batch)
    got = out.column("tokens").cast(pa.string()).to_pylist()
    # the stage contract: process() over the digit-FOLDED line (stage
    # pre-fold, stages/tokenize.py _fold_digits) — fold first to compare
    import re

    want = [tk.process(re.sub(r"\d", "0", t)) if t else "" for t in texts]
    assert got == want


def test_ngram_jaccard_query_vs_duckdb(ray_session):
    """Exact shingle-Jaccard verify of LSH candidates hash-matches a full
    SQL recomputation (candidates AND per-pair jaccard_e6 values)."""
    import duckdb

    import __ray_entry__ as e

    out = e.queries()["ngram_jaccard_docs"]("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = con.execute(e.oracle_sql()["ngram_jaccard_docs"]).df()
    assert len(out) == len(want) and len(out) > 0
    cols = sorted(out.columns)
    assert cols == sorted(want.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert (a["doc_id"].to_numpy() == b["doc_id"].to_numpy()).all()
    assert (a["dup_of"].to_numpy() == b["dup_of"].to_numpy()).all()
    assert (a["jaccard_e6"].to_numpy() == b["jaccard_e6"].to_numpy()).all()


def test_knn_query_prep_avoids_wide_sort(ray_session):
    """_first_query_rows returns the same 3 query vectors the old
    full-row sort produced, without sorting the embedding column."""
    import ray.data as rd

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    emb = rd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    got = e._first_query_rows(emb, 3)
    want = emb.sort("vec_id").limit(3).to_pandas()
    assert list(got["vec_id"]) == list(want["vec_id"])
    for i in range(3):
        assert np.allclose(np.asarray(got["embedding"][i]), np.asarray(want["embedding"][i]))


def _docs_con(sf="/root/testdata/sf0.001"):
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "orders", "customer", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize(
    "name", ["vocab_topk_docs", "doc_quantiles", "sampled_docs", "customer_orders_join"]
)
def test_corpus_queries_vs_duckdb(ray_session, name):
    import __ray_entry__ as e

    out = e.queries()[name]("/root/testdata/sf0.001")
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    want = _docs_con().execute(e.oracle_sql()[name]).df()
    assert len(out) == len(want) and len(out) > 0
    cols = sorted(out.columns)
    assert cols == sorted(want.columns)
    a = out[cols].reset_index(drop=True)
    b = want[cols].reset_index(drop=True)
    a = a.astype({c: b[c].dtype for c in cols})
    assert a.equals(b)


def test_vocab_topk_partition_invariance(ray_session):
    """Same top-k under different block counts (combiner correctness)."""
    import ray.data as rd

    from logjuicer_ray.functions.corpus import vocab_topk

    path = "/root/testdata/sf0.001/documents.parquet"
    a = vocab_topk(rd.read_parquet(path, columns=["text"]), k=20).to_pandas()
    b = vocab_topk(
        rd.read_parquet(path, columns=["text"]).repartition(13), k=20
    ).to_pandas()
    assert a.equals(b)


def test_exact_quantiles_edge_cases(ray_session):
    """percentile_disc semantics on tiny inputs incl. q hitting exact
    cumulative boundaries."""
    import ray.data as rd

    from logjuicer_ray.functions.corpus import exact_quantiles

    ds = rd.from_items([{"x": v} for v in [1, 2, 3, 4]])
    t = exact_quantiles(ds, "x", [0.25, 0.5, 0.75, 0.9]).to_pylist()[0]
    # ceil(q*n)-th smallest: 0.25->1st=1, 0.5->2nd=2, 0.75->3rd=3, 0.9->4th=4
    assert (t["p25"], t["p50"], t["p75"], t["p90"]) == (1, 2, 3, 4)


def test_hash_sample_deterministic_and_stratified(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.corpus import hash_sample
    from logjuicer_ray.functions.hashing import md5_u64_str

    rows = [{"doc_id": i, "lang": "en" if i % 2 else "zh"} for i in range(200)]
    ds = rd.from_items(rows)
    out = hash_sample(
        ds, key_col="doc_id", strata_col="lang",
        strata_frac={"en": 0.3}, default_frac=0.6,
    ).to_pandas()
    thr = {"en": int(0.3 * 2**64), "zh": int(0.6 * 2**64)}
    want = sorted(
        r["doc_id"] for r in rows if md5_u64_str(str(r["doc_id"])) < thr[r["lang"]]
    )
    assert sorted(out["doc_id"]) == want
    # repartitioning must not change the sample
    out2 = hash_sample(
        ds.repartition(7), key_col="doc_id", strata_col="lang",
        strata_frac={"en": 0.3}, default_frac=0.6,
    ).to_pandas()
    assert sorted(out2["doc_id"]) == want


def test_pack_sequences_multi_rowgroup(ray_session, tmp_path):
    """Prefix-sum correctness across row-group units (the distributed
    path: one task per row group, offsets from the driver scan)."""
    import duckdb
    import pyarrow.parquet as pqt

    from logjuicer_ray.functions.corpus import pack_sequences

    rng = np.random.default_rng(11)
    n = 1000
    t = pa.table(
        {"doc_id": pa.array(range(n), pa.int64()),
         "n_chars": pa.array(rng.integers(1, 900, n), pa.int64())}
    )
    p = str(tmp_path / "docs.parquet")
    pqt.write_table(t, p, row_group_size=77)
    out = (
        pack_sequences(p, id_col="doc_id", size_col="n_chars", cap=2048)
        .sort("doc_id")
        .to_pandas()
    )
    want = duckdb.sql(
        "SELECT doc_id, CAST(FLOOR(COALESCE(SUM(n_chars) OVER (ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048.0) AS BIGINT) "
        f"AS bin FROM read_parquet('{p}') ORDER BY doc_id"
    ).df()
    assert (out["bin"].to_numpy() == want["bin"].to_numpy()).all()


def test_pack_sequences_rejects_unsorted(ray_session, tmp_path):
    import pyarrow.parquet as pqt

    from logjuicer_ray.functions.corpus import pack_sequences

    t = pa.table({"doc_id": pa.array([3, 1, 2], pa.int64()),
                  "n_chars": pa.array([10, 10, 10], pa.int64())})
    p = str(tmp_path / "bad.parquet")
    pqt.write_table(t, p, row_group_size=2)
    with pytest.raises(ValueError, match="sorted"):
        pack_sequences(p, id_col="doc_id", size_col="n_chars", cap=100)


def test_grouped_quantiles_random_vs_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from logjuicer_ray.functions.corpus import grouped_quantiles

    rng = np.random.default_rng(5)
    t = pa.table(
        {"g": pa.array(rng.choice(["a", "b", "c"], 5000)),
         "v": pa.array(rng.integers(0, 40, 5000), pa.int64())}
    )
    out = (
        grouped_quantiles(rd.from_arrow(t).repartition(9), group_cols=["g"],
                          col="v", qs=[0.25, 0.5, 0.99])
        .sort("g")
        .to_pandas()
    )
    duckdb.register("t", t.to_pandas())
    want = duckdb.sql(
        "SELECT g, quantile_disc(v, 0.25) AS p25, quantile_disc(v, 0.5) AS p50, "
        "quantile_disc(v, 0.99) AS p99 FROM t GROUP BY g ORDER BY g"
    ).df()
    cols = ["g", "p25", "p50", "p99"]
    assert out[cols].reset_index(drop=True).equals(want[cols].astype(out[cols].dtypes))


def test_tfidf_docs_query_vs_duckdb(ray_session):
    import __ray_entry__ as e

    out = e.queries()["tfidf_docs"]("/root/testdata/sf0.001").to_pandas()
    want = _docs_con().execute(e.oracle_sql()["tfidf_docs"]).df()
    assert len(out) == len(want) and len(out) > 0
    cols = sorted(out.columns)
    assert cols == sorted(want.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert a.astype({c: b[c].dtype for c in cols}).equals(b)


def test_unknown_routed_query_vs_duckdb(ray_session):
    """Unknown-files routing under a hard oracle: browser group withheld
    from training, per-(conv, group) counters recomputed in SQL."""
    import duckdb

    import __ray_entry__ as e

    out = e.queries()["report_unknown_routed"]("/root/testdata/sf0.001").to_pandas()
    sql = e.oracle_sql()["report_unknown_routed"].replace("sf0.01", "sf0.001")
    want = duckdb.sql(sql).df()
    assert len(out) == len(want) and len(out) > 0
    cols = sorted(out.columns)
    assert cols == sorted(want.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert a.astype({c: b[c].dtype for c in cols}).equals(b)


def test_events_hopping_query_vs_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    out = e.queries()["events_hopping"](sf).to_pandas()
    want = con.execute(e.oracle_sql()["events_hopping"]).df()
    assert len(out) == len(want) and len(out) > 0
    cols = sorted(out.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert a.astype({c: b[c].dtype for c in cols}).equals(b)


def test_hopping_window_semantics(ray_session):
    """Every event lands in exactly window/hop windows; boundary event at an
    exact hop-grid instant belongs to the window starting there."""
    import ray.data as rd

    from logjuicer_ray.functions.windows import hopping_window_agg

    m = 60 * 1_000_000
    t = pa.table({
        "ts": pa.array([0, 15 * m, 59 * m], pa.timestamp("us")),
        "g": pa.array(["a", "a", "a"]),
        "v": pa.array([1, 10, 100], pa.int64()),
    })
    out = (
        hopping_window_agg(rd.from_arrow(t), ts_col="ts", value_col="v",
                           window_minutes=60, hop_minutes=15, group_cols=["g"])
        .sort("window_start")
        .to_pandas()
    )
    # ts=0 -> windows {-45,-30,-15,0}; ts=15m -> {-30,...,15}; ts=59m -> {0,15,30,45}
    assert out["n_events"].sum() == 12
    w0 = out[out["window_start"] == pa.scalar(0, pa.timestamp("us")).as_py()]
    assert int(w0["sum_v"].iloc[0]) == 111  # all three events overlap window [0, 60m)


def test_errors_triggers_query_vs_duckdb(ray_session):
    """The errors classifier's standalone regex, RE2-recomputed in SQL."""
    import duckdb

    import __ray_entry__ as e

    out = e.queries()["errors_triggers"]("/root/testdata/sf0.001").to_pandas()
    sql = e.oracle_sql()["errors_triggers"].replace("sf0.01", "sf0.001")
    want = duckdb.sql(sql).df()
    assert len(out) == len(want) and out["n_triggers"].sum() > 0
    a = out.sort_values("conv_id").reset_index(drop=True)
    b = want.sort_values("conv_id").reset_index(drop=True)
    assert (a["n_triggers"].to_numpy() == b["n_triggers"].to_numpy()).all()


def test_hash_sample_fast_mode(ray_session):
    """SplitMix64 fast path: vectorized, deterministic, partition-invariant,
    and statistically close to the requested fraction."""
    import ray.data as rd

    from logjuicer_ray.functions.corpus import hash_sample

    rows = [{"doc_id": i} for i in range(20000)]
    a = hash_sample(rd.from_items(rows), key_col="doc_id", frac=0.3,
                    portable=False).to_pandas()
    b = hash_sample(rd.from_items(rows).repartition(11), key_col="doc_id",
                    frac=0.3, portable=False).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    assert abs(len(a) / 20000 - 0.3) < 0.02
    with pytest.raises(Exception, match="integer key"):
        import pyarrow as _pa
        import ray.data as _rd

        hash_sample(_rd.from_arrow(_pa.table({"k": ["x"]})), key_col="k",
                    frac=0.5, portable=False).take_all()


def test_bloom_prune_superset_and_pruning(ray_session):
    """Bloom pruning keeps every true key (exactness) and actually prunes
    non-member rows at realistic sizes."""
    import ray.data as rd

    from logjuicer_ray.functions.joins import bloom_prune, build_bloom

    keys = rd.from_items([{"k": i * 3} for i in range(2000)])  # multiples of 3
    bloom = build_bloom(keys, "k", n_bits=1 << 18)
    big = rd.from_items([{"k": i, "v": i} for i in range(12000)])
    kept = bloom_prune(big, "k", bloom).to_pandas()
    member = {i * 3 for i in range(2000)}
    kept_set = set(kept["k"])
    assert member <= kept_set  # no false negatives, ever
    # false-positive rate at these sizes is tiny; pruning must be substantial
    assert len(kept_set) < 12000 * 0.45


def test_lineitem_semijoin_query_vs_duckdb(ray_session):
    import __ray_entry__ as e

    out = e.queries()["lineitem_semijoin"]("/root/testdata/sf0.001").to_pandas()
    want = _docs_con().execute(e.oracle_sql()["lineitem_semijoin"]).df()
    cols = sorted(out.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert a.astype({c: b[c].dtype for c in cols}).equals(b)


def test_contaminated_docs_query_vs_duckdb(ray_session):
    import __ray_entry__ as e

    out = e.queries()["contaminated_docs"]("/root/testdata/sf0.001").to_pandas()
    want = _docs_con().execute(e.oracle_sql()["contaminated_docs"]).df()
    assert len(out) == len(want) and len(out) > 0
    cols = sorted(out.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert a.astype({c: b[c].dtype for c in cols}).equals(b)


def test_curated_docs_query_vs_duckdb(ray_session):
    """Composed curation chain (dedup → quality → lang filter) end-to-end
    vs SQL recomputation."""
    import __ray_entry__ as e

    out = e.queries()["curated_docs"]("/root/testdata/sf0.001").to_pandas()
    want = _docs_con().execute(e.oracle_sql()["curated_docs"]).df()
    assert len(out) == len(want) and len(out) > 0
    cols = sorted(out.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert a.astype({c: b[c].dtype for c in cols}).equals(b)


def test_heavy_hitters_query_vs_duckdb(ray_session):
    import __ray_entry__ as e

    out = e.queries()["heavy_tokens_docs"]("/root/testdata/sf0.001")
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    want = _docs_con().execute(e.oracle_sql()["heavy_tokens_docs"]).df()
    assert len(out) == len(want) and len(out) > 0
    assert list(out["token"]) == list(want["token"])
    assert (out["cnt"].to_numpy() == want["cnt"].to_numpy()).all()


def test_heavy_hitters_survives_eviction(ray_session):
    """Skewed stream forcing MG evictions across many small blocks: the
    heavy token must survive merge trims and the exact recount must match
    the true count."""
    import ray.data as rd

    from logjuicer_ray.functions.sketch import heavy_hitters

    rng = np.random.default_rng(3)
    rows = []
    for i in range(4000):
        toks = ["hot"] if i % 3 == 0 else []  # ~33% of docs contain 'hot'
        toks += [f"cold{rng.integers(0, 2000)}" for _ in range(3)]
        rows.append({"text": " ".join(toks)})
    out = heavy_hitters(rd.from_items(rows).repartition(23), k=16).to_pylist()
    toks = {r["token"]: r["cnt"] for r in out}
    true_hot = sum(1 for i in range(4000) if i % 3 == 0)
    assert toks.get("hot") == true_hot  # exact count after recount
    n = true_hot + 3 * 4000
    for t, c in toks.items():
        assert c * 16 > n  # every emitted token really exceeds n/k


def test_tokenize_unicode_whitespace_parity():
    """Every Python-\\s whitespace char (incl. \\x0b, \\x1c-\\x1f, \\x85,
    \\xa0, the Unicode space block — the chars RE2's ASCII \\s and
    utf8_trim_whitespace treat differently) must tokenize identically to the
    per-line Python path: such lines route through the exact path via the
    suspect-char mask."""
    import re

    import pyarrow as pa

    from logjuicer_ray.stages.tokenize import _tokenize_array
    from logjuicer_ray.tokenizer import process

    divergent = [c for c in (chr(x) for x in range(0x3100)) if re.search(r"\s", c)]
    lines = []
    for ws in divergent:
        lines += [f"foo{ws}bar", f"{ws}edge{ws}", f"one{ws}", f"{ws}x y{ws}z"]
    lines += ["", " ", "\x1c", "a\x0b", "plain words here"]
    toks, _ = _tokenize_array(pa.array(lines, pa.string()))
    got = toks.to_pylist()
    want = [process(l) if l else "" for l in lines]
    assert got == want


def test_distinct_and_antijoin_queries_vs_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in ("events", "customer", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    for name in ("distinct_users_exact", "customers_without_orders"):
        out = e.queries()[name](sf)
        out = out.to_pandas() if hasattr(out, "to_pandas") else out
        want = con.execute(e.oracle_sql()[name]).df()
        assert len(out) == len(want)
        cols = sorted(out.columns)
        assert cols == sorted(want.columns)
        a = out[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        assert a.astype({c: b[c].dtype for c in cols}).equals(b), name


def test_kmeans_distributed_quality_and_partition_invariance(ray_session):
    """Distributed Lloyd's: recovers planted clusters, inertia no worse than
    the sample-only init, and labels stable across block layouts."""
    import ray.data as rd

    from logjuicer_ray.functions.knn import kmeans_distributed

    rng = np.random.default_rng(9)
    centers = rng.normal(size=(4, 16)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    truth = []
    for i in range(2000):
        c = i % 4
        v = centers[c] + rng.normal(scale=0.05, size=16).astype(np.float32)
        rows.append({"vec_id": i, "embedding": v.tolist()})
        truth.append(c)
    ds = rd.from_items(rows)
    cents, assign_fn = kmeans_distributed(ds, n_clusters=4, iters=4)
    out = ds.map_batches(assign_fn, batch_format="pyarrow").to_pandas()
    lab = out.sort_values("vec_id")["cluster"].to_numpy()
    # each found cluster maps to exactly one planted cluster (purity ~1)
    import collections

    purity = 0
    for c in range(4):
        m = lab[np.asarray(truth) == c]
        purity += collections.Counter(m).most_common(1)[0][1]
    assert purity / len(lab) > 0.98
    # partition invariance of the assignment pass given fixed centroids
    out2 = ds.repartition(13).map_batches(assign_fn, batch_format="pyarrow").to_pandas()
    lab2 = out2.sort_values("vec_id")["cluster"].to_numpy()
    assert (lab == lab2).all()


def test_rolling_agg_matches_bruteforce_and_partitioning(ray_session):
    """rolling_agg == brute-force window frame on random input; identical
    output under a different block layout (the kernel sees whole groups)."""
    import ray.data as rd

    from logjuicer_ray.functions.windows import rolling_agg

    rng = np.random.default_rng(11)
    n = 800
    rows = [
        {
            "user_id": int(rng.integers(0, 12)),
            "event_id": i,
            "ts": int(rng.integers(0, 50)),  # heavy ts ties -> id tie-break
            "v": int(rng.integers(-1000, 1000)),
        }
        for i in range(n)
    ]
    ds = rd.from_items(rows)
    out = rolling_agg(ds, key="user_id", ts_col="ts", id_col="event_id",
                      val_col="v", window=4).to_pandas()
    out = out.sort_values(["user_id", "event_id"]).reset_index(drop=True)
    # brute force
    import pandas as pd

    df = pd.DataFrame(rows).sort_values(["user_id", "ts", "event_id"])
    want = []
    for uid, g in df.groupby("user_id"):
        vs = g["v"].to_numpy()
        for j in range(len(vs)):
            lo = max(0, j - 3)
            want.append({"user_id": uid, "event_id": int(g["event_id"].iloc[j]),
                         "roll_sum": int(vs[lo:j + 1].sum()), "roll_n": j - lo + 1})
    want = pd.DataFrame(want).sort_values(["user_id", "event_id"]).reset_index(drop=True)
    assert (out["roll_sum"].to_numpy() == want["roll_sum"].to_numpy()).all()
    assert (out["roll_n"].to_numpy() == want["roll_n"].to_numpy()).all()
    out2 = rolling_agg(ds.repartition(13), key="user_id", ts_col="ts",
                       id_col="event_id", val_col="v", window=4).to_pandas()
    out2 = out2.sort_values(["user_id", "event_id"]).reset_index(drop=True)
    assert out.equals(out2)


def test_redact_batch_sequencing_and_counts():
    """Later patterns run over earlier replacements (no re-matching inside
    placeholders); counts are per-pattern non-overlapping match counts."""
    from logjuicer_ray.functions.text import redact_batch

    t = pa.table({"doc_id": [0, 1, 2],
                  "text": ["mail a@b.co and c@d.io here", "ip 10.0.0.1 x", "none"]})
    out = redact_batch(t)  # DEFAULT_REDACTIONS: email, ipv4, phone
    got = out.to_pydict()
    assert got["n_email"] == [2, 0, 0]
    assert got["n_ipv4"] == [0, 1, 0]
    assert got["redacted"][0] == "mail <EMAIL> and <EMAIL> here"
    assert got["redacted"][1] == "ip <IP> x"
    assert got["redacted"][2] == "none"
    # sequencing: pattern 2 would match inside pattern 1's input but not
    # its replacement output
    t2 = pa.table({"text": ["aa bb aa"]})
    out2 = redact_batch(t2, patterns=[("a", "aa", "bb"), ("b", "bb", "cc")])
    d2 = out2.to_pydict()
    assert d2["n_a"] == [2]
    assert d2["n_b"] == [3]  # original bb + two replacements
    assert d2["redacted"] == ["cc cc cc"]


def test_extract_json_int_fast_and_fallback_paths():
    """The RE2 fast path and the row-targeted json.loads fallback agree;
    malformed/absent/non-int rows yield null."""
    from logjuicer_ray.functions.semistruct import extract_json_int_batch

    texts = [
        '{"k": 69}',                      # fast path
        '{"k":-3}',                       # fast path, negative
        '{"other": 1, "k": 7}',           # fast path (mid-object)
        '{"k": 1.5}',                     # float -> null
        '{"k": "9"}',                     # string -> null (typed extraction)
        '{"nested": {"k": 5}}',           # fallback -> absent at top level
        '{"k"  :  12  }',                 # whitespace -> fast or fallback, = 12
        "not json",                       # malformed -> null
        None,                             # null in -> null out
        '{"k": true}',                    # bool is not int -> null
    ]
    t = pa.table({"props": pa.array(texts, pa.string())})
    out = extract_json_int_batch(t, col="props", field="k", out_col="k")
    assert out.column("k").to_pylist() == [69, -3, 7, None, None, None, 12, None, None, None]


def test_round3b_queries_vs_duckdb(ray_session):
    """events_rolling / events_props / redacted_docs / lineitem_rollup
    hash-match their oracles at sf0.001."""
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("events", "documents", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    for name in ("events_rolling", "events_props", "redacted_docs", "lineitem_rollup"):
        out = e.queries()[name](sf)
        out = out.to_pandas() if hasattr(out, "to_pandas") else out
        want = con.execute(e.oracle_sql()[name]).df()
        assert len(out) == len(want), name
        cols = sorted(out.columns)
        assert cols == sorted(want.columns), name
        a = out[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        assert a.astype({c: b[c].dtype for c in cols}).equals(b), name


def test_window_funcs_matches_bruteforce_and_partitioning(ray_session):
    """window_funcs (rn / lag / running sum) == pandas brute force on
    random input with heavy order-key ties; identical under repartition."""
    import pandas as pd
    import ray.data as rd

    from logjuicer_ray.functions.windows import window_funcs

    rng = np.random.default_rng(7)
    rows = [
        {"k": int(rng.integers(0, 9)), "ts": int(rng.integers(0, 20)),
         "id": i, "v": int(rng.integers(-500, 500))}
        for i in range(600)
    ]
    ds = rd.from_items(rows)
    out = window_funcs(ds, key="k", order_cols=["ts", "id"], val_col="v",
                       lag_default=-1).to_pandas()
    out = out.sort_values(["k", "ts", "id"]).reset_index(drop=True)

    df = pd.DataFrame(rows).sort_values(["k", "ts", "id"])
    g = df.groupby("k")["v"]
    df["rn"] = g.cumcount() + 1
    df["lag_v"] = g.shift(1).fillna(-1).astype(int)
    df["run_v"] = g.cumsum()
    df = df.reset_index(drop=True)
    assert (out["rn"].to_numpy() == df["rn"].to_numpy()).all()
    assert (out["lag_v"].to_numpy() == df["lag_v"].to_numpy()).all()
    assert (out["run_v"].to_numpy() == df["run_v"].to_numpy()).all()

    out2 = window_funcs(ds.repartition(11), key="k", order_cols=["ts", "id"],
                        val_col="v", lag_default=-1).to_pandas()
    out2 = out2.sort_values(["k", "ts", "id"]).reset_index(drop=True)
    assert out.equals(out2)


def test_pivot_counts_and_melt_roundtrip(ray_session):
    """pivot_counts == per-category conditional counts; unlisted categories
    hit n_total only; melt explodes the wide table back to long rows."""
    import ray.data as rd

    from logjuicer_ray.functions.pivot import melt, pivot_counts

    rows = (
        [{"u": 1, "t": "a"}] * 3
        + [{"u": 1, "t": "b"}] * 2
        + [{"u": 2, "t": "b"}] * 5
        + [{"u": 2, "t": "zz"}]          # unlisted category
        + [{"u": 3, "t": None}]          # null category
    )
    ds = rd.from_items(rows)
    wide = pivot_counts(ds, key_col="u", pivot_col="t", categories=["a", "b"])
    got = {r["u"]: r for r in wide.take_all()}
    assert got[1] == {"u": 1, "n_a": 3, "n_b": 2, "n_total": 5}
    assert got[2] == {"u": 2, "n_a": 0, "n_b": 5, "n_total": 6}
    assert got[3] == {"u": 3, "n_a": 0, "n_b": 0, "n_total": 1}

    long = melt(wide, id_cols=["u"], value_cols=["n_a", "n_b"],
                var_name="cat", value_name="n").to_pandas()
    assert len(long) == 6
    assert int(long[(long["u"] == 2) & (long["cat"] == "n_b")]["n"].iloc[0]) == 5

    # partition invariance
    wide2 = pivot_counts(ds.repartition(7), key_col="u", pivot_col="t",
                         categories=["a", "b"])
    assert sorted(wide2.take_all(), key=lambda r: r["u"]) == sorted(
        wide.take_all(), key=lambda r: r["u"])


def test_grouped_distinct_exact(ray_session):
    """grouped_distinct == pandas nunique on random data; stable under
    repartitioning (the two-stage distinct is partition-agnostic)."""
    import pandas as pd
    import ray.data as rd

    from logjuicer_ray.functions.corpus import grouped_distinct

    rng = np.random.default_rng(3)
    rows = [{"g": str(rng.integers(0, 6)), "v": int(rng.integers(0, 40))}
            for _ in range(2000)]
    ds = rd.from_items(rows)
    out = {r["g"]: r["n_distinct"] for r in
           grouped_distinct(ds, group_col="g", value_col="v").take_all()}
    want = pd.DataFrame(rows).groupby("g")["v"].nunique().to_dict()
    assert out == want
    out2 = {r["g"]: r["n_distinct"] for r in
            grouped_distinct(ds.repartition(13), group_col="g",
                             value_col="v").take_all()}
    assert out2 == want


def test_repetition_batch_known_values():
    """Handcrafted docs with known word/bigram repetition counts; empty and
    multi-space docs behave."""
    from logjuicer_ray.functions.text import repetition_batch

    t = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "a b a b a",          # words: a×3 b×2; bigrams: ab,ba,ab,ba
            "x  x   x",           # runs of spaces, one distinct word
            "",                   # empty
            "one two three",      # all unique
        ],
    })
    out = repetition_batch(t).to_pydict()
    assert out["n_words"] == [5, 3, 0, 3]
    assert out["n_distinct_words"] == [2, 1, 0, 3]
    assert out["top_word_cnt"] == [3, 3, 0, 1]
    assert out["n_bigrams"] == [4, 2, 0, 2]
    assert out["n_distinct_bigrams"] == [2, 1, 0, 2]


def test_line_level_dedup_semantics(ray_session):
    """Multi-line turns: a line survives only at its lexicographically
    first (conv, turn, idx) location; fully-duplicated turns disappear;
    surviving lines rejoin in line order."""
    import ray.data as rd

    from logjuicer_ray.functions.dedup import line_level_dedup
    from logjuicer_ray.sources.transcripts import explode_lines

    turns = [
        {"conv_id": "c1", "turn_idx": 0, "text": "alpha\nbeta\ngamma"},
        {"conv_id": "c1", "turn_idx": 1, "text": "beta\ndelta"},     # beta dups
        {"conv_id": "c2", "turn_idx": 0, "text": "alpha\nbeta"},     # all dup
        {"conv_id": "c2", "turn_idx": 1, "text": "epsilon"},
    ]
    lines = explode_lines(rd.from_items(turns))
    out = {(r["conv_id"], r["turn_idx"]): r
           for r in line_level_dedup(lines).take_all()}
    assert out[("c1", 0)]["clean_text"] == "alpha\nbeta\ngamma"
    assert out[("c1", 0)]["n_kept"] == 3
    assert out[("c1", 1)]["clean_text"] == "delta"
    assert out[("c1", 1)]["n_kept"] == 1
    assert ("c2", 0) not in out          # every line lost
    assert out[("c2", 1)]["clean_text"] == "epsilon"
    assert len(out) == 3

    # partition invariance of the winner rule
    out2 = {(r["conv_id"], r["turn_idx"]): r
            for r in line_level_dedup(lines.repartition(5)).take_all()}
    assert out2.keys() == out.keys()
    assert all(out2[k]["clean_text"] == out[k]["clean_text"] for k in out)


def test_round3c_queries_vs_duckdb(ray_session):
    """orders_window / events_pivot / events_distinct_by_type /
    repetition_docs / turns_line_dedup hash-match their oracles at
    sf0.001."""
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("events", "documents", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    tp = e._turns_path(sf)
    for name in ("orders_window", "events_pivot", "events_distinct_by_type",
                 "repetition_docs", "turns_line_dedup"):
        out = e.queries()[name](sf)
        out = out.to_pandas() if hasattr(out, "to_pandas") else out
        sql = e.oracle_sql()[name].replace(
            "/tmp/logjuicer_synth/sf0.01/turns.parquet", tp)
        want = con.execute(sql).df()
        assert len(out) == len(want), name
        cols = sorted(out.columns)
        assert cols == sorted(want.columns), name
        a = out[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        assert a.astype({c: b[c].dtype for c in cols}).equals(b), name


def test_grouped_centroids_exact_and_partition_invariance(ray_session):
    """grouped_centroids == numpy brute force on random float32 vectors;
    identical integer sums at any partitioning (associative int math)."""
    import ray.data as rd

    from logjuicer_ray.functions.knn import grouped_centroids

    rng = np.random.default_rng(5)
    n, dim = 300, 8
    labels = rng.integers(0, 4, size=n)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    rows = [{"label": int(labels[i]), "embedding": vecs[i].tolist()}
            for i in range(n)]
    ds = rd.from_items(rows)
    out = grouped_centroids(ds, group_col="label").to_pandas()
    out = out.sort_values(["label", "dim"]).reset_index(drop=True)

    e6 = np.floor(vecs.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    for lab in range(4):
        m = labels == lab
        want = e6[m].sum(axis=0)
        got = out[out["label"] == lab].sort_values("dim")["sum_e6"].to_numpy()
        assert (got == want).all()
        assert (out[out["label"] == lab]["n_vecs"] == m.sum()).all()

    out2 = grouped_centroids(ds.repartition(9), group_col="label").to_pandas()
    out2 = out2.sort_values(["label", "dim"]).reset_index(drop=True)
    assert out.equals(out2)


def test_grouped_hll_error_bound_and_partition_invariance(ray_session):
    """Per-group HLL estimates land within 5% of exact distinct counts at
    p=12 (3 sigma ~ 4.9%) and the merged registers are partition-invariant
    (identical estimates under a different block layout)."""
    import ray.data as rd

    from logjuicer_ray.functions.sketch import grouped_hll_distinct

    rng = np.random.default_rng(17)
    rows = []
    true = {"a": 100, "b": 1500, "c": 4000}
    for g, n_distinct in true.items():
        vals = rng.choice(n_distinct * 10, size=n_distinct, replace=False)
        for v in vals:
            reps = int(rng.integers(1, 4))
            rows.extend({"g": g, "v": int(v)} for _ in range(reps))
    rng.shuffle(rows)
    ds = rd.from_items(rows)
    est = {r["g"]: r["approx_distinct"] for r in
           grouped_hll_distinct(ds, group_col="g", column="v", p=12).take_all()}
    for g, n in true.items():
        assert abs(est[g] - n) / n < 0.05, (g, est[g], n)
    est2 = {r["g"]: r["approx_distinct"] for r in
            grouped_hll_distinct(ds.repartition(11), group_col="g",
                                 column="v", p=12).take_all()}
    assert est == est2


def test_round3d_queries_vs_duckdb(ray_session):
    """events_heatmap / label_centroids / best_per_cluster_docs /
    source_quota_docs hash-match their oracles at sf0.001; the grouped-HLL
    twin tracks the exact per-group distinct within 5%."""
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    for name in ("events_heatmap", "label_centroids", "best_per_cluster_docs",
                 "source_quota_docs"):
        out = e.queries()[name](sf)
        out = out.to_pandas() if hasattr(out, "to_pandas") else out
        want = con.execute(e.oracle_sql()[name]).df()
        assert len(out) == len(want), name
        cols = sorted(out.columns)
        assert cols == sorted(want.columns), name
        a = out[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        assert a.astype({c: b[c].dtype for c in cols}).equals(b), name

    hll = {r["event_type"]: r["approx_distinct"]
           for r in e.queries()["distinct_by_type_hll"](sf).take_all()}
    exact = dict(con.execute(
        "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY 1"
    ).fetchall())
    for k, n in exact.items():
        assert abs(hll[k] - n) / max(n, 1) < 0.05, (k, hll[k], n)


def test_round3e_tpch_q3_and_multimodal(ray_session):
    """tpch_q3 hash-matches its three-table oracle at sf0.001; the
    multimodal actor-pool pipeline is deterministic run-to-run and covers
    both kinds."""
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    out = e.queries()["tpch_q3"](sf).to_pandas()
    want = con.execute(e.oracle_sql()["tpch_q3"]).df()
    assert len(out) == len(want) == 10
    cols = sorted(out.columns)
    assert cols == sorted(want.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert a.astype({c: b[c].dtype for c in cols}).equals(b)

    mm = e.queries()["multimodal_features"](sf).take_all()
    mm2 = e.queries()["multimodal_features"](sf).take_all()
    assert mm == mm2
    kinds = {r["kind"]: r for r in mm}
    assert set(kinds) == {"image", "audio"}
    assert kinds["image"]["n_items"] == 128 and kinds["audio"]["n_items"] == 128
    assert all(r["sum_bytes"] > 0 for r in mm)


def test_round3f_outer_and_semi_joins_vs_duckdb(ray_session):
    """users_orders_outer (native full_outer with key coalesce) and
    customers_with_events (native left_semi) hash-match their oracles at
    sf0.001 — including the empty-aggregate-block layouts that small
    scales produce."""
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("events", "orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    for name in ("users_orders_outer", "customers_with_events"):
        out = e.queries()[name](sf).to_pandas()
        want = con.execute(e.oracle_sql()[name]).df()
        assert len(out) == len(want), name
        cols = sorted(out.columns)
        assert cols == sorted(want.columns), name
        a = out[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        assert a.astype({c: b[c].dtype for c in cols}).equals(b), name


def test_histogram_quantiles_error_bound_and_merge(ray_session):
    """The mergeable histogram sketch lands within one bin width of exact
    percentile_disc on skewed data, is partition-invariant, and respects
    explicit bounds."""
    import ray.data as rd

    from logjuicer_ray.functions.sketch import histogram_quantiles

    rng = np.random.default_rng(23)
    vals = np.concatenate([
        rng.integers(0, 1000, 5000),          # bulk
        rng.integers(90_000, 100_000, 500),   # heavy tail
    ]).astype(np.int64)
    ds = rd.from_items([{"v": int(v)} for v in vals])
    qs = [0.5, 0.9, 0.99]
    out = histogram_quantiles(ds, "v", qs, bins=2048).to_pydict()
    lo, hi = int(vals.min()), int(vals.max())
    width = (hi - lo + 1) / 2048
    svals = np.sort(vals)
    for q in qs:
        exact = int(svals[max(0, int(np.ceil(q * len(svals))) - 1)])
        got = out[f"p{int(q * 100)}"][0]
        assert abs(got - exact) <= width + 1, (q, got, exact, width)
    out2 = histogram_quantiles(ds.repartition(13), "v", qs, bins=2048).to_pydict()
    assert out == out2
    out3 = histogram_quantiles(ds, "v", qs, bins=2048, lo=lo, hi=hi).to_pydict()
    assert out == out3


def test_lineitem_quantiles_hist_vs_exact(ray_session):
    """The histogram-sketch query tracks DuckDB's exact percentile_disc on
    price cents within one bin width at sf0.001."""
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    out = e.queries()["lineitem_quantiles_hist"](sf).to_pydict()
    con = duckdb.connect()
    exact = con.execute(
        "SELECT quantile_disc(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT), "
        "[0.5, 0.9, 0.99]) FROM "
        f"read_parquet('{sf}/lineitem.parquet')"
    ).fetchone()[0]
    lohi = con.execute(
        "SELECT MIN(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)), "
        "MAX(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)) FROM "
        f"read_parquet('{sf}/lineitem.parquet')"
    ).fetchone()
    width = (lohi[1] - lohi[0] + 1) / 4096
    for q, want in zip([50, 90, 99], exact):
        got = out[f"p{q}"][0]
        assert abs(got - want) <= width + 1, (q, got, want, width)


def test_chunk_documents_semantics(ray_session):
    """Chunk windows cover every character with the declared overlap; short
    and empty docs emit exactly one chunk; invalid strides reject."""
    import ray.data as rd

    from logjuicer_ray.functions.corpus import chunk_documents

    text = "".join(chr(ord("a") + i % 26) for i in range(250))
    ds = rd.from_items([
        {"doc_id": 0, "text": text},        # 250 chars -> chunks at 0/80/160
        {"doc_id": 1, "text": "short"},
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": "x" * 100},   # exactly one window
        {"doc_id": 4, "text": "y" * 101},   # one char over -> 2 chunks
    ])
    out = chunk_documents(ds, chunk_chars=100, stride=80).to_pandas()
    out = out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    g0 = out[out["doc_id"] == 0]["chunk"].tolist()
    assert g0 == [text[0:100], text[80:180], text[160:250]]
    assert out[out["doc_id"] == 1]["chunk"].tolist() == ["short"]
    assert out[out["doc_id"] == 2]["chunk"].tolist() == [""]
    assert out[out["doc_id"] == 3]["chunk"].tolist() == ["x" * 100]
    assert out[out["doc_id"] == 4]["chunk"].tolist() == ["y" * 100, "y" * 21]
    with pytest.raises(ValueError):
        chunk_documents(ds, chunk_chars=10, stride=20)


def test_split_assign_properties(ray_session):
    """Labels are deterministic, partition-invariant, cover every row, and
    land near the requested fractions; fracs must sum to 1."""
    import ray.data as rd

    from logjuicer_ray.functions.corpus import split_assign

    rows = [{"k": i} for i in range(5000)]
    ds = rd.from_items(rows)
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = split_assign(ds, key_col="k", fracs=fr).to_pandas()
    assert len(out) == 5000 and out["split"].notna().all()
    counts = out["split"].value_counts().to_dict()
    for label, f in fr.items():
        assert abs(counts.get(label, 0) / 5000 - f) < 0.03, (label, counts)
    out2 = split_assign(ds.repartition(13), key_col="k", fracs=fr).to_pandas()
    m = out.sort_values("k")["split"].to_numpy()
    m2 = out2.sort_values("k")["split"].to_numpy()
    assert (m == m2).all()
    with pytest.raises(ValueError):
        split_assign(ds, key_col="k", fracs={"a": 0.5, "b": 0.4})


def test_round3g_split_and_chunk_vs_duckdb(ray_session):
    """split_docs / chunked_docs hash-match their oracles at sf0.001."""
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
    for name in ("split_docs", "chunked_docs"):
        out = e.queries()[name](sf).to_pandas()
        want = con.execute(e.oracle_sql()[name]).df()
        assert len(out) == len(want), name
        cols = sorted(out.columns)
        assert cols == sorted(want.columns), name
        a = out[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        assert a.astype({c: b[c].dtype for c in cols}).equals(b), name
