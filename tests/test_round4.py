"""Round-4 operators: blocked fuzzy matching (edit distance), duplicate
n-gram span detection (substring-dedup analog), and deterministic
weighted priority sampling — each checked against a DuckDB oracle and for
partition invariance (same answer at any block layout).
"""

import os

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    yield con
    con.close()


# ---------------------------------------------------------------- kernels


def _lev_ref(a: str, b: str) -> int:
    # classic scalar DP, the ground truth for the vectorized kernel
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_batch_matches_scalar_dp():
    from logjuicer_ray.functions.fuzzy import levenshtein_batch

    rng = np.random.RandomState(11)
    alphabet = list("abc 12")
    pairs = []
    for _ in range(300):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 24)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 24)))
        pairs.append((a, b))
    pairs += [("", ""), ("", "abc"), ("abc", ""), ("same", "same")]
    got = levenshtein_batch([p[0] for p in pairs], [p[1] for p in pairs])
    want = [_lev_ref(a, b) for a, b in pairs]
    assert list(got) == want


def test_levenshtein_batch_matches_duckdb(duck):
    from logjuicer_ray.functions.fuzzy import levenshtein_batch

    rng = np.random.RandomState(3)
    alphabet = list("xy z9")
    A = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 16)))
         for _ in range(100)]
    B = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 16)))
         for _ in range(100)]
    got = levenshtein_batch(A, B)
    for a, b, g in zip(A, B, got):
        w = duck.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert g == w, (a, b, g, w)


# --------------------------------------------------------------- operators


def _docs(columns):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet", columns=columns)


def test_blocked_fuzzy_pairs_oracle(ray_session, duck):
    from logjuicer_ray.functions.fuzzy import blocked_fuzzy_pairs

    out = blocked_fuzzy_pairs(_docs(["doc_id", "text"]), max_dist=6).to_pandas()
    want = duck.sql("""
        WITH k AS (SELECT doc_id, substr(trim(regexp_replace(lower(text),
                   '[^a-z0-9]+', ' ', 'g')), 1, 32) AS key FROM documents),
        b AS (SELECT doc_id, key, substr(key, 1, 2) || '|' ||
              CAST(length(key) // 8 AS VARCHAR) AS block FROM k)
        SELECT a.doc_id AS id_a, c.doc_id AS id_b,
               CAST(levenshtein(a.key, c.key) AS BIGINT) AS dist
        FROM b a JOIN b c ON a.block = c.block AND a.doc_id < c.doc_id
        WHERE levenshtein(a.key, c.key) <= 6 ORDER BY id_a, id_b
    """).df()
    assert len(out) == len(want) and len(out) > 0
    assert out.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_blocked_fuzzy_pairs_block_cap(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.fuzzy import blocked_fuzzy_pairs

    # 8 identical keys in one block with a cap of 4 must refuse loudly
    ds = rd.from_items(
        [{"doc_id": i, "text": "same normalized key"} for i in range(8)]
    )
    with pytest.raises(Exception):
        blocked_fuzzy_pairs(ds, max_block_rows=4).to_pandas()


def test_dup_ngram_spans_oracle_and_partition_invariance(ray_session, duck):
    import ray.data as rd

    from logjuicer_ray.functions.fuzzy import duplicate_ngram_spans

    want = duck.sql("""
        WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(
                   lower(text), '\\s+'), x -> x <> '') AS ws FROM documents),
        g AS (SELECT doc_id, array_to_string(ws[i:i+7], ' ') AS gram
              FROM w, LATERAL unnest(range(1, len(ws) - 6)) t(i)
              WHERE len(ws) >= 8),
        d AS (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY gram)
        SELECT g.doc_id, COUNT(*) AS total_grams,
               CAST(SUM(CASE WHEN d.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS dup_grams
        FROM g JOIN d USING (gram) GROUP BY g.doc_id ORDER BY g.doc_id
    """).df()
    assert (want["dup_grams"] > 0).any()  # the corpus must exercise dup spans
    for nblocks in (1, 7):
        docs = rd.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "text"],
            override_num_blocks=nblocks,
        )
        out = duplicate_ngram_spans(docs, n=8).to_pandas()
        assert out.reset_index(drop=True).astype("int64").equals(
            want.reset_index(drop=True).astype("int64")
        ), f"nblocks={nblocks}"


def test_dup_ngram_spans_short_docs_emit_no_row(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.fuzzy import duplicate_ngram_spans

    ds = rd.from_items(
        [
            {"doc_id": 1, "text": "one two three"},  # < 8 words: no grams
            {"doc_id": 2, "text": "a b c d e f g h i"},
            {"doc_id": 3, "text": "a b c d e f g h i"},  # full copy of 2
        ]
    )
    out = duplicate_ngram_spans(ds, n=8).to_pandas()
    assert list(out["doc_id"]) == [2, 3]
    assert list(out["total_grams"]) == [2, 2]
    assert list(out["dup_grams"]) == [2, 2]


def test_priority_sample_oracle(ray_session, duck):
    from logjuicer_ray.functions.fuzzy import priority_sample

    out = priority_sample(
        _docs(["doc_id", "n_chars"]), k=25, weight_col="n_chars"
    ).to_pandas()
    want = duck.sql("""
        WITH keyed AS (
          SELECT doc_id, CAST(n_chars AS DOUBLE) AS n_chars,
                 pow(((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
                 ::UBIGINT >> 11) + 0.5) / 9007199254740992.0,
                 1.0 / n_chars) AS k
          FROM documents WHERE n_chars > 0)
        SELECT doc_id, n_chars, round(k, 6) AS sample_key FROM keyed
        ORDER BY k DESC, doc_id LIMIT 25
    """).df()
    assert len(out) == 25
    assert list(out["doc_id"]) == list(want["doc_id"])
    assert np.allclose(out["sample_key"], want["sample_key"], atol=1e-9)


def test_priority_sample_weight_bias_and_fast_mode(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.fuzzy import priority_sample

    # weights 1000:1 — heavy rows must dominate the sample
    rows = [{"doc_id": i, "w": 1000.0 if i < 50 else 1.0} for i in range(500)]
    ds = rd.from_items(rows)
    for mode in ("portable", "fast"):
        out = priority_sample(ds, k=40, weight_col="w", mode=mode).to_pandas()
        assert len(out) == 40
        heavy = (out["doc_id"] < 50).sum()
        assert heavy >= 35, f"mode={mode}: only {heavy}/40 heavy rows sampled"
        # determinism: same call, same winners
        again = priority_sample(ds, k=40, weight_col="w", mode=mode).to_pandas()
        assert list(out["doc_id"]) == list(again["doc_id"])


def test_priority_sample_excludes_nonpositive_weights(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.fuzzy import priority_sample

    rows = [{"doc_id": 1, "w": 0.0}, {"doc_id": 2, "w": -3.0},
            {"doc_id": 3, "w": 2.0}, {"doc_id": 4, "w": float("nan")}]
    out = priority_sample(rd.from_items(rows), k=10, weight_col="w").to_pandas()
    assert list(out["doc_id"]) == [3]


def test_unigram_logprob_oracle_and_partition_invariance(ray_session, duck):
    import ray.data as rd

    from logjuicer_ray.functions.corpus import unigram_logprob

    want = duck.sql("""
        WITH toks AS (SELECT doc_id,
             unnest(regexp_split_to_array(text, '\\s+')) AS token
             FROM documents WHERE text IS NOT NULL),
        tok AS (SELECT doc_id, token FROM toks WHERE token <> ''),
        cnts AS (SELECT token, COUNT(*)::BIGINT AS cnt FROM tok GROUP BY token),
        tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM cnts),
        kept AS (SELECT token, cnt FROM cnts WHERE cnt >= 2)
        SELECT t.doc_id, COUNT(*) AS n_tokens,
               ROUND(AVG(ln(COALESCE(k.cnt, 1) / tot.total)), 4) AS avg_logprob
        FROM tok t LEFT JOIN kept k USING (token) CROSS JOIN tot
        GROUP BY t.doc_id ORDER BY t.doc_id
    """).df()
    for nblocks in (1, 5):
        docs = rd.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "text"],
            override_num_blocks=nblocks,
        )
        out = unigram_logprob(docs, min_count=2).to_pandas()
        assert len(out) == len(want)
        assert list(out["doc_id"]) == list(want["doc_id"])
        assert list(out["n_tokens"]) == list(want["n_tokens"])
        assert np.allclose(out["avg_logprob"], want["avg_logprob"], atol=2e-4)


def test_unigram_logprob_semantics(ray_session):
    import math

    import ray.data as rd

    from logjuicer_ray.functions.corpus import unigram_logprob

    # corpus: "a a a b" + "a c" + "" -> counts a=4, b=1, c=1, total=6;
    # kept (min_count=2) = {a: 4}; b and c smooth to 1/6
    ds = rd.from_items([
        {"doc_id": 1, "text": "a a a b"},
        {"doc_id": 2, "text": "a c"},
        {"doc_id": 3, "text": "   "},  # tokenless: no row
    ])
    out = unigram_logprob(ds, min_count=2).to_pandas()
    assert list(out["doc_id"]) == [1, 2]
    ln = math.log
    want1 = (3 * ln(4 / 6) + ln(1 / 6)) / 4
    want2 = (ln(4 / 6) + ln(1 / 6)) / 2
    assert abs(out["avg_logprob"][0] - round(want1, 4)) < 1e-9
    assert abs(out["avg_logprob"][1] - round(want2, 4)) < 1e-9
    assert list(out["n_tokens"]) == [4, 2]


# ---------------------------------------------------------- dedup_against


def _snapshot_ds(rows):
    import ray.data as rd

    return rd.from_items(rows)


def test_dedup_against_broadcast_and_join_paths_agree(ray_session):
    from logjuicer_ray.functions.dedup import dedup_against

    old = _snapshot_ds(
        [{"doc_id": i, "text": f"shared doc {i % 10}"} for i in range(30)]
    )
    new = _snapshot_ds(
        [{"doc_id": 100 + i, "text": f"shared doc {i}"} for i in range(25)]
    )
    # texts "shared doc 0".."shared doc 9" exist in old; 10..24 are fresh
    want_ids = [100 + i for i in range(10, 25)]
    bc = dedup_against(new, old).to_pandas()
    assert list(bc["doc_id"]) == want_ids
    jn = dedup_against(new, old, broadcast_keys=1).to_pandas()
    assert list(jn["doc_id"]) == want_ids
    assert list(bc.columns) == list(jn.columns)


def test_dedup_against_empty_old_keeps_everything(ray_session):
    from logjuicer_ray.functions.dedup import dedup_against

    old = _snapshot_ds([{"doc_id": 1, "text": "x"}]).filter(
        lambda r: False
    )
    new = _snapshot_ds([{"doc_id": i, "text": f"t{i}"} for i in range(5)])
    out = dedup_against(new, old).to_pandas()
    assert list(out["doc_id"]) == [0, 1, 2, 3, 4]


def test_dedup_against_keep_cols_and_null_text(ray_session):
    from logjuicer_ray.functions.dedup import dedup_against

    old = _snapshot_ds([{"doc_id": 1, "text": None, "src": "a"}])
    new = _snapshot_ds(
        [
            {"doc_id": 2, "text": None, "src": "b"},   # null == null ("")
            {"doc_id": 3, "text": "", "src": "b"},      # "" == null-as-""
            {"doc_id": 4, "text": "fresh", "src": "b"},
        ]
    )
    out = dedup_against(new, old, keep_cols=["doc_id", "src"]).to_pandas()
    assert list(out["doc_id"]) == [4]
    assert list(out.columns) == ["doc_id", "src"]


# --------------------------------------------------------------- semdedup


def test_semdedup_known_duplicate_groups(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.knn import semdedup

    rng = np.random.RandomState(5)
    # two well-separated base directions, 4 near-copies of each, plus
    # 12 far-apart singletons
    rows = []
    base_a = rng.randn(32); base_b = -base_a + rng.randn(32) * 3
    for i in range(4):
        rows.append({"vec_id": i, "embedding": (base_a + rng.randn(32) * 0.01).tolist()})
    for i in range(4, 8):
        rows.append({"vec_id": i, "embedding": (base_b + rng.randn(32) * 0.01).tolist()})
    for i in range(8, 20):
        rows.append({"vec_id": i, "embedding": rng.randn(32).tolist()})
    out = semdedup(rd.from_items(rows), n_clusters=4, tau=0.95).to_pandas()
    assert len(out) == 20
    g_a = out[out["vec_id"] < 4]
    g_b = out[(out["vec_id"] >= 4) & (out["vec_id"] < 8)]
    # each near-copy group keeps exactly its min id
    assert g_a["kept"].sum() == 1 and bool(out.loc[out["vec_id"] == 0, "kept"].iloc[0])
    assert (g_a["rep_id"] == 0).all()
    assert g_b["kept"].sum() == 1 and bool(out.loc[out["vec_id"] == 4, "kept"].iloc[0])
    assert (g_b["rep_id"] == 4).all()
    singles = out[out["vec_id"] >= 8]
    assert singles["kept"].all()
    assert (singles["rep_id"] == singles["vec_id"]).all()


def test_semdedup_partition_invariance(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.knn import semdedup

    base = None
    for par in (1, 6):
        ds = rd.read_parquet(
            "/root/testdata/sf0.001/embeddings.parquet",
            columns=["vec_id", "embedding"], override_num_blocks=par,
        )
        out = semdedup(ds, n_clusters=8, tau=0.9).to_pandas()
        key = list(zip(out["vec_id"], out["kept"], out["rep_id"]))
        if base is None:
            base = key
        else:
            assert key == base


def test_char_entropy_oracle_and_semantics(ray_session, duck):
    import math

    import ray.data as rd

    from logjuicer_ray.functions.text import add_char_entropy

    # hand-computed: "aab" -> p = (2/3, 1/3); empty/None -> no row
    ds = rd.from_items([
        {"doc_id": 1, "text": "aab"},
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": None},
        {"doc_id": 4, "text": "zzzz"},  # single symbol: entropy 0
    ])
    out = add_char_entropy(ds).sort("doc_id").to_pandas()
    assert list(out["doc_id"]) == [1, 4]
    want = -(2 / 3 * math.log(2 / 3) + 1 / 3 * math.log(1 / 3))
    assert abs(out["char_entropy"][0] - round(want, 4)) < 1e-9
    assert out["char_entropy"][1] == 0.0

    docs = _docs(["doc_id", "text"])
    got = add_char_entropy(docs).sort("doc_id").to_pandas()
    oracle = duck.sql("""
        WITH ch AS (SELECT doc_id, unnest(regexp_split_to_array(text, ''))
             AS c FROM documents WHERE text IS NOT NULL AND text <> ''),
        cnt AS (SELECT doc_id, c, COUNT(*)::DOUBLE AS n FROM ch
                GROUP BY doc_id, c),
        tot AS (SELECT doc_id, SUM(n) AS t FROM cnt GROUP BY doc_id)
        SELECT cnt.doc_id, ROUND(-SUM((n / t) * ln(n / t)), 4)
        AS char_entropy FROM cnt JOIN tot USING (doc_id)
        GROUP BY cnt.doc_id ORDER BY cnt.doc_id
    """).df()
    assert list(got["doc_id"]) == list(oracle["doc_id"])
    assert np.allclose(got["char_entropy"], oracle["char_entropy"], atol=2e-4)
