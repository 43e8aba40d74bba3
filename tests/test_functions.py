"""Tests for the training-data operators (dedup / knn / text / multimodal)
against the driver-provided tables at sf0.001, verified with driver-side
numpy/pandas oracles."""

import numpy as np
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_table():
    return pq.read_table(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb_table():
    return pq.read_table(f"{SF_DIR}/embeddings.parquet")


def test_exact_dedup(ray_session, docs_table):
    import ray.data as rd

    from logjuicer_ray.functions.dedup import exact_dedup

    ds = rd.from_arrow(docs_table)
    out = exact_dedup(ds).to_pandas()
    # oracle: min doc_id per text
    df = docs_table.to_pandas()
    want = df.loc[df.groupby("text")["doc_id"].idxmin()]
    assert sorted(out["doc_id"]) == sorted(want["doc_id"])


def test_minhash_lsh_finds_planted_near_dups(ray_session, docs_table):
    import pyarrow as pa
    import ray.data as rd

    from logjuicer_ray.functions.dedup import minhash_lsh_dedup, ngram_jaccard

    df = docs_table.to_pandas().head(100).copy()
    # plant two near-duplicates of doc 0 (tiny edits)
    base = df.iloc[0]["text"]
    near1 = base.replace(base.split()[0], "THE", 1) if base else "x"
    ids = list(df["doc_id"]) + [100001, 100002]
    texts = list(df["text"]) + [base + " extra", near1]
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    pairs = minhash_lsh_dedup(ds).to_pandas()
    planted = pairs[pairs["doc_id"] == 100001]
    assert len(planted) == 1 and planted.iloc[0]["dup_of"] == df.iloc[0]["doc_id"]
    assert ngram_jaccard(base, base + " extra") > 0.8


def test_simhash_dedup_exact_copy(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from logjuicer_ray.functions.dedup import simhash_dedup

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "the quick brown fox jumps over the lazy dog",
                    "the quick brown fox jumps over the lazy dog",
                    "completely different content with other words entirely",
                ],
            }
        )
    )
    pairs = simhash_dedup(ds).to_pandas()
    assert (2, 1) in set(zip(pairs["doc_id"], pairs["dup_of"]))
    assert 3 not in set(pairs["doc_id"])


def test_knn_brute_force_matches_numpy(ray_session, emb_table):
    import ray.data as rd

    from logjuicer_ray.functions.knn import knn_brute_force

    vecs = np.asarray(emb_table.column("embedding").to_pylist(), dtype=np.float32)
    ids = np.asarray(emb_table.column("vec_id").to_pylist())
    queries = vecs[:3]
    out = knn_brute_force(rd.from_arrow(emb_table), queries, k=5).to_pandas()

    def norm(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1
        return m / n

    sims = norm(queries) @ norm(vecs).T
    for qi in range(3):
        got = out[out["query_id"] == qi]
        assert len(got) == 5
        want_order = np.lexsort((ids, -sims[qi]))[:5]
        # same similarity values (ties may reorder ids; compare scores)
        np.testing.assert_allclose(
            sorted(got["cosine"], reverse=True), sorted(sims[qi][want_order], reverse=True),
            rtol=1e-5,
        )
        # top-1 must match exactly
        assert got.iloc[0][ "vec_id"] == ids[want_order[0]]


def test_knn_ivf_recall(ray_session, emb_table):
    import ray.data as rd

    from logjuicer_ray.functions.knn import knn_brute_force, knn_ivf

    vecs = np.asarray(emb_table.column("embedding").to_pylist(), dtype=np.float32)
    queries = vecs[:3]
    exact = knn_brute_force(rd.from_arrow(emb_table), queries, k=10).to_pandas()
    approx = knn_ivf(
        rd.from_arrow(emb_table), queries, k=10, n_clusters=8, nprobe=4
    ).to_pandas()
    # decent recall on a tiny table
    for qi in range(3):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        assert len(e & a) / len(e) >= 0.5


def test_text_ops(ray_session, docs_table):
    import ray.data as rd

    from logjuicer_ray.functions.text import (
        add_fingerprints,
        add_lang_id,
        add_quality,
        add_token_counts,
    )

    ds = rd.from_arrow(docs_table)
    out = add_token_counts(ds).to_pandas()
    df = docs_table.to_pandas()
    want = df["text"].map(lambda t: len(t.split()) if t and t.strip() else 0)
    got = out.set_index("doc_id")["ws_tokens"]
    for doc_id, w in zip(df["doc_id"], want):
        assert got[doc_id] == w

    q = add_quality(ds).to_pandas()
    assert ((q["quality"] >= 0) & (q["quality"] <= 1)).all()
    lang = add_lang_id(ds).to_pandas()
    assert set(lang["lang_id"]) <= {"en", "fr", "de", "es", "und"}
    fp = add_fingerprints(ds).to_pandas()
    # determinism + equality for identical texts
    m = dict(zip(df["text"], fp.set_index("doc_id").loc[df["doc_id"], "fingerprint"]))
    for t, v in zip(df["text"], fp.set_index("doc_id").loc[df["doc_id"], "fingerprint"]):
        assert m[t] == v


def test_multimodal_plumbing(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.multimodal import (
        AudioFeatureStage,
        ImageDecodeStage,
        decode_images,
        synth_media_batch,
    )

    table = synth_media_batch(list(range(32)))
    imgs = table.filter(
        __import__("pyarrow").compute.equal(table.column("kind"), "image")
    )
    out = decode_images(rd.from_arrow(imgs), concurrency=2, batch_size=8).to_pandas()
    assert len(out) == imgs.num_rows
    assert all(len(v) == 64 for v in out["image_embedding"])
    # determinism of the stubbed decode
    stage = ImageDecodeStage()
    again = stage(imgs).to_pydict()["image_embedding"]
    m = dict(zip(out["media_id"], out["image_embedding"]))
    for mid, v in zip(imgs.column("media_id").to_pylist(), again):
        assert np.allclose(m[mid], v)
    # strict mode is honest about the missing decoder
    with pytest.raises(NotImplementedError):
        ImageDecodeStage(strict=True)(imgs)
    with pytest.raises(NotImplementedError):
        AudioFeatureStage(strict=True)(table)


def test_ngram_jaccard_pairs_distributed_hot_bucket(ray_session):
    """10k docs with a 100-doc hot bucket of identical text: the verify
    stage must stay distributed (no driver materialization) and keep only
    the truly similar pairs."""
    import pyarrow as pa
    import ray.data as rd

    from logjuicer_ray.functions.dedup import ngram_jaccard, ngram_jaccard_pairs

    n = 10_000
    hot = "the same hot duplicated document body repeated verbatim everywhere"
    texts = [
        hot if i % 100 == 0 else f"unique document number {i} with its own distinct words {i * 7}"
        for i in range(n)
    ]
    docs = rd.from_arrow(pa.table({"doc_id": list(range(n)), "text": texts}))
    hot_ids = [i for i in range(n) if i % 100 == 0]
    # candidate pairs: every hot doc against the root (true dups), plus some
    # false candidates that must be rejected by the exact Jaccard check
    cand_ids = hot_ids[1:] + [7, 13]
    cand_dup = [hot_ids[0]] * (len(hot_ids) - 1) + [1, 2]
    pairs = rd.from_arrow(pa.table({"doc_id": cand_ids, "dup_of": cand_dup}))
    out = ngram_jaccard_pairs(docs, pairs, threshold=0.8).to_pandas()
    got = set(zip(out["doc_id"], out["dup_of"]))
    assert got == set(zip(hot_ids[1:], [hot_ids[0]] * (len(hot_ids) - 1)))
    assert (out["jaccard"] == 1.0).all()
    # the rejected pairs really are below threshold
    assert ngram_jaccard(texts[7], texts[1]) < 0.8


def test_embedding_cosine_dedup_exact(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from logjuicer_ray.functions.dedup import embedding_cosine_dedup

    rng = np.random.default_rng(7)
    base = rng.standard_normal((50, 16)).astype(np.float32)
    # plant: 60 = copy of 3, 61 = near-copy of 10, 62 = copy of 3 again
    vecs = np.vstack([base, base[3], base[10] + 0.01 * rng.standard_normal(16), base[3]])
    ids = list(range(50)) + [60, 61, 62]
    ds = rd.from_arrow(
        pa.table({"vec_id": ids, "embedding": [v.tolist() for v in vecs]})
    )
    out = embedding_cosine_dedup(ds, threshold=0.95, mode="exact").to_pandas()
    got = dict(zip(out["vec_id"], out["dup_of"]))
    assert got[60] == 3
    assert got[61] == 10
    assert got[62] == 3
    # numpy oracle: full pairwise check
    nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = nv @ nv.T
    ids_a = np.array(ids)
    order = np.argsort(ids_a)
    want = {}
    for r in range(len(ids)):
        lower = [j for j in range(len(ids)) if ids[j] < ids[r] and sims[r, j] >= 0.95]
        if lower:
            want[ids[r]] = min(ids[j] for j in lower)
    assert got == want


def test_embedding_cosine_dedup_lsh_finds_copies(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from logjuicer_ray.functions.dedup import embedding_cosine_dedup

    rng = np.random.default_rng(11)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    vecs = np.vstack([base, base[5], base[17]])
    ids = list(range(40)) + [90, 91]
    ds = rd.from_arrow(
        pa.table({"vec_id": ids, "embedding": [v.tolist() for v in vecs]})
    )
    out = embedding_cosine_dedup(ds, threshold=0.99, mode="lsh").to_pandas()
    got = dict(zip(out["vec_id"], out["dup_of"]))
    # exact copies share every LSH band (identical sign pattern) — must be found
    assert got.get(90) == 5
    assert got.get(91) == 17


def test_minhash_signatures_vectorized_matches_scalar():
    from logjuicer_ray.functions.dedup import MinHasher

    mh = MinHasher(num_perm=16, shingle_k=5)
    texts = ["hello world document one", "another body of text", "x", ""]
    batch = mh.signatures(texts)
    for i, t in enumerate(texts):
        np.testing.assert_array_equal(batch[i], mh.signature(t))


def test_md5_hash_helpers():
    import hashlib

    from logjuicer_ray.functions.hashing import md5_u64_str, u64_to_i64

    v = md5_u64_str("abc")
    assert v == int(hashlib.md5(b"abc").hexdigest()[:16], 16)
    assert u64_to_i64(2**63) == -(2**63)
    assert u64_to_i64(5) == 5


def test_simhash_batch_matches_scalar():
    from logjuicer_ray.functions.dedup import simhash64, simhash64_batch

    texts = [
        "the quick brown fox",
        "",
        "one",
        "a b c d e f g",
        "  spaced   out   tokens  ",
        "repeated repeated repeated zebra",
    ]
    batch = simhash64_batch(texts)
    for i, t in enumerate(texts):
        assert int(batch[i]) == simhash64(t)


def test_connected_components_chain(ray_session):
    """A chain 1-2, 2-3, 3-4, 4-5 plus a separate pair 10-11: min-label
    propagation must converge to the full components (one-round min-label
    would mislabel the chain tail) — verified against union-find."""
    import pyarrow as pa
    import ray.data as rd

    from logjuicer_ray.functions.dedup import connected_components

    pairs = rd.from_arrow(
        pa.table(
            {
                "doc_id": [2, 3, 4, 5, 11],
                "dup_of": [1, 2, 3, 4, 10],
            }
        )
    )
    out = connected_components(pairs).to_pandas()
    got = dict(zip(out["doc_id"], out["component"]))
    assert got == {2: 1, 3: 1, 4: 1, 5: 1, 11: 10}


def test_connected_components_star_and_cycle(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from logjuicer_ray.functions.dedup import connected_components

    # star around 7 + a cycle 20-21-22-20
    pairs = rd.from_arrow(
        pa.table(
            {
                "doc_id": [8, 9, 10, 21, 22, 20],
                "dup_of": [7, 7, 7, 20, 21, 22],
            }
        )
    )
    out = connected_components(pairs).to_pandas()
    got = dict(zip(out["doc_id"], out["component"]))
    assert got == {8: 7, 9: 7, 10: 7, 21: 20, 22: 20}
