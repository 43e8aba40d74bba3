"""DSIR importance-weight tests (functions/selection.py).

The hard value oracle runs in the auto-discovered parity sweep
(test_oracle_order_parity.py picks up ``dsir_weights_docs``); here we test
the semantics, partition invariance, and the fast hash mode.
"""

import numpy as np
import pyarrow as pa
import pytest

from logjuicer_ray.functions.selection import dsir_logratio


def _docs_table():
    """Target docs ('en') share a distinctive vocabulary; raw docs don't."""
    rows = []
    for i in range(30):
        rows.append((i, "alpha beta gamma delta alpha beta", "en"))
    for i in range(30, 90):
        rows.append((i, "noise random filler junk words here", "de"))
    # a raw-domain doc that LOOKS like the target: should score high
    rows.append((90, "alpha beta gamma delta", "fr"))
    # an empty-text and a NULL-text doc: no output row
    rows.append((91, "", "en"))
    rows.append((92, None, "en"))
    ids, texts, langs = zip(*rows)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


@pytest.fixture(scope="module")
def weights(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_docs_table())
    return dsir_logratio(ds, num_buckets=512).to_pandas()


def test_dsir_target_lookalikes_score_high(weights):
    w = weights.set_index("doc_id")["log_weight"]
    # docs made of target-domain grams outrank raw-domain docs
    assert w.loc[0] > w.loc[40]
    assert w.loc[90] > w.loc[40]  # lookalike wins despite lang='fr'
    # target-vocab docs get positive weights, raw-only docs negative
    assert w.loc[0] > 0 > w.loc[40]


def test_dsir_no_row_for_empty_docs(weights):
    assert 91 not in set(weights["doc_id"])
    assert 92 not in set(weights["doc_id"])
    assert len(weights) == 91


def test_dsir_ngram_count(weights):
    # 6 tokens -> 6 unigrams + 5 bigrams
    row = weights[weights["doc_id"] == 0].iloc[0]
    assert row["n_grams"] == 11
    # 4 tokens -> 4 + 3
    assert weights[weights["doc_id"] == 90].iloc[0]["n_grams"] == 7


def test_dsir_partition_invariance(ray_session, weights):
    import ray.data as rd

    ds = rd.from_arrow(_docs_table()).repartition(7)
    again = dsir_logratio(ds, num_buckets=512).to_pandas()
    assert (again["doc_id"].values == weights["doc_id"].values).all()
    assert (again["n_grams"].values == weights["n_grams"].values).all()
    assert np.allclose(again["log_weight"], weights["log_weight"], atol=1e-9)


def test_dsir_fast_mode(ray_session, weights):
    import ray.data as rd

    ds = rd.from_arrow(_docs_table())
    fast = dsir_logratio(ds, num_buckets=512, mode="fast").to_pandas()
    # same docs and gram counts; weights use a different hash family but
    # must carry the same signal
    assert (fast["doc_id"].values == weights["doc_id"].values).all()
    assert (fast["n_grams"].values == weights["n_grams"].values).all()
    w = fast.set_index("doc_id")["log_weight"]
    assert w.loc[0] > 0 > w.loc[40]
    # deterministic across runs
    again = dsir_logratio(
        rd.from_arrow(_docs_table()), num_buckets=512, mode="fast"
    ).to_pandas()
    assert np.allclose(again["log_weight"], fast["log_weight"], atol=1e-12)


def test_dsir_bad_mode():
    with pytest.raises(ValueError):
        dsir_logratio(None, mode="nope")


# ---------------------------------------------------------------------------
# epoch_shuffle


def test_epoch_shuffle_is_permutation(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.selection import epoch_shuffle

    ids = pa.table({"doc_id": pa.array(range(200), pa.int64())})
    out = epoch_shuffle(rd.from_arrow(ids), seed=7).to_pandas()
    assert sorted(out["doc_id"]) == list(range(200))
    assert list(out["epoch_pos"]) == list(range(1, 201))
    # the order is actually shuffled, not identity
    assert list(out["doc_id"]) != list(range(200))
    # position follows the key order
    assert list(out["shuffle_key"]) == sorted(out["shuffle_key"])


def test_epoch_shuffle_partition_invariant_and_seeded(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.selection import epoch_shuffle

    ids = pa.table({"doc_id": pa.array(range(200), pa.int64())})
    a = epoch_shuffle(rd.from_arrow(ids), seed=7).to_pandas()
    b = epoch_shuffle(rd.from_arrow(ids).repartition(9), seed=7).to_pandas()
    assert list(a["doc_id"]) == list(b["doc_id"])
    c = epoch_shuffle(rd.from_arrow(ids), seed=8).to_pandas()
    assert list(a["doc_id"]) != list(c["doc_id"])


def test_epoch_shuffle_fast_mode(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.selection import epoch_shuffle

    ids = pa.table({"doc_id": pa.array(range(200), pa.int64())})
    f1 = epoch_shuffle(rd.from_arrow(ids), seed=7, mode="fast").to_pandas()
    f2 = epoch_shuffle(
        rd.from_arrow(ids).repartition(5), seed=7, mode="fast"
    ).to_pandas()
    assert list(f1["doc_id"]) == list(f2["doc_id"])
    assert sorted(f1["doc_id"]) == list(range(200))
    assert list(f1["epoch_pos"]) == list(range(1, 201))


# ---------------------------------------------------------------------------
# grouped_global_rank + mix_corpora


def test_grouped_global_rank_matches_pandas(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.rank import grouped_global_rank

    rng = np.random.default_rng(3)
    n = 500
    t = pa.table({
        "grp": pa.array([f"g{int(x)}" for x in rng.integers(0, 4, n)]),
        "id": pa.array(range(n), pa.int64()),
        "val": pa.array(rng.integers(0, 50, n), pa.int64()),
    })
    out = grouped_global_rank(
        rd.from_arrow(t).repartition(7), part_col="grp", value_col="val",
        tie_col="id", descending=True, rank_col="rnk",
    ).to_pandas().sort_values(["grp", "rnk"]).reset_index(drop=True)
    df = t.to_pandas()
    df["rnk"] = (
        df.sort_values(["val", "id"], ascending=[False, True])
        .groupby("grp").cumcount() + 1
    )
    want = df.sort_values(["grp", "rnk"]).reset_index(drop=True)
    assert (out["id"].values == want["id"].values).all()
    assert (out["rnk"].values == want["rnk"].values).all()


def _mix_table():
    rows = []
    for i in range(300):
        rows.append((i, f"src{i % 5}"))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "source": pa.array([r[1] for r in rows], pa.string()),
    })


def test_mix_corpora_proportions_and_determinism(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.selection import mix_corpora

    weights = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    out = mix_corpora(rd.from_arrow(_mix_table()), weights=weights,
                      seed=7).to_pandas()
    # recipe filter: src3/src4 dropped entirely
    assert set(out["source"]) == set(weights)
    assert len(out) == 180  # 60 docs per kept source
    assert list(out["mix_pos"]) == list(range(1, 181))
    # proportional round-robin: in any window ~10/0.5-wide, source shares
    # track the weights; check the first 60 slots: ~30/18/12
    head = out.head(60)["source"].value_counts()
    assert abs(head.get("src0", 0) - 30) <= 2
    assert abs(head.get("src1", 0) - 18) <= 2
    assert abs(head.get("src2", 0) - 12) <= 2
    # partition invariance
    again = mix_corpora(rd.from_arrow(_mix_table()).repartition(11),
                        weights=weights, seed=7).to_pandas()
    assert list(out["doc_id"]) == list(again["doc_id"])


def test_mix_corpora_fast_mode_and_validation(ray_session):
    import ray.data as rd

    from logjuicer_ray.functions.selection import mix_corpora

    weights = {"src0": 0.5, "src1": 0.5}
    f = mix_corpora(rd.from_arrow(_mix_table()), weights=weights, seed=7,
                    mode="fast").to_pandas()
    assert len(f) == 120
    # equal weights: strict alternation window property
    assert set(f.head(2)["source"]) == {"src0", "src1"}
    with pytest.raises(ValueError):
        mix_corpora(None, weights={})
    with pytest.raises(ValueError):
        mix_corpora(None, weights={"a": 1.0}, mode="nope")


# ---------------------------------------------------------------------------
# split_whitespace regression (alignment-dependent Arrow kernel fault)


def test_split_whitespace_edge_cases():
    from logjuicer_ray.functions.text import split_whitespace

    arr = pa.array(["a a a b", "a c", "   ", " x  y ", "", "a\tb\nc", None])
    got = split_whitespace(arr).to_pylist()
    assert got == [
        ["a", "a", "a", "b"], ["a", "c"], [""], ["x", "y"], [""],
        ["a", "b", "c"], None,
    ]
    # sliced/offset layouts give identical answers (the utf8 whitespace
    # kernel did not: '   ' -> ['', ' '] under some worker buffer layouts)
    s = arr.slice(2, 3)
    assert split_whitespace(s).to_pylist() == [[""], ["x", "y"], [""]]


def test_unigram_logprob_single_block_whitespace_doc(ray_session):
    """Regression: a whitespace-only doc in a merged single block used to
    nondeterministically leak a ' ' token into the vocabulary (total 7
    instead of 6), shifting every score."""
    import math

    import ray.data as rd

    from logjuicer_ray.functions.corpus import unigram_logprob

    items = [
        {"doc_id": 1, "text": "a a a b"},
        {"doc_id": 2, "text": "a c"},
        {"doc_id": 3, "text": "   "},
    ]
    for trial in range(5):
        out = unigram_logprob(
            rd.from_items(items).repartition(1), min_count=2
        ).to_pandas()
        assert list(out["doc_id"]) == [1, 2]
        want1 = round((3 * math.log(4 / 6) + math.log(1 / 6)) / 4, 4)
        assert abs(out["avg_logprob"][0] - want1) < 1e-9


def test_temperature_weights_smooths_small_domains(ray_session):
    import ray.data as rd
    import pyarrow as pa

    from logjuicer_ray.functions.selection import (
        mix_corpora,
        temperature_weights,
    )

    # 90 'big' docs vs 10 'small' docs
    t = pa.table({
        "doc_id": pa.array(range(100), pa.int64()),
        "source": pa.array(["big"] * 90 + ["small"] * 10, pa.string()),
    })
    ds = rd.from_arrow(t)
    w = temperature_weights(ds, tau=0.5)
    assert w == {"big": 90 ** 0.5, "small": 10 ** 0.5}
    # tau=1 reproduces proportional-to-size; tau=0 uniform
    assert temperature_weights(ds, tau=1.0) == {"big": 90.0, "small": 10.0}
    assert temperature_weights(ds, tau=0.0) == {"big": 1.0, "small": 1.0}
    # under tau=0.5 the small domain appears EARLIER/more densely in the
    # head of the mix than its raw 10% share: first 20 positions hold
    # >= 4 small docs (10/(sqrt(90)/sqrt(10)) ≈ 1:3 ratio, not 1:9)
    mixed = mix_corpora(ds, weights=w, seed=3).take(20)
    n_small = sum(1 for r in mixed if r["source"] == "small")
    assert n_small >= 4, n_small
