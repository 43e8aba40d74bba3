"""corpus_overlap / kmv_sketch / kmv_overlap_estimate (functions/overlap.py).

The exact path's sf-scale parity runs in the auto-discovered oracle sweep
(``corpus_overlap_docs``); here: hand-counted semantics, partition
invariance, and the KMV sketch's error bound against its exact twin.
"""

import numpy as np
import pyarrow as pa
import pytest

from logjuicer_ray.functions.overlap import (
    corpus_overlap,
    kmv_overlap_estimate,
    kmv_sketch,
)


def _ds(texts, parallelism=2):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "text": pa.array(texts, pa.string()),
    })).repartition(parallelism)


def test_exact_hand_counts(ray_session):
    # A = {x,y,z}, B = {y,z,w,v}; common = {y,z}; union = 5
    a = _ds(["x", "y", "z", "y", None])   # dup + null: null keys as ""
    b = _ds(["y", "z", "w", "v"])
    row = corpus_overlap(a, b).to_pydict()
    assert row["n_a"] == [4]      # x y z ""
    assert row["n_b"] == [4]
    assert row["n_common"] == [2]
    assert row["n_union"] == [6]
    assert row["jaccard_e6"] == [2 * 1_000_000 // 6]
    assert row["containment_a_e6"] == [500_000]
    assert row["containment_b_e6"] == [500_000]


def test_exact_disjoint_and_identical(ray_session):
    a = _ds(["p", "q"])
    assert corpus_overlap(a, _ds(["r", "s"])).to_pydict()["jaccard_e6"] == [0]
    full = corpus_overlap(a, _ds(["q", "p"])).to_pydict()
    assert full["jaccard_e6"] == [1_000_000]
    assert full["n_common"] == [2]


def test_exact_partition_invariance(ray_session):
    texts_a = [f"doc {i}" for i in range(200)]
    texts_b = [f"doc {i}" for i in range(100, 350)]
    r1 = corpus_overlap(_ds(texts_a, 1), _ds(texts_b, 7)).to_pydict()
    r2 = corpus_overlap(_ds(texts_a, 5), _ds(texts_b, 2)).to_pydict()
    assert r1 == r2
    assert r1["n_common"] == [100]
    assert r1["n_union"] == [350]


def test_kmv_exact_when_small(ray_session):
    # fewer distinct keys than k: the sketch IS the full set
    a = _ds([f"a{i}" for i in range(50)])
    b = _ds([f"a{i}" for i in range(25, 75)])
    row = kmv_overlap_estimate(a, b, k=1024).to_pydict()
    assert row["n_a_est"] == [50]
    assert row["n_b_est"] == [50]
    assert row["n_union_est"] == [75]
    assert row["jaccard_est_e6"] == [25 * 1_000_000 // 75]


def test_kmv_error_bound(ray_session):
    # 6000 vs 6000 distinct, 3000 common -> J = 1/3; k=512 gives
    # σ ≈ sqrt(J(1-J)/k) ≈ 0.021 — assert within 5σ plus count slack
    a = _ds([f"key-{i}" for i in range(6000)], 4)
    b = _ds([f"key-{i}" for i in range(3000, 9000)], 3)
    row = kmv_overlap_estimate(a, b, k=512).to_pydict()
    j = row["jaccard_est_e6"][0] / 1e6
    assert abs(j - 1 / 3) < 0.11
    for key, truth in (("n_a_est", 6000), ("n_b_est", 6000),
                       ("n_union_est", 9000)):
        assert abs(row[key][0] - truth) / truth < 0.25, (key, row[key])


def test_kmv_deterministic_and_partition_invariant(ray_session):
    texts = [f"t{i}" for i in range(3000)]
    s1 = kmv_sketch(_ds(texts, 2), k=256)
    s2 = kmv_sketch(_ds(texts, 9), k=256)
    assert np.array_equal(s1, s2)
    assert len(s1) == 256
    assert np.all(np.diff(s1.view(np.uint64)) > 0)  # sorted distinct
