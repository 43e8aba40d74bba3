"""strip_duplicate_spans tests (functions/fuzzy.py).

The hard value oracle runs in the auto-discovered parity sweep
(``strip_dup_spans_docs``); here we test the removal semantics directly:
coverage dilation, within-doc repeats, boundary windows, zero-token docs,
partition invariance, and the driver bound.
"""

import pyarrow as pa
import pytest

from logjuicer_ray.functions.fuzzy import strip_duplicate_spans


def _run(texts, **kw):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    out = strip_duplicate_spans(ds, **kw).to_pandas()
    return {r.doc_id: (r.clean_text, r.n_removed) for r in out.itertuples()}


def test_cross_doc_duplicate_removed(ray_session):
    # the shared 5-gram 'a b c d e' is removed from BOTH docs; unique
    # tails survive
    got = _run(["a b c d e unique one", "prefix a b c d e other"], n=5)
    assert got[0] == ("unique one", 5)
    assert got[1] == ("prefix other", 5)


def test_within_doc_repeat_counts_as_duplicate(ray_session):
    # 'x1 x2 x3 x4 x5' occurs twice INSIDE one doc -> both occurrences
    # (and the overlap-free positions) are removed
    got = _run(["x1 x2 x3 x4 x5 gap x1 x2 x3 x4 x5"], n=5)
    assert got[0] == ("gap", 10)


def test_overlapping_coverage_dilation(ray_session):
    # two duplicated grams overlap: covered positions form one span,
    # counted once per position (not per gram)
    a = "t1 t2 t3 t4 t5 t6 rest here now"
    b = "t1 t2 t3 t4 t5 t6 different tail words"
    got = _run([a, b], n=5)
    # grams (t1..t5) and (t2..t6) are both duplicated -> positions 0..5
    assert got[0] == ("rest here now", 6)
    assert got[1] == ("different tail words", 6)


def test_short_and_empty_docs(ray_session):
    got = _run(["only four words here", "", "   ", "a b c d e",
                "a b c d e"], n=5)
    assert got[0] == ("only four words here", 0)  # < n tokens: no grams
    assert 1 not in got and 2 not in got          # zero tokens: no row
    assert got[3] == ("", 5)                      # fully duplicated doc
    assert got[4] == ("", 5)


def test_min_count_three(ray_session):
    texts = ["p q r s t end1", "p q r s t end2"]
    got = _run(texts, n=5, min_count=3)
    assert got[0] == ("p q r s t end1", 0)  # only 2 occurrences: kept
    got2 = _run(texts + ["p q r s t end3"], n=5, min_count=3)
    assert got2[0] == ("end1", 5)


def test_partition_invariance(ray_session):
    import ray.data as rd

    texts = [f"c{i % 7} shared run of words plus tail {i}" for i in range(60)]
    t = pa.table({
        "doc_id": pa.array(range(60), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    a = strip_duplicate_spans(rd.from_arrow(t), n=5).to_pandas()
    b = strip_duplicate_spans(rd.from_arrow(t).repartition(11),
                              n=5).to_pandas()
    assert a.equals(b)


def test_driver_bound_raises(ray_session):
    with pytest.raises(ValueError, match="driver_dup_rows"):
        _run(["w1 w2 w3 w4 w5", "w1 w2 w3 w4 w5"], n=5, driver_dup_rows=0)
