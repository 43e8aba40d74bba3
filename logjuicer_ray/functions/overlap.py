"""Corpus-overlap audit: how much of corpus A is already in corpus B?

The question every training-data merge starts with (licensing review,
dataset-version drift, crawl-vs-crawl redundancy).  Two paths:

- ``corpus_overlap`` — EXACT distinct-key Jaccard / containment.  Each
  side reduces to per-batch DISTINCT md5-u64 key hashes with a side flag
  (the corpora's text never shuffles — only 16-byte hash rows move), one
  keyed groupby merges the flags, and a native sum produces the four
  counters.  Exact integer e6 ratios → bit-reproducible under any
  partitioning and SQL-mirrorable (md5 is recomputable in DuckDB, and the
  oracle can equivalently use DISTINCT text joins).
- ``kmv_sketch`` / ``kmv_overlap_estimate`` — the sketch path for 100-TB
  sides: a k-minimum-values bottom-k sketch per corpus (Bar-Yossef et al.
  2002; Beyer et al. 2007 unbiased estimator ``(k-1)·2^64/h_(k)``), built
  from per-batch bottom-k partials (mergeable monoid, no shuffle), with
  the Jaccard estimated from the k smallest of the UNION of the two
  sketches.  Driver state is O(k · blocks) candidate hashes — documented
  and bounded; the corpora themselves never leave their blocks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import TokenHasher, md5_u64_str, u64_to_i64

__all__ = ["corpus_overlap", "kmv_sketch", "kmv_overlap_estimate"]

E6 = 1_000_000


def _distinct_hash_batch(batch: pa.Table, key_col: str, in_a: int,
                         in_b: int) -> pa.Table:
    """Per-batch DISTINCT key → portable md5-u64 hash rows with side
    flags.  TokenHasher memoizes repeats across batches per worker."""
    import pyarrow.compute as pc

    hasher = _worker_hasher()
    keys = pc.unique(pc.fill_null(
        pc.cast(batch.column(key_col), pa.string()), ""))
    h = np.fromiter((u64_to_i64(hasher(k)) for k in keys.to_pylist()),
                    dtype=np.int64, count=len(keys))
    n = len(h)
    return pa.table({
        "h": pa.array(h, pa.int64()),
        "in_a": pa.array(np.full(n, in_a, np.int8)),
        "in_b": pa.array(np.full(n, in_b, np.int8)),
    })


_HASHER = None


def _worker_hasher() -> TokenHasher:
    global _HASHER
    if _HASHER is None:
        _HASHER = TokenHasher()
    return _HASHER


def corpus_overlap(ds_a, ds_b, *, key_col: str = "text") -> pa.Table:
    """Exact overlap counters between two corpora on ``key_col``:
    one row ``(n_a, n_b, n_common, n_union, jaccard_e6,
    containment_a_e6, containment_b_e6)`` — ratios as exact integer
    ``floor(x·10^6)``."""
    from ray.data.aggregate import Max

    a = ds_a.map_batches(
        lambda b: _distinct_hash_batch(b, key_col, 1, 0),
        batch_format="pyarrow")
    b = ds_b.map_batches(
        lambda b: _distinct_hash_batch(b, key_col, 0, 1),
        batch_format="pyarrow")
    merged = a.union(b).groupby("h").aggregate(Max("in_a"), Max("in_b"))

    def _partial(batch: pa.Table) -> pa.Table:
        ia = np.asarray(batch.column("max(in_a)"), dtype=np.int64)
        ib = np.asarray(batch.column("max(in_b)"), dtype=np.int64)
        return pa.table({
            "n_a": pa.array([int(ia.sum())], pa.int64()),
            "n_b": pa.array([int(ib.sum())], pa.int64()),
            "n_common": pa.array([int((ia & ib).sum())], pa.int64()),
            "n_union": pa.array([len(ia)], pa.int64()),
        })

    sums = merged.map_batches(_partial, batch_format="pyarrow").sum(
        ["n_a", "n_b", "n_common", "n_union"])
    n_a, n_b = int(sums["sum(n_a)"]), int(sums["sum(n_b)"])
    common, union = int(sums["sum(n_common)"]), int(sums["sum(n_union)"])
    return pa.table({
        "n_a": pa.array([n_a], pa.int64()),
        "n_b": pa.array([n_b], pa.int64()),
        "n_common": pa.array([common], pa.int64()),
        "n_union": pa.array([union], pa.int64()),
        "jaccard_e6": pa.array(
            [common * E6 // union if union else 0], pa.int64()),
        "containment_a_e6": pa.array(
            [common * E6 // n_a if n_a else 0], pa.int64()),
        "containment_b_e6": pa.array(
            [common * E6 // n_b if n_b else 0], pa.int64()),
    })


# ------------------------------------------------------------------- KMV

def kmv_sketch(ds, *, key_col: str = "text", k: int = 1024) -> np.ndarray:
    """Bottom-k distinct-value sketch of ``key_col``: the k smallest
    md5-u64 key hashes (uint64, sorted ascending; fewer if the corpus has
    < k distinct keys).  Built from per-batch bottom-k partials — each
    batch contributes ≤ k hash rows, so the driver merge sees
    O(k · blocks) rows while the corpus never shuffles."""
    def _bottom_k(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        hasher = _worker_hasher()
        keys = pc.unique(pc.fill_null(
            pc.cast(batch.column(key_col), pa.string()), ""))
        h = np.fromiter((hasher(s) for s in keys.to_pylist()),
                        dtype=np.uint64, count=len(keys))
        if len(h) > k:
            h = np.partition(h, k - 1)[:k]
        return pa.table({"h": pa.array(h.view(np.int64), pa.int64())})

    cand = ds.map_batches(_bottom_k, batch_format="pyarrow").take_all()
    merged = np.unique(np.array([r["h"] for r in cand],
                                dtype=np.int64).view(np.uint64))
    return np.sort(merged)[:k]


def _kmv_distinct(sketch: np.ndarray, k: int) -> int:
    """Beyer et al. 2007 unbiased distinct-count estimator."""
    if len(sketch) < k:
        return len(sketch)  # saw everything
    kth = float(sketch[k - 1]) + 1.0
    return int(round((k - 1) * (2.0 ** 64) / kth))


def kmv_overlap_estimate(ds_a, ds_b, *, key_col: str = "text",
                         k: int = 1024) -> pa.Table:
    """Approximate twin of ``corpus_overlap``: distinct counts and the
    Jaccard estimated from the two KMV sketches (relative error
    ~1/sqrt(k)).  Jaccard = |K(A∪B) ∩ A-sketch ∩ B-sketch| / |K(A∪B)|
    where K(A∪B) is the k smallest of the merged sketches — the standard
    KMV set-operation rule."""
    sa = kmv_sketch(ds_a, key_col=key_col, k=k)
    sb = kmv_sketch(ds_b, key_col=key_col, k=k)
    union_sketch = np.sort(np.union1d(sa, sb))[:k]
    both = np.intersect1d(np.intersect1d(union_sketch, sa), sb)
    j_hat = len(both) / len(union_sketch) if len(union_sketch) else 0.0
    n_a, n_b = _kmv_distinct(sa, k), _kmv_distinct(sb, k)
    n_union = _kmv_distinct(union_sketch, k)
    return pa.table({
        "n_a_est": pa.array([n_a], pa.int64()),
        "n_b_est": pa.array([n_b], pa.int64()),
        "n_union_est": pa.array([n_union], pa.int64()),
        "jaccard_est_e6": pa.array([int(j_hat * E6)], pa.int64()),
        "k": pa.array([int(k)], pa.int64()),
    })
