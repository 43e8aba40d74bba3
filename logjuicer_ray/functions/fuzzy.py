"""Fuzzy matching and substring-level duplication for training corpora.

Three operators a 100-TB curation pipeline needs beyond whole-document
dedup (functions/dedup.py):

- :func:`blocked_fuzzy_pairs`: near-match pairs under a character edit
  distance (Levenshtein) bound, found inside deterministic blocking
  buckets.  All-pairs edit distance is O(n²) and never runs at corpus
  scale; blocking (normalized-prefix + length band — the classic record-
  linkage shape) bounds candidate pairs to O(Σ block²) with block sizes
  capped, and the DP itself is vectorized across the pair batch.
- :func:`duplicate_ngram_spans`: per-document counts of word n-gram
  positions whose n-gram also occurs in ANOTHER document — the scalable
  n-gram-granular analog of suffix-array substring dedup ("Deduplicating
  Training Data Makes Language Models Better", Lee et al. 2022): the
  suffix array needs global order over all text, the hashed n-gram
  inventory needs one keyed shuffle of (gram-hash, doc) rows.
- :func:`priority_sample`: deterministic weighted sampling without
  replacement (Efraimidis–Spirakis A-Res keys, u^(1/w) with a content-
  derived uniform) — reproducible corpus downsampling where every worker
  can verify membership independently; distributed as per-block top-k
  partials merged once (no shuffle of the corpus).

All three are md5-portable: an external SQL engine recomputes every hash,
key and distance, so their oracles are hard value checks.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import md5_u64_str

__all__ = [
    "blocked_fuzzy_pairs",
    "duplicate_ngram_spans",
    "strip_duplicate_spans",
    "priority_sample",
    "levenshtein_batch",
]

_NORM_RE = re.compile(r"[^a-z0-9]+")


def _normalize_keys(texts: pa.Array, key_len: int) -> pa.Array:
    """lower → collapse non-[a-z0-9] runs to one space → trim → first
    ``key_len`` chars.  SQL mirror:
    ``substr(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), 1, key_len)``.
    """
    lowered = pc.utf8_lower(texts)
    collapsed = pc.replace_substring_regex(lowered, r"[^a-z0-9]+", " ")
    trimmed = pc.utf8_trim_whitespace(collapsed)
    return pc.utf8_slice_codeunits(trimmed, 0, key_len)


def levenshtein_batch(a: list[str], b: list[str]) -> np.ndarray:
    """Levenshtein distance for P string pairs at once.

    Vectorized across the PAIR axis: the DP iterates over character
    positions of ``a`` (≤ max_len python iterations) while each iteration
    is a (P, max_len_b) numpy op — no per-pair python loop.  Matches
    DuckDB's ``levenshtein()`` (unit-cost insert/delete/substitute) on
    ASCII keys (the callers normalize to [a-z0-9 ] first).
    """
    P = len(a)
    if P == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.array([len(s) for s in a], dtype=np.int64)
    lb = np.array([len(s) for s in b], dtype=np.int64)
    La, Lb = int(la.max(initial=0)), int(lb.max(initial=0))
    if La == 0 or Lb == 0:
        return np.where(la == 0, lb, la)
    # pad into (P, L) uint32 codepoint matrices; 0 never occurs in text
    A = np.zeros((P, La), dtype=np.uint32)
    B = np.zeros((P, Lb), dtype=np.uint32)
    for i, s in enumerate(a):
        if s:
            A[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    for i, s in enumerate(b):
        if s:
            B[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    prev = np.broadcast_to(np.arange(Lb + 1, dtype=np.int64), (P, Lb + 1)).copy()
    out = np.where(la == 0, lb, 0).astype(np.int64)
    cur = np.empty_like(prev)
    for i in range(1, La + 1):
        cur[:, 0] = i
        sub = prev[:, :-1] + (A[:, i - 1 : i] != B)
        dele = prev[:, 1:] + 1
        np.minimum(sub, dele, out=cur[:, 1:])
        # insertion has a left-to-right dependency; resolve with a prefix
        # scan: cur[j] = min(cur[j], min_{m<j}(cur[m] + (j - m)))
        shifted = np.minimum.accumulate(cur[:, :-1] - np.arange(Lb), axis=1)
        np.minimum(cur[:, 1:], shifted + np.arange(1, Lb + 1), out=cur[:, 1:])
        done = la == i
        if done.any():
            out[done] = cur[done, lb[done]]
        prev, cur = cur, prev
    return out


def blocked_fuzzy_pairs(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dist: int = 4,
    key_len: int = 32,
    prefix_len: int = 2,
    len_band: int = 8,
    max_block_rows: int = 10_000,
):
    """Pairs of rows whose normalized ``key_len``-char keys are within
    ``max_dist`` edits, searched INSIDE blocking buckets
    ``(key[:prefix_len], len(key) // len_band)``.

    Scale shape: one keyed shuffle of (block, id, key) rows — the full
    text never moves — then per-block vectorized pair DP.  Recall is
    bounded by the blocking function (pairs straddling a prefix or length
    band are not compared), the standard record-linkage tradeoff; the
    block definition is deterministic so the oracle applies the SAME
    blocking.  Blocks above ``max_block_rows`` would go quadratic; they
    are truncated to the first ``max_block_rows`` rows by id (log + a
    ``truncated`` flag would be the production move; here the cap is an
    assert so tests catch skew silently changing semantics).

    Returns (id_a, id_b, dist) with id_a < id_b, sorted.
    """

    def keyed(batch: pa.Table) -> pa.Table:
        keys = _normalize_keys(batch.column(text_col), key_len)
        pref = pc.utf8_slice_codeunits(keys, 0, prefix_len)
        lens = pc.utf8_length(keys)
        band = pc.divide(lens, len_band)
        block = pc.binary_join_element_wise(
            pref, pc.cast(band, pa.string()), "|"
        )
        return pa.table(
            {
                "block": block,
                id_col: batch.column(id_col),
                "key": keys,
            }
        )

    _EMPTY = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "dist": pa.array([], pa.int64()),
        }
    )

    def _pairs_block(sub: pa.Table, offsets) -> pa.Table:
        # sorted grouped-apply exchange (functions/segments.py): rows
        # arrive (block, id)-sorted, one complete blocking bucket per
        # segment — the quadratic DP runs per segment with no Ray exchange
        # per bucket
        nrows = sub.num_rows
        if nrows == 0:
            return _EMPTY
        offsets = np.asarray(offsets, dtype=np.int64)
        ids_all = sub.column(id_col).to_numpy(zero_copy_only=False)
        keys_all = sub.column("key").to_pylist()
        parts = [_EMPTY]
        for s, e in zip(offsets, np.append(offsets[1:], nrows)):
            m = int(e - s)
            assert m <= max_block_rows, (
                f"fuzzy block of {m} rows exceeds max_block_rows="
                f"{max_block_rows}; coarsen the blocking or raise the cap"
            )
            if m < 2:
                continue
            ids = ids_all[s:e]
            keys = keys_all[s:e]
            iu, ju = np.triu_indices(m, k=1)
            d = levenshtein_batch([keys[i] for i in iu], [keys[j] for j in ju])
            keep = d <= max_dist
            parts.append(pa.table(
                {
                    "id_a": pa.array(ids[iu[keep]], pa.int64()),
                    "id_b": pa.array(ids[ju[keep]], pa.int64()),
                    "dist": pa.array(d[keep], pa.int64()),
                }
            ))
        return pa.concat_tables(parts)

    from .segments import sorted_group_apply

    out = sorted_group_apply(
        ds.map_batches(keyed, batch_format="pyarrow"),
        key_cols=["block"],
        order_cols=[id_col],
        apply_block=_pairs_block,
    )
    return out.sort(["id_a", "id_b"])


def strip_duplicate_spans(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_count: int = 2,
    driver_dup_rows: int = 5_000_000,
):
    """Remove duplicated text spans from every document: any word
    ``n``-gram occurring at least ``min_count`` times corpus-wide (across
    documents AND repeats within one document) is duplicated, and every
    token position covered by a duplicated gram occurrence is dropped —
    the n-gram-granular removal analog of suffix-array substring dedup
    (Lee et al. 2022, arXiv:2107.06499; detection counterpart:
    :func:`duplicate_ngram_spans`).

    Distributed shape:

    1. **Count pass**: grams pre-reduced per batch to ``(gram, cnt)``
       partials, one gram-keyed groupby sum, filter ``cnt >= min_count``.
       The duplicated-gram list is collected (bounded by
       ``driver_dup_rows`` — raises beyond it; the 100-TB path swaps the
       exact broadcast set for the repo's bloom semi-join,
       functions/joins.py) and broadcast ONCE via ``ray.put``.
    2. **Strip pass**: per batch the doc's grams are rebuilt and matched
       with one vectorized ``pc.is_in`` against the broadcast set; the
       covered-position mask is dilated by the window width with numpy
       fancy indexing (a gram never crosses a doc boundary, so the
       flattened dilation is segment-safe); uncovered tokens are
       re-joined.  The corpus text never shuffles.

    Tokens are whitespace words (``''`` dropped); ``clean_text`` joins
    survivors with single spaces.  Docs with zero tokens emit no row
    (SQL GROUP-BY-over-positions semantics).  Returns
    ``(id, clean_text, n_removed)`` sorted by id.
    """
    import ray

    ws_re = re.compile(r"\s+")

    def _doc_grams(text: str):
        words = [w for w in ws_re.split(text or "") if w]
        if len(words) < n:
            return words, []
        joined = " ".join(words)
        offsets = np.cumsum([0] + [len(w) + 1 for w in words])
        return words, [
            joined[offsets[i]: offsets[i + n] - 1]
            for i in range(len(words) - n + 1)
        ]

    def gram_partials(batch: pa.Table) -> pa.Table:
        acc: dict[str, int] = {}
        for text in batch.column(text_col).to_pylist():
            for g in _doc_grams(text)[1]:
                acc[g] = acc.get(g, 0) + 1
        return pa.table({
            "gram": pa.array(list(acc.keys()), pa.string()),
            "cnt": pa.array(list(acc.values()), pa.int64()),
        })

    from .segments import sorted_group_sum

    dup = sorted_group_sum(
        ds.map_batches(gram_partials, batch_format="pyarrow"),
        key_cols=["gram"], sum_cols=["cnt"],
    ).filter(lambda r: r["sum(cnt)"] >= min_count)
    n_dup = dup.count()
    if n_dup > driver_dup_rows:
        raise ValueError(
            f"{n_dup} duplicated grams exceed driver_dup_rows="
            f"{driver_dup_rows}; use a bloom-filter semi-join "
            "(functions/joins.py) for corpora this repetitive"
        )
    dup_list = [r["gram"] for r in dup.take_all()]
    dup_ref = ray.put(pa.array(dup_list, pa.string()))

    def strip(batch: pa.Table) -> pa.Table:
        dup_set = ray.get(dup_ref)
        out_id, out_text, out_removed = [], [], []
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        per_doc = [_doc_grams(t) for t in texts]
        all_grams = [g for _, grams in per_doc for g in grams]
        if all_grams:
            hit = pc.is_in(
                pa.array(all_grams, pa.string()), value_set=dup_set
            ).to_numpy(zero_copy_only=False)
        else:
            hit = np.zeros(0, dtype=bool)
        gi = 0
        for doc_id, (words, grams) in zip(ids, per_doc):
            if not words:
                continue
            covered = np.zeros(len(words), dtype=bool)
            if grams:
                starts = np.nonzero(hit[gi: gi + len(grams)])[0]
                gi += len(grams)
                if len(starts):
                    covered[
                        (starts[:, None] + np.arange(n)).ravel()
                    ] = True
            keep = [w for w, c in zip(words, covered) if not c]
            out_id.append(doc_id)
            out_text.append(" ".join(keep))
            out_removed.append(int(covered.sum()))
        return pa.table({
            id_col: pa.array(out_id, pa.int64()),
            "clean_text": pa.array(out_text, pa.string()),
            "n_removed": pa.array(out_removed, pa.int64()),
        })

    return ds.map_batches(strip, batch_format="pyarrow").sort(id_col)


def duplicate_ngram_spans(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
):
    """Per-document duplicated n-gram span counts: how many of a doc's
    word ``n``-gram positions carry an n-gram that also appears in at
    least one OTHER document.

    The n-gram-granular stand-in for suffix-array substring dedup (Lee et
    al. 2022): a doc with a high ``dup_grams / total_grams`` ratio is
    mostly copied text.  Distributed shape — exactly two narrow keyed
    shuffles, no join, no per-gram Python calls:

    1. per-batch the doc's grams are hashed (md5-128, two int64 columns —
       collision-free at corpus scale) and pre-reduced to one
       (gram, doc, positions) row, so the gram-keyed shuffle moves the
       gram INVENTORY, never the text;
    2. a native groupby over the gram hash computes (n_docs, min doc,
       Σ positions).  Because a gram is "unique" only when its group is a
       SINGLETON, the min-doc column of singleton groups attributes the
       whole unique count back to its one owner — dup attribution needs
       no join: ``dup(doc) = total(doc) − unique(doc)``;
    3. the per-doc totals (from step-1 rows) and the singleton unique
       counts union into one doc-keyed groupby-sum.

    Docs with fewer than ``n`` words emit no row (they have no grams),
    matching the oracle's inner join.

    Returns (doc_id, total_grams, dup_grams) sorted by doc_id.
    """
    from ray.data.aggregate import Count, Min, Sum

    ws_re = re.compile(r"\s+")

    def gram_rows(batch: pa.Table) -> pa.Table:
        texts = pc.utf8_lower(batch.column(text_col)).to_pylist()
        ids = batch.column(id_col).to_pylist()
        out_doc, out_h1, out_h2, out_cnt = [], [], [], []
        for doc_id, text in zip(ids, texts):
            words = [w for w in ws_re.split(text or "") if w]
            if len(words) < n:
                continue
            counts: dict[bytes, int] = {}
            joined = " ".join(words)
            # gram string = the n words joined with single spaces; byte
            # offsets into `joined` avoid re-joining per position
            offsets = np.cumsum([0] + [len(w) + 1 for w in words])
            for i in range(len(words) - n + 1):
                g = joined[offsets[i] : offsets[i + n] - 1]
                h = hashlib.md5(g.encode("utf-8", "surrogatepass")).digest()
                counts[h] = counts.get(h, 0) + 1
            for h, c in counts.items():
                out_doc.append(doc_id)
                out_h1.append(int.from_bytes(h[:8], "big") - (1 << 63))
                out_h2.append(int.from_bytes(h[8:], "big") - (1 << 63))
                out_cnt.append(c)
        return pa.table(
            {
                id_col: pa.array(out_doc, pa.int64()),
                "h1": pa.array(out_h1, pa.int64()),
                "h2": pa.array(out_h2, pa.int64()),
                "positions": pa.array(out_cnt, pa.int64()),
            }
        )

    grams = ds.map_batches(gram_rows, batch_format="pyarrow")
    # rows are unique per (gram, doc), so count() == distinct docs
    per_gram = grams.groupby(["h1", "h2"]).aggregate(
        Count(), Min(id_col), Sum("positions")
    )

    def singleton_uniques(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        keep = _pc.equal(batch.column("count()"), 1)
        t = batch.filter(keep)
        return pa.table(
            {
                id_col: t.column(f"min({id_col})"),
                "total": pa.nulls(t.num_rows, pa.int64()).fill_null(0),
                "uniq": t.column("sum(positions)").cast(pa.int64()),
            }
        )

    def totals(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column(id_col),
                "total": batch.column("positions"),
                "uniq": pa.nulls(batch.num_rows, pa.int64()).fill_null(0),
            }
        )

    uniq_rows = per_gram.map_batches(singleton_uniques, batch_format="pyarrow")
    total_rows = grams.map_batches(totals, batch_format="pyarrow")
    folded = total_rows.union(uniq_rows).groupby(id_col).sum(["total", "uniq"])

    def finish(batch: pa.Table) -> pa.Table:
        tot = batch.column("sum(total)").cast(pa.int64())
        uniq = batch.column("sum(uniq)").cast(pa.int64())
        return pa.table(
            {
                id_col: batch.column(id_col),
                "total_grams": tot,
                "dup_grams": pc.subtract(tot, uniq),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow").sort(id_col)


def priority_sample(
    ds,
    *,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    mode: str = "portable",
):
    """Deterministic weighted sampling without replacement: keep the k
    rows with the largest A-Res priority key ``u ** (1 / w)`` (Efraimidis
    & Spirakis 2006), where ``u`` is a content-derived uniform in (0, 1)
    — the top 53 bits of ``md5(CAST(id AS VARCHAR))`` — so membership is
    reproducible and externally checkable (no RNG state).

    Distributed shape: each block reduces to its local top-k rows
    (argpartition, no sort of the block), and one driver-side merge of
    O(blocks × k) rows picks the global winners — the corpus itself never
    shuffles.  Rows with weight ≤ 0 or NULL are excluded (they cannot be
    sampled).

    ``mode`` follows the repo's dual-mode convention (minhash_dedup):
    "portable" (default) derives ``u`` from md5 so DuckDB recomputes the
    key bit-for-bit — the hard-oracle path; "fast" derives it from the
    vectorized SplitMix64 finalizer (~20× fewer hash cycles, same
    statistical properties, not SQL-checkable).

    Returns (id, weight, sample_key) for the k winners, sorted by
    sample_key DESC then id — sample_key rounded to 6 decimals for
    cross-engine float portability.
    """

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        w = batch.column(weight_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        ok = np.isfinite(w) & (w > 0)
        ids, w = ids[ok], w[ok]
        if len(ids) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    weight_col: pa.array([], pa.float64()),
                    "sample_key": pa.array([], pa.float64()),
                }
            )
        if mode == "fast":
            from .hashing import splitmix64

            hv = splitmix64(ids.astype(np.uint64))
            u = ((hv >> np.uint64(11)).astype(np.float64) + 0.5) / float(1 << 53)
        else:
            u = np.array(
                [((md5_u64_str(str(int(i))) >> 11) + 0.5) / float(1 << 53) for i in ids],
                dtype=np.float64,
            )
        key = u ** (1.0 / w)
        if len(ids) > k:
            top = np.argpartition(-key, k - 1)[:k]
            ids, w, key = ids[top], w[top], key[top]
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                weight_col: pa.array(w, pa.float64()),
                "sample_key": pa.array(key, pa.float64()),
            }
        )

    partials = ds.map_batches(local_topk, batch_format="pyarrow")
    # O(blocks × k) rows — driver merge is bounded and tiny
    merged = pa.concat_tables(
        [pa.table(b) for b in partials.iter_batches(batch_format="pyarrow")]
    )
    key = merged.column("sample_key").to_numpy(zero_copy_only=False)
    ids = merged.column(id_col).to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -key))[:k]
    out = merged.take(pa.array(order, pa.int64()))
    rounded = pc.round(out.column("sample_key"), ndigits=6)
    return out.set_column(
        out.schema.get_field_index("sample_key"), "sample_key", rounded
    )
