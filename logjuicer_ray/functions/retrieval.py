"""Sparse retrieval scoring: BM25 against a broadcast query, and
reciprocal-rank fusion of two rankings.

- :func:`bm25_topk`: Okapi BM25 of every document against ONE query
  (a token list), top-k by score.  The scale shape mirrors the flagship
  scorer: the query rides the task closure (broadcast once per worker),
  per-batch term frequencies come from one vectorized split + ``is_in``
  + bincount, document frequencies from a tiny distributed aggregate
  over the query's terms only (|q| rows — never the vocabulary), and the
  global stats (N, avgdl) from one scalar aggregate.  Scores are emitted
  as ``floor(s·10⁶ + 0.5)`` integers so an external SQL engine reproduces
  them bit-for-bit (same FP operation order per document: terms are
  summed in sorted-token order).
- :func:`rrf_fuse`: reciprocal-rank fusion ``Σ floor(10⁶ / (k + rank))``
  over any number of (id, rank) Datasets — integer contributions, so the
  fused score is order-independent and SQL-recomputable.  The standard
  hybrid-retrieval merge (BM25 ranking ⊕ vector ranking).

No reference analog (the logjuicer reference scores cosine distance
against a trained index, crates/index/src/index.rs:85-102); these extend
the engine's retrieval surface for training-data curation per the brief.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import split_whitespace

__all__ = ["bm25_topk", "rrf_fuse"]


def bm25_topk(ds, query_tokens: list[str], *, id_col: str = "doc_id",
              text_col: str = "text", k: int = 20, k1: float = 1.2,
              b: float = 0.75):
    """Top-``k`` documents by BM25 score against ``query_tokens``
    (whitespace tokenization, duplicate query terms collapsed).  Returns
    (id, score_e6, rank) — rank 1-based by (score desc, id asc)."""
    from .topk import topk_per_group

    terms = sorted(set(query_tokens))
    if not terms:
        raise ValueError("bm25_topk needs at least one query token")
    term_arr = pa.array(terms, pa.string())

    def _tok(batch: pa.Table):
        toks_list = split_whitespace(pc.fill_null(batch.column(text_col), ""))
        flat = pc.list_flatten(toks_list)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        parent = pc.list_parent_indices(toks_list).to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        return flat, parent, nonempty

    # pass 1 (tiny): corpus stats — N docs, total length, per-term df.
    # One partial row per (term present in batch) + one stats row per batch.
    def _partial(batch: pa.Table) -> pa.Table:
        flat, parent, nonempty = _tok(batch)
        dl = np.bincount(parent[nonempty], minlength=batch.num_rows)
        inq = pc.is_in(flat, value_set=term_arr).to_numpy(zero_copy_only=False)
        rows_t, rows_df = [], []
        if inq.any():
            sel = np.flatnonzero(inq)
            t_idx = pc.index_in(
                flat.take(pa.array(sel, pa.int64())), value_set=term_arr
            ).to_numpy(zero_copy_only=False)
            # df: distinct docs containing the term
            pairs = np.unique(np.stack([t_idx, parent[sel]]), axis=1)
            cnt = np.bincount(pairs[0], minlength=len(terms))
            present = np.flatnonzero(cnt)
            rows_t = present.tolist()
            rows_df = cnt[present].tolist()
        return pa.table({
            "term_idx": pa.array(rows_t + [-1], pa.int64()),
            "df": pa.array(rows_df + [0], pa.int64()),
            "n_docs": pa.array([0] * len(rows_t) + [batch.num_rows], pa.int64()),
            "sum_dl": pa.array([0] * len(rows_t) + [int(dl.sum())], pa.int64()),
        })

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    agg = parts.groupby("term_idx").aggregate(
        Sum("df", alias_name="df"), Sum("n_docs", alias_name="n_docs"),
        Sum("sum_dl", alias_name="sum_dl"),
    ).take_all()  # |terms|+1 rows — bounded by the query, not the corpus
    df_by_term = np.zeros(len(terms), dtype=np.int64)
    n_docs = 0
    sum_dl = 0
    for r in agg:
        if r["term_idx"] == -1:
            n_docs += r["n_docs"]
            sum_dl += r["sum_dl"]
        else:
            df_by_term[r["term_idx"]] += r["df"]
    if n_docs == 0:
        raise ValueError("empty corpus")
    avgdl = sum_dl / n_docs
    # idf per term, standard Okapi with the +1 smoothing (always positive)
    idf = np.log(1.0 + (n_docs - df_by_term + 0.5) / (df_by_term + 0.5))

    # pass 2: per-document score.  Each TERM's contribution is floored to
    # e6 integers before summing — the sum is then order-independent
    # (partitioning-proof) and an external SQL engine reproduces it as a
    # plain SUM over per-(doc, term) integer contributions.
    def _score(batch: pa.Table) -> pa.Table:
        flat, parent, nonempty = _tok(batch)
        dl = np.bincount(parent[nonempty], minlength=batch.num_rows).astype(np.float64)
        norm = k1 * (1.0 - b + b * dl / avgdl)
        e6 = np.zeros(batch.num_rows, dtype=np.int64)
        inq = pc.is_in(flat, value_set=term_arr).to_numpy(zero_copy_only=False)
        sel = np.flatnonzero(inq)
        if len(sel):
            t_idx = pc.index_in(
                flat.take(pa.array(sel, pa.int64())), value_set=term_arr
            ).to_numpy(zero_copy_only=False)
            for ti in range(len(terms)):  # |q| vectorized passes, not per row
                mask = t_idx == ti
                if not mask.any():
                    continue
                tf = np.bincount(parent[sel[mask]], minlength=batch.num_rows
                                 ).astype(np.float64)
                contrib = idf[ti] * (tf * (k1 + 1.0)) / (tf + norm)
                e6 += np.floor(contrib * 1e6 + 0.5).astype(np.int64) * (tf > 0)
        out = pa.table({
            id_col: batch.column(id_col),
            "score_e6": pa.array(e6, pa.int64()),
        })
        return out.filter(pc.greater(out.column("score_e6"), 0))

    scored = ds.map_batches(_score, batch_format="pyarrow")
    top = topk_per_group(
        scored.map_batches(
            lambda t: t.append_column("_g", pa.array([0] * t.num_rows, pa.int8())),
            batch_format="pyarrow",
        ),
        group_cols=["_g"], order_col="score_e6", k=k, tie_cols=[id_col],
    )
    return top.drop_columns(["_g"])


def rrf_fuse(rankings, *, id_col: str, rank_col: str = "rank", k: int = 60):
    """Reciprocal-rank fusion: ``score = Σ_r floor(10⁶ / (k + rank_r))``
    over the given (id, rank) Datasets; ids absent from a ranking simply
    contribute nothing.  Returns (id, rrf_e6) — integer contributions make
    the sum exact under any partitioning and SQL-recomputable."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")

    def _contrib(batch: pa.Table) -> pa.Table:
        r = batch.column(rank_col).to_numpy(zero_copy_only=False).astype(np.int64)
        c = (1_000_000 // (k + r)).astype(np.int64)
        return pa.table({id_col: batch.column(id_col),
                         "rrf_e6": pa.array(c, pa.int64())})

    from ray.data.aggregate import Sum

    parts = rankings[0].map_batches(_contrib, batch_format="pyarrow")
    for other in rankings[1:]:
        parts = parts.union(other.map_batches(_contrib, batch_format="pyarrow"))
    return parts.groupby(id_col).aggregate(Sum("rrf_e6", alias_name="rrf_e6"))
