"""DSIR-style data selection: hashed n-gram importance weights.

Data Selection with Importance Resampling (Xie et al., 2023, public
arXiv:2302.03169): estimate per-document importance weights
``log p_target(x) - log p_raw(x)`` under bag-of-hashed-ngrams unigram+bigram
models, where both models are Laplace-smoothed histograms over
``num_buckets`` hash buckets.  Documents that look like the target domain
(here: a column predicate, e.g. ``lang == 'en'``) get high weights; a
downstream weighted/top-k sample keeps them.

Ray-Data-first shape (no reference counterpart — engine addition):

- **Pass 1 (count)**: one ``map_batches`` emits per-batch partial
  ``(bucket, raw_cnt, tgt_cnt)`` rows (nonzero buckets only — at most
  ``num_buckets`` rows per batch), a single ``groupby(bucket)`` sums them,
  and the driver collects at most ``num_buckets`` rows (the documented
  driver-side bound; the histograms are the model, not the data).
- **Broadcast**: the λ = ln(p_t) - ln(p_r) bucket vector ships once via
  ``ray.put`` (8 B × num_buckets).
- **Pass 2 (score)**: an actor-pool ``map_batches`` re-hashes each doc's
  grams and segment-sums ``λ[bucket]`` per document with ``bincount`` —
  no shuffle at all; embeddings of the corpus never move.

Hashing is dual-mode like the MinHash family (functions/dedup.py):

- ``mode="portable"`` (default): md5-u64 of the gram string
  (functions/hashing.py), memoized per worker on UNIQUE grams per batch
  (dictionary-encode first, hash each distinct gram once) — every bucket
  is recomputable in DuckDB as
  ``('0x' || substr(md5(g), 1, 16))::UBIGINT % num_buckets``, so the
  operator has a hard SQL value oracle.
- ``mode="fast"``: tokens are md5-hashed once through the same memoized
  cache, then unigram buckets come from SplitMix64(token hash) and bigram
  buckets from SplitMix64(h1 * P + h2) — the gram-combination step is one
  vectorized multiply-add over uint64 arrays, no per-gram Python.  Not
  SQL-recomputable; statistically equivalent; the 100-TB path.

Tokenization matches the corpus operators (functions/corpus.py): whitespace
split, empty tokens dropped BEFORE bigram pairing (DuckDB mirror:
``list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')``).
Documents with no tokens emit no row (SQL GROUP BY semantics).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import TokenHasher, splitmix64
from .text import split_whitespace

__all__ = ["dsir_logratio", "epoch_shuffle", "mix_corpora",
           "temperature_weights"]

_POLY_BASE = np.uint64(1099511628211)  # FNV-64 prime as the combine base


def _doc_grams(batch: pa.Table, text_col: str):
    """Flattened (grams, parent_row_index) for unigrams + bigrams of each
    row's whitespace tokens; rows with NULL text contribute nothing but
    keep their row index so parents align with the batch."""
    lists = split_whitespace(pc.fill_null(batch.column(text_col), ""))
    toks = pc.list_flatten(lists)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    par = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    mask = pc.not_equal(toks, "")
    mask_np = mask.to_numpy(zero_copy_only=False)
    toks = toks.filter(mask)
    par = par[mask_np]
    if len(par) > 1:
        adj = par[:-1] == par[1:]
        adj_arr = pa.array(adj)
        t1 = toks.slice(0, len(toks) - 1).filter(adj_arr)
        t2 = toks.slice(1).filter(adj_arr)
        bigrams = pc.binary_join_element_wise(t1, t2, " ")
        bpar = par[:-1][adj]
    else:
        bigrams = pa.array([], pa.string())
        bpar = np.array([], dtype=par.dtype)
    return toks, par, bigrams, bpar


def _hash_unique(arr: pa.Array, hasher: TokenHasher) -> tuple[np.ndarray, np.ndarray]:
    """Dictionary-encode an Arrow string array and md5-hash each DISTINCT
    value once (memoized across batches).  Returns (indices, u64 hashes of
    the dictionary)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    enc = arr.dictionary_encode()
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = enc.dictionary.to_pylist()
    h = np.fromiter((hasher(u) for u in uniq), dtype=np.uint64, count=len(uniq))
    return idx, h


class _GramBuckets:
    """Per-worker gram → bucket mapper shared by both passes."""

    def __init__(self, text_col: str, num_buckets: int, mode: str):
        self.text_col = text_col
        self.nb = np.uint64(num_buckets)
        self.mode = mode
        self.hasher = TokenHasher()

    def __call__(self, batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        """Returns (bucket id per gram, parent row index per gram)."""
        toks, par, bigrams, bpar = _doc_grams(batch, self.text_col)
        if self.mode == "portable":
            # hash the full gram STRING so SQL can recompute the bucket
            ti, th = _hash_unique(toks, self.hasher)
            bi, bh = _hash_unique(bigrams, self.hasher)
            uni_b = (th % self.nb)[ti] if len(ti) else np.array([], np.uint64)
            big_b = (bh % self.nb)[bi] if len(bi) else np.array([], np.uint64)
        else:
            # fast: token-level md5 once, vectorized SplitMix64 combine
            ti, th = _hash_unique(toks, self.hasher)
            tok_h = th[ti] if len(ti) else np.array([], np.uint64)
            uni_b = splitmix64(tok_h) % self.nb
            if len(par) > 1:
                adj = par[:-1] == par[1:]
                with np.errstate(over="ignore"):
                    comb = tok_h[:-1][adj] * _POLY_BASE + tok_h[1:][adj]
                big_b = splitmix64(comb) % self.nb
            else:
                big_b = np.array([], np.uint64)
        return (
            np.concatenate([uni_b, big_b]).astype(np.int64),
            np.concatenate([par, bpar]).astype(np.int64),
        )


def dsir_logratio(ds, *, id_col: str = "doc_id", text_col: str = "text",
                  target_col: str = "lang", target_value: str = "en",
                  num_buckets: int = 4096, round_digits: int = 4,
                  mode: str = "portable"):
    """Per-document DSIR log importance weight over hashed unigrams +
    bigrams.  ``λ[b] = ln((tgt[b]+1)/(tgt_total+B)) - ln((raw[b]+1)/
    (raw_total+B))`` where ``tgt`` counts grams of rows with
    ``target_col == target_value`` and ``raw`` counts all grams; a doc's
    ``log_weight`` is the sum of λ over its gram occurrences.

    Returns (id, n_grams, log_weight) sorted by id; docs with no tokens
    emit no row.  The only driver materialization is the ≤``num_buckets``-
    row bucket histogram (model-sized, not data-sized).
    """
    import ray

    if mode not in ("portable", "fast"):
        raise ValueError(f"unknown mode {mode!r}")
    nb = num_buckets

    class Counter:
        """Actor-pool pass 1: the memoized token hasher persists across
        batches (setup-once-per-worker pattern)."""

        def __init__(self):
            self.gb = _GramBuckets(text_col, nb, mode)

        def __call__(self, batch: pa.Table) -> pa.Table:
            buckets, parents = self.gb(batch)
            tgt_rows = pc.equal(
                batch.column(target_col), target_value
            ).fill_null(False).to_numpy(zero_copy_only=False)
            raw = np.bincount(buckets, minlength=nb)
            tgt = (
                np.bincount(buckets[tgt_rows[parents]], minlength=nb)
                if len(buckets) else np.zeros(nb, np.int64)
            )
            nz = np.nonzero(raw)[0]
            return pa.table({
                "bucket": pa.array(nz, pa.int64()),
                "raw_cnt": pa.array(raw[nz], pa.int64()),
                "tgt_cnt": pa.array(tgt[nz], pa.int64()),
            })

    totals = (
        ds.map_batches(Counter, concurrency=(1, 8), batch_format="pyarrow")
        .groupby("bucket")
        .sum(["raw_cnt", "tgt_cnt"])
    )
    raw = np.zeros(nb, np.float64)
    tgt = np.zeros(nb, np.float64)
    for b in totals.iter_batches(batch_format="pyarrow"):
        idx = b.column("bucket").to_numpy(zero_copy_only=False)
        raw[idx] = b.column("sum(raw_cnt)").to_numpy(zero_copy_only=False)
        tgt[idx] = b.column("sum(tgt_cnt)").to_numpy(zero_copy_only=False)
    raw_total, tgt_total = raw.sum(), tgt.sum()
    lam = (
        np.log(tgt + 1.0) - math.log(tgt_total + nb)
        - np.log(raw + 1.0) + math.log(raw_total + nb)
    )
    lam_ref = ray.put(lam)

    class Scorer:
        def __init__(self):
            self.lam = ray.get(lam_ref)
            self.gb = _GramBuckets(text_col, nb, mode)

        def __call__(self, batch: pa.Table) -> pa.Table:
            buckets, parents = self.gb(batch)
            n_rows = batch.num_rows
            n_grams = np.bincount(parents, minlength=n_rows)
            w = np.bincount(
                parents, weights=self.lam[buckets], minlength=n_rows
            )
            has = n_grams > 0
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)[has]
            return pa.table({
                id_col: pa.array(ids, pa.int64()),
                "n_grams": pa.array(n_grams[has], pa.int64()),
                "log_weight": pa.array(
                    np.round(w[has], round_digits), pa.float64()
                ),
            })

    return ds.map_batches(
        Scorer, concurrency=(1, 8), batch_format="pyarrow"
    ).sort(id_col)


def epoch_shuffle(ds, *, id_col: str = "doc_id", seed: int = 0,
                  mode: str = "portable", n_buckets: int = 64):
    """Deterministic global shuffle for one training epoch: every row gets
    a seeded hash key and an exact global ``epoch_pos`` (1-based
    row_number over ``(shuffle_key, id)``).

    Unlike ``Dataset.random_shuffle`` — whose output order depends on the
    block layout — the ordering here is a pure function of (seed, id), so
    it is identical under any partitioning, resumable mid-epoch (a reader
    can seek to ``epoch_pos > N``), and recomputable by an external
    system.  A thin composition of existing pieces by design: the seeded
    key is one vectorized ``map_batches`` and the position comes from
    ``functions/rank.global_rank`` (range-partition + histogram offsets —
    a distributed exchange, not a driver sort; driver cost O(n_buckets)).

    ``mode="portable"``: key = md5-u64(f"{seed}:{id}") >> 11 (53-bit, so
    DuckDB float arithmetic is exact; same convention as
    ``priority_sample``) — SQL-recomputable, the oracle path.
    ``mode="fast"``: SplitMix64(id XOR seed) >> 11, fully vectorized.

    Returns (id, shuffle_key, epoch_pos) sorted by epoch_pos.
    """
    from .hashing import md5_u64_str
    from .rank import global_rank

    if mode not in ("portable", "fast"):
        raise ValueError(f"unknown mode {mode!r}")

    def _key(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if mode == "portable":
            k = np.fromiter(
                (md5_u64_str(f"{seed}:{i}") >> 11 for i in ids),
                dtype=np.int64, count=len(ids),
            )
        else:
            k = (
                splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
                >> np.uint64(11)
            ).astype(np.int64)
        return batch.append_column("shuffle_key", pa.array(k, pa.int64()))

    keyed = ds.map_batches(_key, batch_format="pyarrow")
    ranked = global_rank(
        keyed, value_col="shuffle_key", tie_col=id_col,
        descending=False, n_buckets=n_buckets, rank_col="epoch_pos",
    )
    return ranked.sort("epoch_pos")


def temperature_weights(ds, *, source_col: str = "source",
                        tau: float = 0.5) -> dict:
    """Temperature-scaled domain weights for :func:`mix_corpora`:
    ``w_s = count_s ** tau`` — the multilingual/multi-domain sampling
    smoother (count^(1/T) upweights small domains relative to their raw
    share; ``tau=1`` reproduces proportional-to-size, ``tau=0`` uniform).
    One small groupby(count) — driver state is n_sources rows.  Weights
    are left unnormalized: the interleave key ``(rank - 0.5) / w`` is
    invariant to scaling every weight by the same constant, and the raw
    ``pow`` is what an external SQL engine recomputes bit-for-bit."""
    counts = ds.groupby(source_col).count().take_all()
    return {r[source_col]: float(r["count()"]) ** tau for r in counts}


def mix_corpora(ds, *, id_col: str = "doc_id", source_col: str = "source",
                weights: dict | None = None, seed: int = 0,
                mode: str = "portable", n_buckets: int = 64):
    """Deterministic weighted interleave of corpora — the data-mixing
    recipe step of a training pipeline (domain weights à la The Pile /
    DoReMi): a source with weight ``w`` occupies every ``1/w``-th slot of
    the output order, exactly and reproducibly.

    Sources absent from ``weights`` are dropped (the recipe IS the
    filter).  Construction: (1) each kept row gets the seeded hash key of
    ``epoch_shuffle``; (2) ``rank_in_source`` = exact per-source
    row_number over that key (functions/rank.grouped_global_rank — one
    keyed exchange, driver state n_sources × n_buckets ints, so
    ``source_col`` must be low-cardinality); (3) the interleave key is
    ``(rank_in_source - 0.5) / weight`` — proportional round-robin — and
    (4) ``mix_pos`` = global row_number over it (functions/rank.
    global_rank).  Every step is a pure function of (seed, id, weights):
    partition-invariant, resumable, and SQL-recomputable in portable mode
    (float division of an integer rank is IEEE-identical across engines).

    Returns (id, source, rank_in_source, mix_pos) sorted by mix_pos.
    """
    from .hashing import md5_u64_str
    from .rank import global_rank, grouped_global_rank

    if not weights:
        raise ValueError("weights: non-empty {source: weight} required")
    if mode not in ("portable", "fast"):
        raise ValueError(f"unknown mode {mode!r}")
    wmap = {k: float(v) for k, v in weights.items()}
    allowed = pa.array(sorted(wmap), pa.string())

    def _recipe_filter(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.is_in(batch.column(source_col), value_set=allowed)
        )

    kept = ds.map_batches(_recipe_filter, batch_format="pyarrow")

    def _key(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if mode == "portable":
            k = np.fromiter(
                (md5_u64_str(f"{seed}:{i}") >> 11 for i in ids),
                dtype=np.int64, count=len(ids),
            )
        else:
            k = (
                splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
                >> np.uint64(11)
            ).astype(np.int64)
        return batch.append_column("shuffle_key", pa.array(k, pa.int64()))

    ranked = grouped_global_rank(
        kept.map_batches(_key, batch_format="pyarrow"),
        part_col=source_col, value_col="shuffle_key", tie_col=id_col,
        descending=False, n_buckets=n_buckets, rank_col="rank_in_source",
    )

    def _mix_key(batch: pa.Table) -> pa.Table:
        src = batch.column(source_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = src.dictionary_encode()
        w_dict = np.array(
            [wmap[s] for s in enc.dictionary.to_pylist()], np.float64
        )
        w = w_dict[enc.indices.to_numpy(zero_copy_only=False)]
        rnk = batch.column("rank_in_source").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "mix_key", pa.array((rnk - 0.5) / w, pa.float64())
        )

    mixed = global_rank(
        ranked.map_batches(_mix_key, batch_format="pyarrow"),
        value_col="mix_key", tie_col=id_col, descending=False,
        n_buckets=n_buckets, rank_col="mix_pos",
        keep_cols=[source_col, "rank_in_source"],
    )
    return mixed.select_columns(
        [id_col, source_col, "rank_in_source", "mix_pos"]
    ).sort("mix_pos")
