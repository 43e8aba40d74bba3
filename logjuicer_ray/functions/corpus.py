"""Corpus-statistics operators for training-data curation: vocabulary
top-k, exact distributed quantiles, and deterministic hash sampling.

All three follow the partial-aggregation shape (combine inside
``map_batches``, shuffle only the reduced rows) so the wide all-to-all
moves unique values, never the corpus:

- ``vocab_topk``: per-batch token value_counts (Arrow kernels, no Python
  per row) -> ``groupby(token).sum`` over unique-token partials -> global
  (count desc, token asc) top-k.  The shuffle is bounded by vocabulary
  size x tasks, not corpus tokens.
- ``exact_quantiles``: per-batch value_counts -> groupby(value).sum ->
  driver cumsum pick.  Driver materialization is bounded by the number of
  DISTINCT values of the column (lengths/counts at 100 TB: thousands),
  never by rows.
- ``hash_sample``: stateless deterministic filter — keep rows whose
  md5-u64(key) clears a per-stratum integer threshold.  No shuffle at
  all; resumable and reproducible across cluster sizes by construction,
  and SQL-recomputable (the driver oracle re-derives the exact sample).

Reference analog: the logjuicer reference has no corpus-stat operators
(its aggregations are per-IndexName line/byte counters,
crates/model/src/model.rs:451-470); these extend the engine for
training-data pipelines per the brief.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .text import split_whitespace

from .hashing import md5_u64_str

__all__ = ["vocab_topk", "exact_quantiles", "grouped_quantiles", "hash_sample",
           "pack_sequences", "grouped_distinct", "chunk_documents",
           "split_assign", "export_conversations", "bigram_topk",
           "ngram_decontaminate", "unigram_logprob"]


def _token_counts(batch: pa.Table, text_col: str) -> pa.Table:
    toks = pc.list_flatten(
        split_whitespace(pc.drop_null(batch.column(text_col)))
    )
    toks = toks.filter(pc.not_equal(toks, ""))
    vc = toks.value_counts()
    if isinstance(vc, pa.ChunkedArray):
        vc = vc.combine_chunks()
    return pa.table(
        {"token": vc.field("values"), "cnt": pc.cast(vc.field("counts"), pa.int64())}
    )


def vocab_topk(ds, *, text_col: str = "text", k: int = 100):
    """Corpus-wide whitespace-token frequencies, top ``k`` by
    (count desc, token asc) with a ``rank`` column (1-based; ties broken
    by token so the result is deterministic under any partitioning)."""
    partials = ds.map_batches(
        lambda b: _token_counts(b, text_col), batch_format="pyarrow"
    )
    from .segments import sorted_group_sum

    totals = sorted_group_sum(partials, key_cols=["token"], sum_cols=["cnt"])

    def _rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["token", "cnt"])

    totals = totals.map_batches(_rename, batch_format="pyarrow")
    # global top-k over unique tokens: the sort input is the vocabulary
    # (bounded, already one row per token), not the corpus
    top = totals.sort(["cnt", "token"], descending=[True, False]).limit(k)

    def _rank(b: pa.Table) -> pa.Table:
        return b.append_column("rank", pa.array(range(1, b.num_rows + 1), pa.int64()))

    # limit(k) yields a single tiny block; ranking in one map is exact
    return top.repartition(1).map_batches(_rank, batch_format="pyarrow")


def unigram_logprob(ds, *, id_col: str = "doc_id", text_col: str = "text",
                    min_count: int = 2, round_digits: int = 4,
                    max_vocab_rows: int = 20_000_000):
    """Per-document unigram language-model score — the CCNet-style
    perplexity-proxy quality signal: ``avg_logprob`` = mean over the doc's
    whitespace tokens of ``ln(p(token))`` with ``p = cnt / total`` from
    the corpus's own token counts; tokens below ``min_count`` (and
    anything unseen) smooth to ``1 / total``.  Low scores flag gibberish
    / rare-token soup, high scores flag boilerplate.

    Two passes, both vectorized: (1) the existing partial-counts →
    groupby token count (the vocab shuffle moves unique tokens only);
    the kept vocab — hapax legomena pruned by ``min_count``, typically
    cutting the table in half — is broadcast once via ``ray.put``;
    (2) a per-batch Arrow ``index_in`` lookup against the broadcast
    token array (no per-token Python), segment-mean via ``bincount`` on
    ``list_parent_indices``.  ``max_vocab_rows`` is the documented
    driver-side bound for the broadcast table; a corpus whose pruned
    vocab exceeds it needs a count-threshold raise (asserted, not
    silently truncated).

    Docs with no tokens emit no row (matching the SQL GROUP BY).
    Returns (id, n_tokens, avg_logprob) sorted by id.
    """
    import math

    import numpy as np
    import ray

    partials = ds.map_batches(
        lambda b: _token_counts(b, text_col), batch_format="pyarrow"
    )
    from .segments import sorted_group_sum

    totals = sorted_group_sum(partials, key_cols=["token"], sum_cols=["cnt"])
    vocab_parts, total_cnt, kept_rows = [], 0, 0
    for b in totals.iter_batches(batch_format="pyarrow"):
        cnt = b.column("sum(cnt)")
        total_cnt += pc.sum(cnt).as_py() or 0
        keep = pc.greater_equal(cnt, min_count)
        kb = b.filter(keep)
        kept_rows += kb.num_rows
        assert kept_rows <= max_vocab_rows, (
            f"pruned vocab exceeds max_vocab_rows={max_vocab_rows}; "
            f"raise min_count"
        )
        vocab_parts.append(pa.table({
            "token": kb.column("token"),
            "cnt": kb.column("sum(cnt)").cast(pa.int64()),
        }))
    vocab = pa.concat_tables(vocab_parts).combine_chunks()
    vocab_ref = ray.put(vocab)
    ln_total = math.log(float(total_cnt)) if total_cnt else 0.0

    class Scorer:
        def __init__(self):
            v = ray.get(vocab_ref)
            self.tokens = v.column("token").combine_chunks()
            self.ln_cnt = np.log(
                v.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
            )

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = pc.drop_null(batch.column(text_col))
            ids_all = batch.column(id_col).filter(
                pc.is_valid(batch.column(text_col))
            ).to_numpy(zero_copy_only=False)
            lists = split_whitespace(texts)
            toks = pc.list_flatten(lists)
            parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
            nonempty = pc.not_equal(toks, "")
            toks = toks.filter(nonempty)
            parents = parents[nonempty.to_numpy(zero_copy_only=False)]
            idx = pc.index_in(toks, value_set=self.tokens)
            valid = idx.is_valid().to_numpy(zero_copy_only=False)
            pos = idx.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
            hit = self.ln_cnt[pos] if len(self.ln_cnt) else np.zeros(len(pos))
            # OOV smooths to cnt 1: ln(1) = 0 before the - ln(total)
            lp = np.where(valid, hit, 0.0) - ln_total
            n_rows = len(ids_all)
            tok_n = np.bincount(parents, minlength=n_rows)
            lp_sum = np.bincount(parents, weights=lp, minlength=n_rows)
            has = tok_n > 0
            avg = np.round(lp_sum[has] / tok_n[has], round_digits)
            return pa.table({
                id_col: pa.array(ids_all[has], pa.int64()),
                "n_tokens": pa.array(tok_n[has], pa.int64()),
                "avg_logprob": pa.array(avg, pa.float64()),
            })

    return ds.map_batches(Scorer, concurrency=(1, 8),
                          batch_format="pyarrow").sort(id_col)


def _quantile_pick(rows, qs: list[float]) -> dict:
    """percentile_disc pick over sorted (value, count) rows: for each q the
    smallest value whose cumulative count reaches ceil(q*n).  Shared by
    exact_quantiles (driver pick) and grouped_quantiles (per-group pick)."""
    import math

    n = sum(c for _, c in rows)
    out: dict[str, list] = {}
    for q in qs:
        target = max(1, math.ceil(q * n))
        acc = 0
        val = rows[-1][0] if rows else None
        for v, c in rows:
            acc += c
            if acc >= target:
                val = v
                break
        out[f"p{int(round(q * 100))}"] = [val]
    return out


def exact_quantiles(ds, col: str, qs: list[float]):
    """Exact discrete quantiles (percentile_disc semantics: the smallest
    value whose cumulative count reaches ceil(q*n)) of an integer column,
    via mergeable value-count partials.  Returns a one-row pyarrow Table
    with columns ``p<q*100>`` (e.g. p50, p90, p99)."""

    def _vc(batch: pa.Table) -> pa.Table:
        v = pc.drop_null(batch.column(col))
        vc = v.value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table(
            {col: vc.field("values"), "cnt": pc.cast(vc.field("counts"), pa.int64())}
        )

    from .segments import sorted_group_sum

    totals = sorted_group_sum(
        ds.map_batches(_vc, batch_format="pyarrow"),
        key_cols=[col], sum_cols=["cnt"],
    )
    # distinct-value table: bounded driver materialization (documented above)
    rows = sorted((r[col], r["sum(cnt)"]) for r in totals.take_all())
    return pa.table(_quantile_pick(rows, qs))


def _splitmix64_np(x):
    """Fast (non-SQL-portable) hash for integer keys, mirroring MinHash's
    dual-mode design — canonical implementation in functions/hashing.py."""
    from .hashing import splitmix64

    return splitmix64(x)


def hash_sample(ds, *, key_col: str, frac: float | None = None,
                strata_col: str | None = None,
                strata_frac: dict[str, float] | None = None,
                default_frac: float = 0.0, portable: bool = True):
    """Deterministic reproducible sampling: keep a row iff
    ``hash(key) < floor(frac * 2^64)``.  With ``strata_col`` +
    ``strata_frac``, the fraction is chosen per stratum (unlisted strata
    use ``default_frac``).  Thresholds are exact integers; no RNG state,
    no shuffle, stable under repartitioning and resume.

    ``portable=True`` (default): md5-u64 over ``str(key)`` — recomputable
    by an external SQL engine (the driver oracle re-derives the sample
    bit-for-bit).  ``portable=False``: vectorized SplitMix64 over integer
    keys — no per-row Python, the throughput path at corpus scale (same
    sampling guarantees, different — but equally deterministic — sample)."""
    import numpy as np

    if (frac is None) == (strata_frac is None):
        raise ValueError("pass exactly one of frac / strata_frac")
    _max = 2**64 - 1  # uint64-comparable; frac >= 1.0 keeps everything but
    # the single hash value 2^64-1 (probability 2^-64; sampling at 1.0 is a
    # no-op anyway)
    if frac is not None:
        thresholds = {None: min(int(frac * 2**64), _max)}
    else:
        thresholds = {s: min(int(f * 2**64), _max) for s, f in strata_frac.items()}
    default_thr = min(int(default_frac * 2**64), _max)

    def _hashes(batch: pa.Table) -> "np.ndarray":
        col = batch.column(key_col)
        if not portable:
            if not pa.types.is_integer(col.type):
                raise ValueError("portable=False requires an integer key column")
            keys = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            return _splitmix64_np(keys)
        return np.fromiter(
            (md5_u64_str(str(k)) for k in col.to_pylist()),
            dtype=np.uint64, count=batch.num_rows,
        )

    def _filter(batch: pa.Table) -> pa.Table:
        hs = _hashes(batch)
        if frac is not None:
            mask = hs < np.uint64(thresholds[None])
        else:
            ss = batch.column(strata_col).to_pylist()
            thr = np.fromiter(
                (thresholds.get(s, default_thr) for s in ss),
                dtype=np.uint64, count=batch.num_rows,
            )
            mask = hs < thr
        return batch.filter(pa.array(mask))

    return ds.map_batches(_filter, batch_format="pyarrow")


def grouped_quantiles(ds, *, group_cols: list[str], col: str, qs: list[float]):
    """Per-group exact discrete quantiles (percentile_disc semantics), fully
    distributed: per-batch (group, value) count partials -> one keyed
    groupby over unique (group, value) pairs -> per-group quantile pick in
    ``map_groups`` (each group's work is bounded by its DISTINCT values).
    Returns one row per group with ``p<q*100>`` columns."""

    def _vc(batch: pa.Table) -> pa.Table:
        cols = group_cols + [col]
        g = batch.select(cols).group_by(cols).aggregate([([], "count_all")])
        return g.rename_columns(cols + ["cnt"])

    totals = (
        ds.map_batches(_vc, batch_format="pyarrow")
        .groupby(group_cols + [col])
        .sum("cnt")
    )

    # per-group percentile_disc pick on the sorted grouped-apply exchange:
    # the unique (group, value, cnt) rows sort once; every group in a block
    # resolves ALL its quantiles with one structured searchsorted against
    # the segment-local cumulative counts (identical target arithmetic to
    # _quantile_pick — same float64 product, same ceil)
    from .segments import sorted_group_apply

    def _pick_block(sub: pa.Table, offsets) -> pa.Table:
        import numpy as np

        p_names = [f"p{int(round(q * 100))}" for q in qs]
        n = sub.num_rows
        if n == 0:
            out = {c: sub.column(c) for c in group_cols}
            for pn in p_names:
                out[pn] = sub.column(col)
            return pa.table(out)
        offsets = np.asarray(offsets, dtype=np.int64)
        cnt = sub.column("sum(cnt)").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        cum = np.cumsum(cnt)
        seg = np.repeat(np.arange(len(offsets), dtype=np.int64),
                        np.diff(np.append(offsets, n)))
        base = np.where(offsets > 0, cum[np.maximum(offsets - 1, 0)], 0)
        seg_end = np.append(offsets[1:], n)
        total_k = cum[seg_end - 1] - base
        comp = np.empty(n, dtype=[("s", "<i8"), ("c", "<i8")])
        comp["s"] = seg
        comp["c"] = cum - base[seg]
        heads = pa.array(offsets, pa.int64())
        out = {c: sub.column(c).take(heads) for c in group_cols}
        q_query = np.empty(len(offsets), dtype=comp.dtype)
        q_query["s"] = np.arange(len(offsets), dtype=np.int64)
        for q, pn in zip(qs, p_names):
            q_query["c"] = np.maximum(
                1, np.ceil(q * total_k.astype(np.float64)).astype(np.int64))
            pos = np.searchsorted(comp, q_query, side="left")
            out[pn] = sub.column(col).take(pa.array(pos, pa.int64()))
        return pa.table(out)

    return sorted_group_apply(
        totals, key_cols=list(group_cols), order_cols=[col],
        apply_block=_pick_block,
    )


def pack_sequences(path: str, *, id_col: str, size_col: str, cap: int,
                   parallelism_hint: int | None = None):
    """Sequence packing for training batches: assign each document a ``bin``
    such that bins fill contiguously to ``cap`` size units —
    ``bin = exclusive_prefix_sum(size) // cap`` over documents ordered by
    ``id_col``.

    A global ordered prefix sum is the one primitive Ray Data's Dataset API
    cannot express (every map is order-oblivious, every aggregate is
    commutative), so this drops to raw Ray tasks — the documented
    last-resort case:

      pass 1: one task per (file, row_group) reads ONLY ``size_col`` and
              returns (sum, min_id, max_id) — tiny column scan;
      driver: exclusive scan over the per-unit sums (O(row_groups) rows,
              never row data) + a sortedness check on the id ranges;
      pass 2: one task per unit reads the unit, adds
              ``(unit_offset + local_exclusive_cumsum) // cap``.

    PARTITIONING ASSUMPTION (checked in pass 1): the parquet is sorted by
    ``id_col`` and file/row-group order follows id order — the same
    canonical layout the flagship pipeline's sorted_input mode relies on.
    Results return as ``from_arrow_refs`` (blocks stay in the object
    store; nothing concentrates on the driver)."""
    import glob as _glob
    import os as _os

    import numpy as np
    import pyarrow.parquet as _pq
    import ray
    import ray.data as rd

    if _os.path.isdir(path):
        files = sorted(_glob.glob(_os.path.join(path, "*.parquet")))
    else:
        files = [path]
    units = []
    for f in files:
        n_rg = _pq.ParquetFile(f).metadata.num_row_groups
        units.extend((f, i) for i in range(n_rg))

    @ray.remote
    def _unit_summary(f: str, rg: int):
        t = _pq.ParquetFile(f).read_row_group(rg, columns=[id_col, size_col])
        sizes = t.column(size_col).to_numpy(zero_copy_only=False)
        ids = t.column(id_col)
        lo = ids[0].as_py() if t.num_rows else None
        hi = ids[-1].as_py() if t.num_rows else None
        return int(sizes.sum()), lo, hi, bool(
            np.all(np.diff(ids.to_numpy(zero_copy_only=False)) >= 0)
        ) if t.num_rows else True

    summaries = ray.get([_unit_summary.remote(f, rg) for f, rg in units])
    # order units by their actual id ranges (glob order is lexicographic —
    # part-10 sorts before part-2 — so file naming must not matter); the
    # sortedness requirement is then: ranges disjoint + each unit sorted
    paired = sorted(
        zip(units, summaries),
        key=lambda us: (us[1][1] is None, us[1][1]),
    )
    units = [u for u, _ in paired]
    prev_hi = None
    offsets = []
    acc = 0
    for _, (s, lo, hi, inner_sorted) in paired:
        if not inner_sorted or (prev_hi is not None and lo is not None and lo < prev_hi):
            raise ValueError(
                f"pack_sequences requires input sorted by {id_col} "
                "(row-group id ranges must be disjoint)"
            )
        offsets.append(acc)
        acc += s
        prev_hi = hi if hi is not None else prev_hi

    @ray.remote
    def _assign(f: str, rg: int, offset: int):
        t = _pq.ParquetFile(f).read_row_group(rg, columns=[id_col, size_col])
        sizes = t.column(size_col).to_numpy(zero_copy_only=False).astype(np.int64)
        excl = np.cumsum(sizes) - sizes + offset
        return t.append_column("bin", pa.array(excl // cap, pa.int64()))

    refs = [_assign.remote(f, rg, off) for (f, rg), off in zip(units, offsets)]
    return rd.from_arrow_refs(refs)


def contamination_scan(ds, probes: list[str], *, id_col: str = "doc_id",
                       text_col: str = "text"):
    """Benchmark-contamination detection: flag documents containing any of
    the probe strings as exact substrings.  The probe set is closed over by
    the task closure (broadcast once per worker, not per batch); matching
    is one vectorized Arrow ``match_substring`` pass per probe — use an
    Aho-Corasick actor stage if the probe set grows beyond O(100).
    Emits (id, n_probes_hit, first_probe) for contaminated docs only."""
    if not probes:
        raise ValueError("contamination_scan needs at least one probe string")

    def _scan(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column(text_col), "")
        hits = [pc.match_substring(text, p) for p in probes]
        import numpy as np

        m = np.vstack([h.to_numpy(zero_copy_only=False) for h in hits])
        n_hit = m.sum(axis=0).astype(np.int64)
        any_hit = n_hit > 0
        first_idx = np.argmax(m, axis=0)  # first probe (list order) that hit
        first = np.array(probes, dtype=object)[first_idx]
        out = pa.table({
            id_col: batch.column(id_col),
            "n_probes_hit": pa.array(n_hit, pa.int64()),
            "first_probe": pa.array(first, pa.string()),
        })
        return out.filter(pa.array(any_hit))

    return ds.map_batches(_scan, batch_format="pyarrow")


def tfidf_topk(ds, *, id_col: str = "doc_id", text_col: str = "text", k: int = 3,
               num_partitions: int = 8):
    """Top-``k`` TF-IDF terms per document (tf = in-doc count,
    idf = ln(N / df), N = docs with non-null text).  Fully distributed:

    - tf: vectorized in-batch explode (``list_parent_indices``) + Arrow
      group_by — exact because one row IS one document, so a batch always
      holds whole documents;
    - df: ``groupby(token).count`` over the distinct (doc, token) tf rows
      (vocabulary-sized output);
    - tf ⋈ df: native hash join on token (the scale path — df may be
      far larger than driver memory at corpus scale);
    - top-k: ``topk_per_group`` with its map-side k-bounded combiner.

    Scores are emitted as ``tfidf_e6`` (floor(s·10⁶ + 0.5)) so an external
    SQL engine can reproduce values exactly."""
    import numpy as np

    from .topk import topk_per_group

    def _tf(batch: pa.Table) -> pa.Table:
        toks_list = split_whitespace(batch.column(text_col))
        flat = pc.list_flatten(toks_list)
        parent = pc.list_parent_indices(toks_list)
        ids = batch.column(id_col).take(parent)
        t = pa.table({id_col: ids, "token": flat}).filter(
            pc.not_equal(pc.field("token"), "")
        )
        g = t.group_by([id_col, "token"]).aggregate([([], "count_all")])
        return g.rename_columns([id_col, "token", "tf"])

    def _n_docs(batch: pa.Table) -> pa.Table:
        n = pc.sum(pc.cast(pc.is_valid(batch.column(text_col)), pa.int64())).as_py()
        return pa.table({"n": pa.array([n or 0], pa.int64())})

    n_docs = sum(r["n"] for r in ds.map_batches(_n_docs, batch_format="pyarrow").take_all())
    # materialize: tf feeds BOTH the df groupby and the join side — without
    # it Ray re-executes the tokenize-explode lineage once per consumer,
    # doubling the dominant cost.  The tf table (unique (doc, token) counts)
    # is smaller than the raw text it summarizes, so this is the cheap side
    # to pin in the object store.
    tf = ds.map_batches(_tf, batch_format="pyarrow").materialize()
    df = tf.groupby("token").count().map_batches(
        lambda b: b.rename_columns(["token", "df"]), batch_format="pyarrow"
    )
    joined = tf.join(df, join_type="inner", num_partitions=num_partitions,
                     on=("token",))

    def _score(batch: pa.Table) -> pa.Table:
        tfv = batch.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = batch.column("df").to_numpy(zero_copy_only=False).astype(np.float64)
        s = tfv * np.log(float(n_docs) / dfv)
        return batch.append_column("s", pa.array(s, pa.float64()))

    scored = joined.map_batches(_score, batch_format="pyarrow")
    top = topk_per_group(
        scored, group_cols=[id_col], order_col="s", k=k, tie_cols=["token"],
    )

    def _e6(batch: pa.Table) -> pa.Table:
        e6 = pc.cast(pc.floor(pc.add(pc.multiply(batch.column("s"), 1e6), 0.5)),
                     pa.int64())
        return (batch.select([id_col, "token", "rank"])
                .append_column("tfidf_e6", e6))

    return top.map_batches(_e6, batch_format="pyarrow")


def grouped_distinct(ds, *, group_col: str, value_col: str):
    """Exact per-group COUNT(DISTINCT value): the two-stage distributed
    distinct.  Stage 1 pre-dedups (group, value) pairs INSIDE each batch
    (Arrow ``group_by`` with no aggregates — no Python per row) so the wide
    shuffle moves unique pairs, not rows; stage 2 dedups pairs globally
    (``groupby([group, value]).count()``); stage 3 reduces the pair rows to
    per-group counts with another in-batch partial + a tiny keyed Sum.

    Shuffle bytes are bounded by distinct-pair cardinality x tasks — at
    100 TB the events never move, only their distinct (group, value) keys.
    """
    from ray.data.aggregate import Sum

    def _pairs(batch: pa.Table) -> pa.Table:
        t = pa.table({group_col: batch.column(group_col),
                      value_col: batch.column(value_col)})
        return t.group_by([group_col, value_col]).aggregate([])

    pairs = ds.select_columns([group_col, value_col]).map_batches(
        _pairs, batch_format="pyarrow"
    )
    uniq = pairs.groupby([group_col, value_col]).count()

    def _cnt(batch: pa.Table) -> pa.Table:
        t = pa.table({group_col: batch.column(group_col),
                      "one": pa.array([1] * len(batch), pa.int64())})
        g = pa.TableGroupBy(t, group_col).aggregate([("one", "sum")])
        return g.rename_columns([group_col, "n_distinct"])

    return (
        uniq.map_batches(_cnt, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(Sum("n_distinct", alias_name="n_distinct"))
    )


def chunk_documents(ds, *, id_col: str = "doc_id", text_col: str = "text",
                    chunk_chars: int = 100, stride: int = 80):
    """Fixed-size document chunking with overlap (the standard LLM
    pre-training window split): chunk ``i`` covers characters
    ``[i*stride, i*stride + chunk_chars)``; a document emits
    ``1 + ceil((len - chunk_chars) / stride)`` chunks (one if it fits),
    so every character is covered and consecutive chunks overlap by
    ``chunk_chars - stride``.

    Stateless flat-map — no shuffle; the inner loop is over CHUNK ORDINALS
    (bounded by max_doc_len/stride), each iteration one vectorized Arrow
    ``utf8_slice_codeunits`` over the documents still long enough, never a
    Python loop over rows."""
    import math

    if stride <= 0 or chunk_chars <= 0 or stride > chunk_chars:
        raise ValueError("need 0 < stride <= chunk_chars")

    def _chunks(batch: pa.Table) -> pa.Table:
        import numpy as np

        texts = pc.fill_null(batch.column(text_col), "")
        lens = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
        n_chunks = np.where(
            lens <= chunk_chars, 1,
            np.ceil((lens - chunk_chars) / stride).astype(np.int64) + 1,
        )
        pieces = []
        i = 0
        remaining = np.arange(len(batch), dtype=np.int64)
        while True:
            keep = remaining[n_chunks[remaining] > i]
            if not len(keep):
                break
            idx = pa.array(keep, pa.int64())
            sub = pc.utf8_slice_codeunits(
                texts.take(idx) if not isinstance(texts, pa.ChunkedArray)
                else texts.combine_chunks().take(idx),
                start=i * stride, stop=i * stride + chunk_chars,
            )
            pieces.append(pa.table({
                id_col: batch.column(id_col).take(idx),
                "chunk_idx": pa.array(
                    np.full(len(keep), i, dtype=np.int64), pa.int64()),
                "chunk": sub,
            }))
            remaining = keep
            i += 1
        if not pieces:
            return pa.table({id_col: batch.column(id_col).slice(0, 0),
                             "chunk_idx": pa.array([], pa.int64()),
                             "chunk": pa.array([], pa.string())})
        return pa.concat_tables(pieces)

    return ds.select_columns([id_col, text_col]).map_batches(
        _chunks, batch_format="pyarrow"
    )


def export_conversations(ds, *, key_col: str = "conv_id",
                         order_col: str = "turn_idx", text_col: str = "text",
                         sep: str = "\n"):
    """Ordered per-conversation reassembly (turns table -> document table):
    one output row per ``key_col`` with the ``text_col`` values joined by
    ``sep`` in ``order_col`` order, plus ``n_turns`` / ``n_bytes`` counters.
    The inverse of the reference's line splitter (BytesLines,
    crates/iterator/src/iterator.rs:115-346) — exporting transcripts back
    out as whole documents for downstream training-data pipelines.

    NULL semantics: a NULL ``text_col`` is treated as the empty string —
    the turn still counts toward ``n_turns`` and contributes a separator
    to ``full_text`` (SQL mirror: ``string_agg(COALESCE(text, '') ...)``
    with ``COUNT(*)``, NOT the NULL-skipping bare ``string_agg``).

    Scalable shape — a global ordered string_agg without per-row OR
    per-group Python: ``sorted_group_apply`` (functions/segments.py) sorts
    once on (key, order), then each block joins its complete interior
    conversations with a single Arrow ``binary_join`` over a ListArray
    built from the group offsets; only the O(2 x n_blocks) edge segments
    take the tiny repair pass.  Replaces the previous fragment-emit +
    fragment-merge groupby — one exchange instead of two (measured
    10.5 s -> ~6 s at sf0.01/8 CPUs, merge overhead was pure exchange
    cost on a 10k-row fragment table)."""
    import numpy as np

    from .segments import sorted_group_apply

    def _join_block(sub: pa.Table, offsets) -> pa.Table:
        n = sub.num_rows
        if n == 0:
            return pa.table({
                key_col: pa.array([], sub.schema.field(key_col).type),
                "full_text": pa.array([], pa.string()),
                "n_turns": pa.array([], pa.int64()),
                "n_bytes": pa.array([], pa.int64()),
            })
        off = np.append(np.asarray(offsets), n).astype(np.int64)
        texts = pc.fill_null(sub.column(text_col), "")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        runs = pa.LargeListArray.from_arrays(pa.array(off, pa.int64()), texts)
        byte_lens = pc.binary_length(texts).to_numpy(zero_copy_only=False)
        csum = np.concatenate([[0], np.cumsum(byte_lens)])
        heads = pa.array(off[:-1], pa.int64())
        return pa.table({
            # the key keeps its ORIGINAL type — casting to string silently
            # rewrote the output schema for non-string conversation keys
            key_col: sub.column(key_col).take(heads),
            "full_text": pc.binary_join(runs, sep),
            "n_turns": pa.array(np.diff(off), pa.int64()),
            "n_bytes": pa.array(csum[off[1:]] - csum[off[:-1]], pa.int64()),
        })

    return sorted_group_apply(
        ds.select_columns([key_col, order_col, text_col]),
        key_cols=[key_col],
        order_cols=[order_col],
        apply_block=_join_block,
    )


def bigram_topk(ds, *, text_col: str = "text", k: int = 100):
    """Corpus-wide BIGRAM frequencies (adjacent whitespace-token pairs
    inside one document), top ``k`` by (count desc, bigram asc) with a
    1-based ``rank`` — the 2-gram analog of :func:`vocab_topk` for
    language-model corpus statistics.

    Vectorized bigram construction: one ``split_whitespace`` per
    batch, adjacency from ``list_parent_indices`` (tokens i, i+1 form a
    bigram iff they share a parent document), the pair join as one
    ``binary_join_element_wise``.  Per-batch value_counts partials mean the
    shuffle moves unique bigrams x tasks, never corpus tokens."""
    import numpy as np

    def _bigram_counts(batch: pa.Table) -> pa.Table:
        toks_list = split_whitespace(pc.drop_null(batch.column(text_col)))
        flat = pc.list_flatten(toks_list)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        parent = pc.list_parent_indices(toks_list).to_numpy(zero_copy_only=False)
        empty = pa.table({"bigram": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        if len(flat) < 2:
            return empty
        adj = np.flatnonzero(parent[1:] == parent[:-1])
        if not len(adj):
            return empty
        left = flat.take(pa.array(adj, pa.int64()))
        right = flat.take(pa.array(adj + 1, pa.int64()))
        ok = pc.and_(pc.not_equal(left, ""), pc.not_equal(right, ""))
        grams = pc.binary_join_element_wise(
            left.filter(ok), right.filter(ok), " "
        )
        vc = grams.value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table({
            "bigram": vc.field("values"),
            "cnt": pc.cast(vc.field("counts"), pa.int64()),
        })

    from .segments import sorted_group_sum

    totals = sorted_group_sum(
        ds.map_batches(_bigram_counts, batch_format="pyarrow"),
        key_cols=["bigram"], sum_cols=["cnt"], out_cols=["cnt"],
    )
    top = totals.sort(["cnt", "bigram"], descending=[True, False]).limit(k)

    def _rank(b: pa.Table) -> pa.Table:
        return b.append_column("rank", pa.array(range(1, b.num_rows + 1), pa.int64()))

    return top.repartition(1).map_batches(_rank, batch_format="pyarrow")


def _word_shingles(batch: pa.Table, *, id_col: str, text_col: str, n: int):
    """Vectorized word n-gram shingles: (doc index, gram string) for every
    window of ``n`` adjacent whitespace tokens within one document.  Built
    flat: valid start positions are token indices i with
    ``parent[i] == parent[i+n-1]``; the gram strings come from n takes +
    one ``binary_join_element_wise`` — no Python over rows or grams."""
    import numpy as np

    toks_list = split_whitespace(pc.fill_null(batch.column(text_col), ""))
    flat = pc.list_flatten(toks_list)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parent = pc.list_parent_indices(toks_list).to_numpy(zero_copy_only=False)
    if len(flat) < n:
        return np.array([], dtype=np.int64), pa.array([], pa.string())
    starts = np.flatnonzero(parent[: len(parent) - n + 1] == parent[n - 1:])
    if not len(starts):
        return np.array([], dtype=np.int64), pa.array([], pa.string())
    parts = [flat.take(pa.array(starts + j, pa.int64())) for j in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    return parent[starts], grams


def ngram_decontaminate(ds, probe_grams, *, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 5):
    """Benchmark decontamination by word n-gram overlap (the standard
    eval-set leak check): flag every document sharing at least one
    ``n``-gram with the probe set.  Emits (id, n_gram_hits) for
    contaminated docs only — ``n_gram_hits`` counts gram OCCURRENCES in the
    doc that appear in the probe set.

    ``probe_grams`` is a plain list of gram strings (from the eval set —
    small: benchmarks are O(10^4) docs) broadcast once via ``ray.put``;
    each task reads the reference, builds one Arrow value_set, and runs a
    single vectorized ``is_in`` per batch.  No shuffle at all — the corpus
    never moves."""
    import numpy as np
    import ray

    probes_ref = ray.put(pa.array(sorted(set(probe_grams)), pa.string()))

    def _scan(batch: pa.Table) -> pa.Table:
        probe_set = ray.get(probes_ref)
        parents, grams = _word_shingles(
            batch, id_col=id_col, text_col=text_col, n=n
        )
        out_empty = pa.table({
            id_col: batch.column(id_col).slice(0, 0),
            "n_gram_hits": pa.array([], pa.int64()),
        })
        if not len(parents):
            return out_empty
        hit = pc.is_in(grams, value_set=probe_set).to_numpy(zero_copy_only=False)
        per_doc = np.bincount(parents[hit], minlength=batch.num_rows).astype(np.int64)
        flagged = np.flatnonzero(per_doc > 0)
        if not len(flagged):
            return out_empty
        idx = pa.array(flagged, pa.int64())
        return pa.table({
            id_col: batch.column(id_col).take(idx),
            "n_gram_hits": pa.array(per_doc[flagged], pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        _scan, batch_format="pyarrow"
    )


def probe_grams_of(ds, *, text_col: str = "text", n: int = 5) -> list[str]:
    """Collect the DISTINCT word n-grams of a (small) probe dataset to the
    driver — the build step for :func:`ngram_decontaminate`'s broadcast
    set.  Bounded by the probe corpus's distinct grams (an eval benchmark,
    not the training corpus); dedup happens distributed (per-batch
    value_counts partial + groupby) so the driver sees unique grams only."""

    def _grams(batch: pa.Table) -> pa.Table:
        _, grams = _word_shingles(batch, id_col=text_col, text_col=text_col, n=n)
        u = grams.unique() if len(grams) else pa.array([], pa.string())
        return pa.table({"gram": u})

    uniq = ds.map_batches(_grams, batch_format="pyarrow").groupby("gram").count()
    return [r["gram"] for r in uniq.take_all()]


def split_assign(ds, *, key_col: str, fracs: dict[str, float],
                 label_col: str = "split"):
    """Deterministic train/val/test split assignment: the md5-u64 hash of
    the key falls into consecutive ranges sized by ``fracs`` (insertion
    order).  No RNG state, stable under repartitioning and resume, and
    SQL-recomputable — the same guarantees as :func:`hash_sample`, as a
    LABELING op instead of a filter.  ``fracs`` must sum to 1.0."""
    import numpy as np

    if abs(sum(fracs.values()) - 1.0) > 1e-9:
        raise ValueError("fracs must sum to 1.0")
    labels = list(fracs)
    edges = np.cumsum([fracs[l] for l in labels])[:-1]  # internal edges only
    bounds = np.array([min(int(e * 2**64), 2**64 - 1) for e in edges],
                      dtype=np.uint64)

    def _assign(batch: pa.Table) -> pa.Table:
        col = batch.column(key_col)
        hs = np.fromiter(
            (md5_u64_str(str(k)) for k in col.to_pylist()),
            dtype=np.uint64, count=batch.num_rows,
        )
        # label i covers bounds[i-1] <= h < bounds[i]; SQL mirror is the
        # CASE WHEN h < b0 ... chain with the same strict comparisons
        idx = np.searchsorted(bounds, hs, side="right")
        lab = np.array(labels, dtype=object)[idx]
        return batch.append_column(label_col, pa.array(list(lab), pa.string()))

    return ds.map_batches(_assign, batch_format="pyarrow")
