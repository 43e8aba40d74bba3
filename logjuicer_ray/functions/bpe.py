"""Distributed byte-pair-encoding (BPE) subword tokenizer: train + encode.

Sennrich, Haddow & Birch 2016 ("Neural Machine Translation of Rare Words
with Subword Units", public arXiv:1508.07909): start from characters, and
repeatedly merge the most frequent adjacent symbol pair into a new symbol.
Words are whitespace tokens char-split with a word-end marker appended as a
final symbol (``</w>`` by default) so merges never cross word boundaries.

No reference counterpart (engine addition for LLM training-data pipelines).

Ray-Data-first shape — the corpus is touched exactly ONCE:

- :func:`word_frequencies` reduces the corpus to a ``(word, cnt)`` Dataset
  via per-batch ``value_counts`` partials + one groupby sum.  Everything
  after operates on that table, which is orders of magnitude smaller than
  the corpus (the classic BPE trainer's working set).
- :func:`bpe_train` runs the merge loop with the repo's dual-path
  convention (``driver_finish_rows`` analog):

  * vocab rows ≤ ``driver_vocab_rows``: collect the word-frequency table
    and run the exact incremental algorithm driver-side (pair→words inverted
    index, counts updated only for words containing the merged pair) —
    O(vocab) memory, the standard practice since the vocabulary IS the
    model input, not the data.
  * larger vocab: distributed loop — current merges broadcast via
    ``ray.put``, one ``map_batches`` re-segments each unique word (per-worker
    memo) and emits ``(lhs, rhs, cnt)`` pair partials, a small two-key
    groupby sums them, and the driver takes the argmax row.  Identical
    merges (both paths use the same deterministic tie-break: highest count,
    then lexically smallest ``(lhs, rhs)``).

- :func:`bpe_encode` applies a trained merge table to a document column:
  merge ranks broadcast once via ``ray.put``, an actor-pool ``map_batches``
  dictionary-encodes each batch's words and encodes every DISTINCT word
  once through a per-worker memo (words repeat heavily), then maps results
  back through the dictionary indices.

- :func:`initial_pair_counts` (the SQL-oracle surface): the iteration-0
  pair histogram, recomputable in DuckDB with ``substr`` over the
  word-frequency CTE — a hard value oracle for the counting kernel that
  the merge loop is built on.

Tokenization matches the corpus operators (functions/corpus.py): whitespace
split via :func:`~logjuicer_ray.functions.text.split_whitespace`, ``''``
tokens dropped (DuckDB mirror: ``list_filter(regexp_split_to_array(text,
'\\s+'), x -> x <> '')``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .text import split_whitespace

__all__ = [
    "word_frequencies",
    "initial_pair_counts",
    "bpe_train",
    "bpe_encode",
]

END = "</w>"

MERGES_SCHEMA = pa.schema([
    ("rank", pa.int64()),
    ("lhs", pa.string()),
    ("rhs", pa.string()),
    ("pair_count", pa.int64()),
])


def _word_count_partial(batch: pa.Table, text_col: str) -> pa.Table:
    toks = pc.list_flatten(
        split_whitespace(pc.drop_null(batch.column(text_col)))
    )
    toks = toks.filter(pc.not_equal(toks, ""))
    vc = toks.value_counts()
    if isinstance(vc, pa.ChunkedArray):
        vc = vc.combine_chunks()
    return pa.table({
        "word": vc.field("values"),
        "cnt": pc.cast(vc.field("counts"), pa.int64()),
    })


def word_frequencies(ds, *, text_col: str = "text"):
    """Corpus → ``(word, cnt)`` Dataset: per-batch value_counts partials,
    one groupby sum.  The single full-corpus pass of the BPE trainer."""

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table({
            "word": b.column("word"),
            "cnt": b.column("sum(cnt)").cast(pa.int64()),
        })

    return (
        ds.map_batches(lambda b: _word_count_partial(b, text_col),
                       batch_format="pyarrow")
        .groupby("word")
        .sum("cnt")
        .map_batches(_rename, batch_format="pyarrow")
    )


def _symbols(word: str, end_token: str) -> tuple:
    return tuple(word) + (end_token,)


def _pairs_of(symbols: tuple) -> list:
    return [(symbols[i], symbols[i + 1]) for i in range(len(symbols) - 1)]


def _pair_partial(batch: pa.Table, end_token: str,
                  segment=None) -> pa.Table:
    """(lhs, rhs, cnt) partial over a (word, cnt) batch; ``segment``
    optionally re-segments each word under the current merges first."""
    words = batch.column("word").to_pylist()
    cnts = batch.column("cnt").to_pylist()
    acc: dict = {}
    for w, c in zip(words, cnts):
        syms = segment(w) if segment is not None else _symbols(w, end_token)
        for p in _pairs_of(syms):
            acc[p] = acc.get(p, 0) + c
    if not acc:
        return pa.table({"lhs": pa.array([], pa.string()),
                         "rhs": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    lhs, rhs = zip(*acc.keys())
    return pa.table({
        "lhs": pa.array(list(lhs), pa.string()),
        "rhs": pa.array(list(rhs), pa.string()),
        "cnt": pa.array(list(acc.values()), pa.int64()),
    })


def initial_pair_counts(ds, *, text_col: str = "text",
                        end_token: str = END):
    """Iteration-0 adjacent-symbol pair histogram over the corpus:
    ``(lhs, rhs, pair_count)`` where each whitespace word contributes its
    character pairs plus one ``(last_char, end_token)`` pair, weighted by
    the word's corpus frequency.  SQL-recomputable (substr over a
    word-count CTE) — the hard-oracle surface of the BPE kernel."""
    wf = word_frequencies(ds, text_col=text_col)

    def _partial(b: pa.Table) -> pa.Table:
        return _pair_partial(b, end_token)

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table({
            "lhs": b.column("lhs"),
            "rhs": b.column("rhs"),
            "pair_count": b.column("sum(cnt)").cast(pa.int64()),
        })

    return (
        wf.map_batches(_partial, batch_format="pyarrow")
        .groupby(["lhs", "rhs"])
        .sum("cnt")
        .map_batches(_rename, batch_format="pyarrow")
    )


class _MergeApplier:
    """Greedy lowest-rank-first merge application with a per-instance word
    memo (the standard BPE encode loop; each DISTINCT word encoded once)."""

    def __init__(self, merges: list, end_token: str = END,
                 max_memo: int = 500_000):
        # merges: [(lhs, rhs), ...] in rank order
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self.end_token = end_token
        self._memo: dict = {}
        self._max = max_memo

    def __call__(self, word: str) -> tuple:
        out = self._memo.get(word)
        if out is not None:
            return out
        syms = list(_symbols(word, self.end_token))
        ranks = self.ranks
        while len(syms) > 1:
            best_rank, best_i = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            pair = (syms[best_i], syms[best_i + 1])
            merged = pair[0] + pair[1]
            # merge ALL occurrences of the best pair, left to right
            i, new = 0, []
            while i < len(syms):
                if (i < len(syms) - 1
                        and syms[i] == pair[0] and syms[i + 1] == pair[1]):
                    new.append(merged)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            syms = new
        out = tuple(syms)
        if len(self._memo) >= self._max:
            self._memo.clear()
        self._memo[word] = out
        return out


def _train_driver(words: list, cnts: list, num_merges: int,
                  min_count: int, end_token: str) -> list:
    """Exact incremental merge loop over an in-memory vocabulary:
    pair→word-ids inverted index; after each merge only the words that
    contained the pair are re-counted."""
    vocab = [list(_symbols(w, end_token)) for w in words]
    pair_counts: dict = {}
    pair_words: dict = {}
    for wi, syms in enumerate(vocab):
        c = cnts[wi]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(wi)

    merges = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        # deterministic argmax: highest count, then smallest (lhs, rhs)
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        pair, count = best
        if count < min_count:
            break
        merges.append((pair[0], pair[1], count))
        merged = pair[0] + pair[1]
        for wi in list(pair_words.get(pair, ())):
            syms = vocab[wi]
            c = cnts[wi]
            # retract this word's current pair contributions
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                    pair_words.pop(p, None)
            i, new = 0, []
            while i < len(syms):
                if (i < len(syms) - 1
                        and syms[i] == pair[0] and syms[i + 1] == pair[1]):
                    new.append(merged)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            vocab[wi] = new
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
                pair_words.setdefault(p, set()).add(wi)
    return merges


def bpe_train(ds, *, text_col: str = "text", num_merges: int = 50,
              min_count: int = 2, end_token: str = END,
              driver_vocab_rows: int = 2_000_000) -> pa.Table:
    """Train BPE merges over a document Dataset.  Returns a pyarrow Table
    ``(rank, lhs, rhs, pair_count)`` in merge order.

    Dual path on the WORD-FREQUENCY table (never the corpus): exact
    driver loop when the vocabulary fits ``driver_vocab_rows``, else a
    distributed per-merge pass (broadcast merges → pair partials → two-key
    groupby → driver argmax).  Both paths produce identical merges."""
    import ray

    wf = word_frequencies(ds, text_col=text_col)

    def _as_table(merges: list) -> pa.Table:
        return pa.table({
            "rank": pa.array(range(len(merges)), pa.int64()),
            "lhs": pa.array([m[0] for m in merges], pa.string()),
            "rhs": pa.array([m[1] for m in merges], pa.string()),
            "pair_count": pa.array([m[2] for m in merges], pa.int64()),
        })

    n_vocab = wf.count()
    if n_vocab <= driver_vocab_rows:
        rows = wf.take_all()
        # sort for a deterministic inverted index (groupby output order
        # is partitioning-dependent; the algorithm itself is order-free,
        # sorting just makes debugging reproducible)
        rows.sort(key=lambda r: r["word"])
        words = [r["word"] for r in rows]
        cnts = [r["cnt"] for r in rows]
        return _as_table(_train_driver(words, cnts, num_merges,
                                       min_count, end_token))

    wf = wf.materialize()  # scanned once per merge; vocab-sized, not corpus
    merges: list = []
    for _ in range(num_merges):
        merges_ref = ray.put([(m[0], m[1]) for m in merges])

        class PairCounter:
            def __init__(self):
                self.applier = _MergeApplier(ray.get(merges_ref), end_token)

            def __call__(self, b: pa.Table) -> pa.Table:
                return _pair_partial(b, end_token, segment=self.applier)

        counts = (
            wf.map_batches(PairCounter, batch_format="pyarrow",
                           concurrency=(1, 8))
            .groupby(["lhs", "rhs"])
            .sum("cnt")
        )
        top = counts.sort(
            ["sum(cnt)", "lhs", "rhs"], descending=[True, False, False]
        ).limit(1).take_all()
        if not top or top[0]["sum(cnt)"] < min_count:
            break
        merges.append((top[0]["lhs"], top[0]["rhs"], top[0]["sum(cnt)"]))
    return _as_table(merges)


def bpe_encode(ds, merges: pa.Table, *, id_col: str = "doc_id",
               text_col: str = "text", end_token: str = END):
    """Encode each document under a trained merge table: returns
    ``(id, n_bpe_tokens, bpe_text)`` where ``bpe_text`` joins the
    document's subword symbols with single spaces (word-end markers
    included).  Merges broadcast once; every DISTINCT word in a batch is
    encoded once through the per-worker memo."""
    import numpy as np
    import ray

    pairs = list(zip(merges.column("lhs").to_pylist(),
                     merges.column("rhs").to_pylist()))
    merges_ref = ray.put(pairs)

    class Encoder:
        def __init__(self):
            self.applier = _MergeApplier(ray.get(merges_ref), end_token)

        def __call__(self, batch: pa.Table) -> pa.Table:
            lists = split_whitespace(pc.fill_null(batch.column(text_col), ""))
            toks = pc.list_flatten(lists)
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            par = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
            mask = pc.not_equal(toks, "")
            mask_np = mask.to_numpy(zero_copy_only=False)
            toks = toks.filter(mask)
            par = par[mask_np]
            # encode each DISTINCT word once, map back via dict indices
            enc = toks.dictionary_encode()
            idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            uniq = enc.dictionary.to_pylist()
            enc_words = [" ".join(self.applier(w)) for w in uniq]
            n_syms = np.array([len(self.applier(w)) for w in uniq],
                              dtype=np.int64)
            n_rows = batch.num_rows
            n_tok = np.zeros(n_rows, dtype=np.int64)
            if len(idx):
                np.add.at(n_tok, par, n_syms[idx])
            texts = [[] for _ in range(n_rows)]
            for p, i in zip(par, idx):
                texts[p].append(enc_words[i])
            return pa.table({
                id_col: batch.column(id_col),
                "n_bpe_tokens": pa.array(n_tok, pa.int64()),
                "bpe_text": pa.array([" ".join(t) for t in texts],
                                     pa.string()),
            })

    return ds.map_batches(Encoder, batch_format="pyarrow",
                          concurrency=(1, 8))
