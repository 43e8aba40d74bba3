"""Distributed multinomial Naive Bayes text classifier.

The fastText-style linear classifier of web-corpus curation recipes
(CCNet / RefinedWeb use one for language and quality gating); the
reference engine has no counterpart file — this is part of the
LLM-training-data operator surface this repo adds on top of it.

Shape (Ray-Data-first, scale notes inline):

* **Training is ONE keyed shuffle.**  Each input batch is tokenized with
  the shared whitespace splitter (``functions/text.split_whitespace`` —
  exact DuckDB ``regexp_split_to_array('\\s+')`` parity) and combined
  in-batch to partial ``(label, token) -> count`` rows via Arrow hash
  aggregation, so the shuffle moves unique-pairs-per-block, not tokens.
  A per-document marker row (``_DOC_MARKER``, a token no whitespace
  split can produce) rides the same shuffle so class priors need no
  second pass over the input.
* **Model finalization is driver-side over the REDUCED counts** —
  O(vocab × labels) rows, never O(corpus).  ``driver_vocab_rows``
  bounds it; beyond the bound training raises rather than silently
  materializing (at 100 TB a curation classifier vocabulary is hash- or
  frequency-capped upstream; ``min_count`` provides the cap here).
* **Scoring is broadcast + vectorized.**  The weight matrix is put in
  the object store ONCE (``ray.put``) and read zero-copy by every task;
  per batch the flattened token column is dictionary-encoded so the
  Python dict lookup runs once per UNIQUE token, then scores are a
  single fancy-indexed gather + ``np.add.reduceat`` segment sum.  No
  per-row Python in the hot path.

All scores are e6 integers (weights are e6-rounded log-probs persisted
with the model), so engine and SQL oracle sums are exact — the oracle
reads the engine-persisted weight table and re-derives every prediction
with integer arithmetic only (the same persisted-rows pattern as
``similarity_report``).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

__all__ = [
    "train_naive_bayes",
    "score_naive_bayes",
    "save_nb_model",
]

# Marker token that rides the (label, token) count shuffle to carry
# per-label document counts.  Contains a NUL byte: unproducible by any
# whitespace split of valid text, so it cannot collide with a real token.
_DOC_MARKER = "\x00doc"

# Driver materialization bound for the reduced (label, token) count table.
DRIVER_VOCAB_ROWS = 5_000_000


def _e6(x: float) -> int:
    """Half-up e6 rounding, shared convention with functions/stats.py."""
    return int(math.floor(x * 1e6 + 0.5))


def _count_batch(batch: pa.Table, *, text_col: str, label_col: str) -> pa.Table:
    """Partial (label, token, cnt) counts for one batch, in-batch combined.

    Emits one ``_DOC_MARKER`` row per (label) carrying the batch's doc
    count, so priors come out of the same reduced table.
    """
    import pyarrow.compute as pc

    from logjuicer_ray.functions.text import split_whitespace

    texts = pc.fill_null(batch.column(text_col), "")
    labels = batch.column(label_col)
    toks = split_whitespace(texts)
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    lab_np = np.asarray(labels.to_pandas(), dtype=object)
    flat_labels = pa.array(np.repeat(lab_np, lens))
    pairs = pa.table({"label": flat_labels, "token": flat})
    # drop the '' tokens produced by empty / whitespace-only strings
    pairs = pairs.filter(pc.not_equal(pairs.column("token"), ""))
    agg = pairs.group_by(["label", "token"]).aggregate([([], "count_all")])
    agg = agg.rename_columns(["label", "token", "cnt"])
    # per-label doc-count marker rows
    doc = (
        pa.table({"label": labels})
        .group_by(["label"])
        .aggregate([([], "count_all")])
        .rename_columns(["label", "cnt"])
    )
    doc = pa.table(
        {
            "label": doc.column("label"),
            "token": pa.array([_DOC_MARKER] * len(doc), pa.string()),
            "cnt": doc.column("cnt"),
        }
    )
    out = pa.concat_tables(
        [agg.select(["label", "token", "cnt"]), doc]
    )
    return pa.table(
        {
            "label": pc.cast(out.column("label"), pa.string()),
            "token": out.column("token"),
            "cnt": pc.cast(out.column("cnt"), pa.int64()),
        }
    )


def train_naive_bayes(
    ds,
    *,
    text_col: str = "text",
    label_col: str = "lang",
    min_count: int = 1,
    driver_vocab_rows: int = DRIVER_VOCAB_ROWS,
) -> dict:
    """Train a multinomial NB classifier; returns e6-integer weight tables.

    Returns ``{"weights": pa.Table(label, token, w_e6),
    "labels": pa.Table(label, prior_e6, default_e6, n_docs, total_tokens)}``
    with Laplace (+1) smoothing over the global vocabulary::

        w(l, t)    = log((cnt(l, t) + 1) / (total_tokens(l) + V))
        default(l) = log(1 / (total_tokens(l) + V))      # unseen token
        prior(l)   = log(n_docs(l) / n_docs)

    ``min_count`` drops tokens whose GLOBAL count (all labels) is below
    the threshold — the standard vocabulary cap that keeps V (and the
    broadcast matrix) bounded at corpus scale.  Dropped tokens score as
    unseen on both the engine and the SQL-oracle side (they are absent
    from the persisted weight table).
    """
    from ray.data.aggregate import Sum

    counts = ds.map_batches(
        _count_batch,
        batch_format="pyarrow",
        fn_kwargs={"text_col": text_col, "label_col": label_col},
    ).groupby(["label", "token"]).aggregate(Sum("cnt", alias_name="cnt"))

    n_rows = counts.count()
    if n_rows > driver_vocab_rows:
        raise ValueError(
            f"reduced vocab table has {n_rows} rows > driver bound "
            f"{driver_vocab_rows}; raise min_count (vocabulary cap) "
            "to keep the broadcast model bounded"
        )
    tbl = _dataset_to_table(counts)

    lab = tbl.column("label").to_pylist()
    tok = tbl.column("token").to_pylist()
    cnt = tbl.column("cnt").to_numpy(zero_copy_only=False)

    labels = sorted({l for l in lab})
    lab_idx = {l: i for i, l in enumerate(labels)}
    n_labels = len(labels)

    # split marker rows (doc counts) from token rows
    is_doc = np.array([t == _DOC_MARKER for t in tok], dtype=bool)
    n_docs = np.zeros(n_labels, dtype=np.int64)
    for l, c in zip(np.asarray(lab, dtype=object)[is_doc],
                    cnt[is_doc]):
        n_docs[lab_idx[l]] += int(c)

    t_lab = np.asarray(lab, dtype=object)[~is_doc]
    t_tok = np.asarray(tok, dtype=object)[~is_doc]
    t_cnt = cnt[~is_doc]

    # global min_count vocabulary cap
    if min_count > 1 and len(t_tok):
        import pandas as pd

        glob = pd.Series(t_cnt).groupby(pd.Series(t_tok)).transform("sum")
        keep = glob.to_numpy() >= min_count
        t_lab, t_tok, t_cnt = t_lab[keep], t_tok[keep], t_cnt[keep]

    vocab = sorted(set(t_tok.tolist()))
    V = len(vocab)
    total = np.zeros(n_labels, dtype=np.int64)
    li = np.array([lab_idx[l] for l in t_lab], dtype=np.int64)
    np.add.at(total, li, t_cnt)

    w_e6 = np.array(
        [
            _e6(math.log((int(c) + 1) / (int(total[i]) + V)))
            for i, c in zip(li, t_cnt)
        ],
        dtype=np.int64,
    )
    order = np.lexsort((np.asarray(t_tok, dtype=object),
                        np.asarray(t_lab, dtype=object)))
    weights = pa.table(
        {
            "label": pa.array(np.asarray(t_lab, dtype=object)[order].tolist(),
                              pa.string()),
            "token": pa.array(np.asarray(t_tok, dtype=object)[order].tolist(),
                              pa.string()),
            "w_e6": pa.array(w_e6[order], pa.int64()),
        }
    )
    total_docs = int(n_docs.sum())
    labels_tbl = pa.table(
        {
            "label": pa.array(labels, pa.string()),
            "prior_e6": pa.array(
                [
                    _e6(math.log(int(n_docs[i]) / total_docs))
                    for i in range(n_labels)
                ],
                pa.int64(),
            ),
            "default_e6": pa.array(
                [
                    _e6(math.log(1.0 / (int(total[i]) + V)))
                    for i in range(n_labels)
                ],
                pa.int64(),
            ),
            "n_docs": pa.array(n_docs, pa.int64()),
            "total_tokens": pa.array(total, pa.int64()),
        }
    )
    return {"weights": weights, "labels": labels_tbl}


def _dataset_to_table(ds) -> pa.Table:
    import ray

    refs = ds.to_arrow_refs()
    tables = [t for t in ray.get(refs) if t.num_rows]
    if not tables:
        return pa.table({"label": pa.array([], pa.string()),
                         "token": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    return pa.concat_tables(tables, promote_options="default")


def save_nb_model(model: dict, out_dir: str) -> dict[str, str]:
    """Atomically persist the weight + label tables as single-part parquet
    dirs (the oracle reads them back with ``read_parquet('<dir>/*.parquet')``).
    Returns ``{"weights": path, "labels": path}``."""
    import os
    import shutil

    import pyarrow.parquet as pq

    paths = {}
    for name, tbl in (("nb_weights", model["weights"]),
                      ("nb_labels", model["labels"])):
        d = os.path.join(out_dir, f"{name}.parquet")
        tmp = d + f".tmp{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(tbl, os.path.join(tmp, "part-00000.parquet"))
        if os.path.exists(d):
            shutil.rmtree(d)
        os.replace(tmp, d)
        paths[name.replace("nb_", "")] = d
    return paths


class _NBScorer:
    """Decoded scorer state: built ONCE per worker process from the
    broadcast object-store refs (see ``_scorer_cache``); per batch the
    token column is dictionary-encoded so hash lookups run per unique
    token, scores are a gather + reduceat."""

    def __init__(self, w: pa.Table, lab: pa.Table, text_col: str, id_col: str):
        self.text_col = text_col
        self.id_col = id_col
        self.labels = lab.column("label").to_pylist()
        self.n_labels = len(self.labels)
        self.prior = lab.column("prior_e6").to_numpy(zero_copy_only=False)
        default = lab.column("default_e6").to_numpy(zero_copy_only=False)
        toks = w.column("token").to_pylist()
        vocab = sorted(set(toks))
        self.vocab = {t: i for i, t in enumerate(vocab)}
        V = len(vocab)
        # rows 0..V-1 seen tokens (unseen (label,token) combos get the
        # label default); row V = fully-unseen token; row V+1 = zeros
        # (the '' produced by empty strings contributes nothing)
        self.W = np.tile(default, (V + 2, 1)).astype(np.int64)
        self.W[V + 1, :] = 0
        lab_idx = {l: i for i, l in enumerate(self.labels)}
        rows = np.array([self.vocab[t] for t in toks], dtype=np.int64)
        cols = np.array(
            [lab_idx[l] for l in w.column("label").to_pylist()],
            dtype=np.int64,
        )
        self.W[rows, cols] = w.column("w_e6").to_numpy(zero_copy_only=False)
        self.V = V

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from logjuicer_ray.functions.text import split_whitespace

        texts = pc.fill_null(batch.column(self.text_col), "")
        toks = split_whitespace(texts)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        enc = pc.dictionary_encode(flat)
        dict_vals = enc.combine_chunks().dictionary.to_pylist()
        idx = enc.combine_chunks().indices.to_numpy(zero_copy_only=False)
        # dict lookup once per UNIQUE token in the batch
        uniq_rows = np.array(
            [
                self.V + 1 if t == "" else self.vocab.get(t, self.V)
                for t in dict_vals
            ],
            dtype=np.int64,
        )
        rows = uniq_rows[idx] if len(idx) else np.zeros(0, dtype=np.int64)
        S = self.W[rows]  # (n_flat, n_labels)
        offsets = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
        # split_whitespace yields [''] for empty strings, so every list has
        # length >= 1 and reduceat boundaries are strictly valid
        sums = (
            np.add.reduceat(S, offsets, axis=0)
            if len(S)
            else np.zeros((0, self.n_labels), dtype=np.int64)
        )
        scores = sums + self.prior[None, :]
        # first max = smallest label (labels sorted ascending)
        pred = np.argmax(scores, axis=1) if len(scores) else np.zeros(0, int)
        best = scores[np.arange(len(scores)), pred] if len(scores) else []
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "pred_label": pa.array(
                    [self.labels[p] for p in pred], pa.string()
                ),
                "score_e6": pa.array(np.asarray(best, dtype=np.int64),
                                     pa.int64()),
            }
        )


# worker-process-level decoded-scorer cache (the score_batch pattern of
# stages/score.py): the weight tables are plasma-local after the first
# fetch; caching also skips re-building the dense matrix per batch
_SCORER_CACHE: dict[str, _NBScorer] = {}


def _score_nb_batch(batch: pa.Table, *, w_ref, l_ref, text_col, id_col) -> pa.Table:
    import ray

    key = w_ref.hex() + l_ref.hex() + text_col + id_col
    scorer = _SCORER_CACHE.get(key)
    if scorer is None:
        scorer = _NBScorer(ray.get(w_ref), ray.get(l_ref), text_col, id_col)
        _SCORER_CACHE.clear()
        _SCORER_CACHE[key] = scorer
    return scorer(batch)


def score_naive_bayes(
    ds,
    model: dict,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Score a dataset with a trained NB model → (id, pred_label, score_e6).

    The model rides the object store once (``ray.put``); each worker
    process decodes it on first use and caches the dense matrix — never
    per batch, and no actor-pool spawn (warm task workers are reused,
    the stages/score.py stateless pattern).
    """
    import ray

    w_ref = ray.put(model["weights"])
    l_ref = ray.put(model["labels"])
    return ds.map_batches(
        _score_nb_batch,
        batch_format="pyarrow",
        fn_kwargs=dict(w_ref=w_ref, l_ref=l_ref,
                       text_col=text_col, id_col=id_col),
    )
