"""Training pipeline: baseline turns → per-(role,tool) feature indexes.

Distributed restatement of ``Model::train`` (model.rs:475-540): the reference
rayon-iterates over IndexName groups, each group sequentially tokenizing,
deduping (KnownLines) and building one CSR index.  Here:

1. ``map_batches(tokenize)`` — stateless, Arrow in/out;
2. ``map_batches(prepare)`` — project to (group_key, salt, dedup_key,
   tokens, conv_id, turn_idx, n_lines, n_bytes) with an in-batch pre-dedup
   (combiner): duplicate (group, dedup_key) rows inside a batch collapse to
   the min-(conv_id, turn_idx) row, summing line/byte counts, so the shuffle
   moves unique-ish token strings instead of raw text;
3. ``groupby(group_key, salt).map_groups(build_partial)`` — the one wide
   shuffle; ``salt = hash(dedup_key) % n`` splits hot groups into bounded
   partial builds *without* breaking exact dedup (equal keys share a salt);
4. driver-side merge of the tiny per-(group, salt) partial indexes with the
   nub-vstack combiner (Index::mappend, model.rs:118-156).

Determinism: the indexed token string for a dedup key is the one from the
min (conv_id, turn_idx) row (the reference keeps first-in-file-order, which
is equivalent for a single ordered source and deterministic here across any
cluster size); index rows are ordered by (conv_id, turn_idx).
"""

from __future__ import annotations

import io
import pickle
import time
from zlib import crc32

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig
from ..state.model import GroupIndex, Model
from ..stages.tokenize import tokenize_batch
from ..tokenizer import GL_FILTER
from ..vectorize import SparseIndex, build_index, merge_indexes

__all__ = ["train", "train_model"]


def _prepare_batch(batch: pa.Table, *, salt_buckets: int, ignored) -> pa.Table:
    conv = batch.column("conv_id").to_pylist()
    turn = batch.column("turn_idx").to_pylist()
    text = batch.column("text").to_pylist()
    tokens = batch.column("tokens").to_pylist()
    dkeys = batch.column("dedup_key").to_pylist()
    gkeys = batch.column("group_key").to_pylist()
    # in-batch combiner: one row per (group, dedup_key)
    agg: dict[tuple[str, str], list] = {}
    for i in range(len(conv)):
        raw = text[i]
        if not raw:
            continue
        gd = (gkeys[i], dkeys[i])
        cur = agg.get(gd)
        n_bytes = len(raw.encode("utf-8", "surrogatepass"))
        if ignored(raw):
            # ignored lines count but are never indexed (process.rs:71-73);
            # track counts under a reserved key
            gd = (gkeys[i], "\x00ignored")
            cur = agg.get(gd)
            if cur is None:
                agg[gd] = [None, None, None, 1, n_bytes]
            else:
                cur[3] += 1
                cur[4] += n_bytes
            continue
        if cur is None:
            agg[gd] = [conv[i], turn[i], tokens[i], 1, n_bytes]
        else:
            cur[3] += 1
            cur[4] += n_bytes
            if (conv[i], turn[i]) < (cur[0], cur[1]):
                cur[0], cur[1], cur[2] = conv[i], turn[i], tokens[i]
    out = {
        "group_key": [],
        "salt": [],
        "dedup_key": [],
        "conv_id": [],
        "turn_idx": [],
        "tokens": [],
        "n_lines": [],
        "n_bytes": [],
    }
    for (gk, dk), (c, t, tok, nl, nb) in agg.items():
        out["group_key"].append(gk)
        out["salt"].append(crc32(dk.encode()) % salt_buckets)
        out["dedup_key"].append(dk)
        out["conv_id"].append(c)
        out["turn_idx"].append(t)
        out["tokens"].append(tok)
        out["n_lines"].append(nl)
        out["n_bytes"].append(nb)
    return pa.table(
        {
            "group_key": pa.array(out["group_key"], pa.string()),
            "salt": pa.array(out["salt"], pa.int32()),
            "dedup_key": pa.array(out["dedup_key"], pa.string()),
            "conv_id": pa.array(out["conv_id"], pa.string()),
            "turn_idx": pa.array(out["turn_idx"], pa.int32()),
            "tokens": pa.array(out["tokens"], pa.string()),
            "n_lines": pa.array(out["n_lines"], pa.int64()),
            "n_bytes": pa.array(out["n_bytes"], pa.int64()),
        }
    )


def _build_partial(group: pa.Table) -> pa.Table:
    """One (group_key, salt) partition → a serialized partial index row."""
    t0 = time.monotonic()
    gk = group.column("group_key")[0].as_py()
    salt = group.column("salt")[0].as_py()
    # stable order: the winner token string per dedup key is min (conv, turn)
    mask = pc.is_valid(group.column("conv_id"))
    counted_lines = int(pc.sum(group.column("n_lines")).as_py() or 0)
    counted_bytes = int(pc.sum(group.column("n_bytes")).as_py() or 0)
    g = group.filter(mask)
    convs = g.column("conv_id").to_pylist()
    turns = g.column("turn_idx").to_pylist()
    dkeys = g.column("dedup_key").to_pylist()
    toks = g.column("tokens").to_pylist()
    order = sorted(range(g.num_rows), key=lambda i: (convs[i], turns[i], dkeys[i]))
    seen: set[str] = set()
    token_lines: list[str] = []
    for i in order:
        if dkeys[i] not in seen:
            seen.add(dkeys[i])
            token_lines.append(toks[i])
    index = build_index(token_lines)
    buf = io.BytesIO()
    pickle.dump(index.to_arrays(), buf, protocol=5)
    return pa.table(
        {
            "group_key": pa.array([gk], pa.string()),
            "salt": pa.array([salt], pa.int32()),
            "rows": pa.array([index.nrows], pa.int64()),
            "line_count": pa.array([counted_lines], pa.int64()),
            "byte_count": pa.array([counted_bytes], pa.int64()),
            "train_time": pa.array([time.monotonic() - t0], pa.float64()),
            "payload": pa.array([buf.getvalue()], pa.binary()),
        }
    )


def train(ds, config: PipelineConfig | None = None) -> Model:
    """Train a model from a Dataset of baseline turns (input_hint schema)."""
    config = config or PipelineConfig()
    ignored = config.ignored_fn()
    salt_buckets = max(1, config.train_salt_buckets)
    tokenized = ds.map_batches(
        tokenize_batch,
        batch_format="pyarrow",
        batch_size=config.tokenize_batch_size,
        fn_kwargs={"max_line_bytes": config.max_line_bytes},
    )
    prepared = tokenized.map_batches(
        _prepare_batch,
        batch_format="pyarrow",
        fn_kwargs={"salt_buckets": salt_buckets, "ignored": ignored},
    )
    partials = prepared.groupby(["group_key", "salt"]).map_groups(
        _build_partial, batch_format="pyarrow"
    )
    # one row per (group, salt): tiny — safe to collect on the driver
    rows = partials.take_all()
    per_group: dict[str, list] = {}
    for row in rows:
        per_group.setdefault(row["group_key"], []).append(row)
    indexes: dict[str, GroupIndex] = {}
    for gk, grouprows in per_group.items():
        grouprows.sort(key=lambda r: r["salt"])
        mats = [
            SparseIndex.from_arrays(pickle.loads(r["payload"])) for r in grouprows
        ]
        indexes[gk] = GroupIndex(
            merge_indexes(mats),
            line_count=sum(r["line_count"] for r in grouprows),
            byte_count=sum(r["byte_count"] for r in grouprows),
            train_time=sum(r["train_time"] for r in grouprows),
        )
    return Model(indexes)


# back-compat alias
train_model = train
