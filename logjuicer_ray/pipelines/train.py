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

from ..arrow_util import dict_codes, to_np as _to_np
from ..config import PipelineConfig
from ..state.model import GroupIndex, Model
from ..stages.tokenize import tokenize_batch
from ..tokenizer import GL_FILTER
from ..vectorize import SparseIndex, build_index, merge_indexes

__all__ = ["train", "train_model"]


_PREP_COLS = ["group_key", "salt", "dedup_key", "conv_id", "turn_idx", "tokens",
              "n_lines", "n_bytes"]


def _run_starts(*code_arrays: np.ndarray) -> np.ndarray:
    """Start offsets of equal-key runs in pre-sorted code arrays."""
    n = len(code_arrays[0])
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for codes in code_arrays:
        change[1:] |= codes[1:] != codes[:-1]
    return np.flatnonzero(change).astype(np.int64)


def _codes(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    enc = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    enc = enc.dictionary_encode()
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    return enc.indices.to_numpy(zero_copy_only=False)


def _rank_codes(col):
    """(rank_codes, dictionary, raw_codes) where rank codes respect the
    column's STRING sort order (dictionary codes alone are first-occurrence
    ordered).  Ranking costs one argsort of the small dictionary instead of
    a full-table string sort."""
    codes, d = dict_codes(col)
    order = pc.sort_indices(d).to_numpy(zero_copy_only=False)
    ranks = np.empty(len(d), dtype=np.int64)
    ranks[order] = np.arange(len(d))
    return ranks[codes] if len(codes) else codes.astype(np.int64), d, codes


def _prepare_batch(batch: pa.Table, *, salt_buckets: int, ignored) -> pa.Table:
    """In-batch combiner: one row per (group, dedup_key) carrying the
    min-(conv_id, turn_idx) token string and summed line/byte counts, so the
    train shuffle moves unique-ish token strings instead of raw text.

    Vectorized with INTEGER keys end-to-end: dictionary rank codes +
    ``np.lexsort`` + ``np.add.reduceat``; only the winner rows (one per
    unique (group, dedup_key)) are gathered from the Arrow table — the full
    batch is never sorted or copied (the former full-table ``sort_by``
    moved every token/text string and was the train stage's measured
    bandwidth hog)."""
    text = pc.fill_null(batch.column("text"), "")
    keep = pc.not_equal(text, "")
    tbl = pa.table(
        {
            "group_key": batch.column("group_key"),
            "dedup_key": batch.column("dedup_key"),
            "conv_id": batch.column("conv_id"),
            "turn_idx": batch.column("turn_idx"),
            "tokens": batch.column("tokens"),
            "n_bytes": pc.cast(pc.binary_length(text), pa.int64()),
        }
    ).filter(keep)
    ign_tbl = None
    if ignored is not None:
        # ignored lines count but are never indexed (process.rs:71-73);
        # rare path — the mask is computed row-wise with the user regex
        raws = batch.filter(keep).column("text").to_pylist()
        mask = np.fromiter((ignored(r) for r in raws), dtype=bool, count=len(raws))
        if mask.any():
            ign_tbl = tbl.filter(pa.array(mask))
            tbl = tbl.filter(pa.array(~mask))
    n = tbl.num_rows
    gr, _, _ = _rank_codes(tbl.column("group_key"))
    dr, ddict, dcodes = _rank_codes(tbl.column("dedup_key"))
    cr, _, _ = _rank_codes(tbl.column("conv_id"))
    ti = _to_np(tbl.column("turn_idx"))
    if n:
        perm = np.lexsort((ti, cr, dr, gr))
        g_s, d_s = gr[perm], dr[perm]
        change = np.zeros(n, dtype=bool)
        change[0] = True
        change[1:] = (g_s[1:] != g_s[:-1]) | (d_s[1:] != d_s[:-1])
        starts = np.flatnonzero(change)
        run_lines = np.diff(np.append(starts, n))
        run_bytes = np.add.reduceat(_to_np(tbl.column("n_bytes"))[perm], starts)
        winner_idx = perm[starts]
    else:
        starts = winner_idx = np.zeros(0, dtype=np.int64)
        run_lines = run_bytes = np.zeros(0, dtype=np.int64)
    firsts = tbl.take(pa.array(winner_idx, pa.int64()))
    # one crc32 per unique dedup value (dictionary), mapped to winners
    salt_per_val = np.fromiter(
        (crc32(k.encode()) % salt_buckets for k in ddict.to_pylist()),
        dtype=np.int32,
        count=len(ddict),
    )
    salts = salt_per_val[dcodes[winner_idx]] if n else np.zeros(0, dtype=np.int32)
    out = pa.table(
        {
            # winners only → casting dictionary back to plain strings here
            # materializes just the unique rows that enter the shuffle
            "group_key": pc.cast(firsts.column("group_key"), pa.string()),
            "salt": pa.array(salts, pa.int32()),
            "dedup_key": pc.cast(firsts.column("dedup_key"), pa.string()),
            "conv_id": firsts.column("conv_id"),
            "turn_idx": pc.cast(firsts.column("turn_idx"), pa.int32()),
            "tokens": pc.cast(firsts.column("tokens"), pa.string()),
            "n_lines": pa.array(run_lines, pa.int64()),
            "n_bytes": pa.array(run_bytes, pa.int64()),
        }
    )
    if ign_tbl is not None:
        # aggregate ignored counts per group under a reserved key
        g = pa.TableGroupBy(ign_tbl, "group_key").aggregate(
            [("n_bytes", "sum"), ("n_bytes", "count")]
        )
        n_ign = g.num_rows
        ign_rows = pa.table(
            {
                "group_key": g.column("group_key"),
                "salt": pa.array(np.zeros(n_ign), pa.int32()),
                "dedup_key": pa.array(["\x00ignored"] * n_ign, pa.string()),
                "conv_id": pa.nulls(n_ign, pa.string()),
                "turn_idx": pa.nulls(n_ign, pa.int32()),
                "tokens": pa.nulls(n_ign, pa.string()),
                "n_lines": pc.cast(g.column("n_bytes_count"), pa.int64()),
                "n_bytes": pc.cast(g.column("n_bytes_sum"), pa.int64()),
            }
        )
        out = pa.concat_tables([out, ign_rows])
    return out


def _build_partial(group: pa.Table) -> pa.Table:
    """One (group_key, salt) partition → a serialized partial index row."""
    t0 = time.monotonic()
    gk = group.column("group_key")[0].as_py()
    salt = group.column("salt")[0].as_py()
    # stable order: the winner token string per dedup key is min (conv, turn)
    mask = pc.is_valid(group.column("conv_id"))
    counted_lines = int(pc.sum(group.column("n_lines")).as_py() or 0)
    counted_bytes = int(pc.sum(group.column("n_bytes")).as_py() or 0)
    g = group.filter(mask).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending"),
         ("dedup_key", "ascending")]
    )
    # first occurrence of each dedup key in (conv, turn) order — vectorized
    dcodes = _codes(g.column("dedup_key"))
    _, first_pos = np.unique(dcodes, return_index=True)
    first_pos.sort()
    token_lines = g.column("tokens").take(pa.array(first_pos, pa.int64())).to_pylist()
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


def _merge_group(group: pa.Table) -> pa.Table:
    """Tree-reduce step: merge one group's per-salt partial indexes into a
    single index row (Index::mconcat, model.rs:158-217) — the driver then
    sees exactly one row per (role, tool) group instead of salt_buckets of
    them."""
    group = group.sort_by("salt")
    gk = group.column("group_key")[0].as_py()
    mats = [
        SparseIndex.from_arrays(pickle.loads(p.as_py()))
        for p in group.column("payload")
    ]
    merged = merge_indexes(mats)
    buf = io.BytesIO()
    pickle.dump(merged.to_arrays(), buf, protocol=5)
    return pa.table(
        {
            "group_key": pa.array([gk], pa.string()),
            "rows": pa.array([merged.nrows], pa.int64()),
            "line_count": pa.array([int(pc.sum(group.column("line_count")).as_py() or 0)], pa.int64()),
            "byte_count": pa.array([int(pc.sum(group.column("byte_count")).as_py() or 0)], pa.int64()),
            "train_time": pa.array([float(pc.sum(group.column("train_time")).as_py() or 0.0)], pa.float64()),
            "payload": pa.array([buf.getvalue()], pa.binary()),
        }
    )


def train(ds, config: PipelineConfig | None = None, *, metrics=None) -> Model:
    """Train a model from a Dataset of baseline turns (input_hint schema).
    ``metrics`` (a ``metrics.Metrics``) collects one stage row."""
    import time as _time

    _t0 = _time.monotonic()
    config = config or PipelineConfig()
    if config.split_multiline_turns:
        from ..sources.transcripts import explode_lines

        # training is order-free (per-group bag-of-lines): explode only,
        # no renumbering needed
        ds = explode_lines(ds, max_line_bytes=config.max_line_bytes)
    ignored = config.ignored_fn() if config.ignore_patterns else None
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
    if salt_buckets > 1:
        # two-level combine: per-group partial merge runs in tasks, the
        # driver collects one (already merged) row per group — a planted
        # mega-group never ships salt_buckets copies to the driver
        partials = partials.groupby("group_key").map_groups(
            _merge_group, batch_format="pyarrow"
        )
    rows = partials.take_all()
    indexes: dict[str, GroupIndex] = {}
    for row in rows:
        indexes[row["group_key"]] = GroupIndex(
            SparseIndex.from_arrays(pickle.loads(row["payload"])),
            line_count=row["line_count"],
            byte_count=row["byte_count"],
            train_time=row["train_time"],
        )
    if metrics is not None:
        metrics.record(
            "train", "tokenize+dedup+index",
            rows_in=sum(g.line_count for g in indexes.values()),
            rows_out=sum(g.index.nrows for g in indexes.values()),
            wall_s=_time.monotonic() - _t0,
            groups=len(indexes),
        )
    return Model(indexes)


# back-compat alias
train_model = train
