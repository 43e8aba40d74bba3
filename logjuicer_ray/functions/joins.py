"""Keyed temporal joins: as-of join.

Engine addition beyond the reference: "enrich each event with the most
recent right-side row at or before it" — the standard as-of join a feature
pipeline needs (latest order / model version / config active at event time).

Distribution shape: tag both sides, union, then the sorted grouped-apply
exchange (``functions/segments.py sorted_group_apply``) — one range sort
instead of ``groupby(key).map_groups`` (Ray's hash-aggregate exchange is
~50× slower than its sort at high key cardinality, and per-key Python
calls don't amortize).  The as-of merge itself becomes a single
``np.maximum.accumulate`` carried-right-index pass over each sorted block
(every key in the block advances together); the range aggregate uses two
structured-dtype ``searchsorted`` probes against the per-segment sorted
right rows.  This is the general big-both-sides plan; when the right side
is small, broadcast it instead (see ``__ray_entry__``'s orders_enriched
for the broadcast-join pattern).  Partitioning assumption: one key's rows
(both sides) fit in a worker — the usual as-of contract.

Determinism: among right rows sharing the max eligible timestamp the one
with the greatest ``right_id`` wins (explicit tie-break; a plain SQL ASOF
JOIN leaves this unspecified).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["asof_join", "range_join_agg", "build_bloom", "bloom_prune"]


def _seg_starts_per_row(offsets: np.ndarray, n: int) -> np.ndarray:
    counts = np.diff(np.append(offsets, n))
    return np.repeat(offsets, counts)


def _seg_ids_per_row(offsets: np.ndarray, n: int) -> np.ndarray:
    counts = np.diff(np.append(offsets, n))
    return np.repeat(np.arange(len(offsets), dtype=np.int64), counts)


def range_join_agg(left_ds, right_ds, *, key: str, right_key: str,
                   left_ts: str, right_ts: str, left_cols: list[str],
                   value_col: str, lo_us: int, hi_us: int):
    """Interval (range) join in aggregate form: for every left row, the
    count and value-sum of right rows with the same key whose ``right_ts``
    falls in ``[left_ts + lo_us, left_ts + hi_us]`` (bounds inclusive).

    Same tagged-union keyed-shuffle shape as :func:`asof_join`, but the
    per-group merge uses prefix sums over the time-sorted right side, so a
    hot key with R right rows and L left rows costs O((L+R) log R) and the
    output stays one row per left row — the pair-explosion variant of a
    range join is a ``flat_map`` away but is rarely what a feature pipeline
    wants at scale."""
    if key not in left_cols or left_ts not in left_cols:
        raise ValueError("left_cols must include key and left_ts")
    l_proj = left_ds.select_columns(sorted(set(left_cols)))
    r_proj = right_ds.select_columns(sorted({right_key, right_ts, value_col}))
    l_schema = l_proj.schema().base_schema
    r_schema = r_proj.schema().base_schema
    left_types = {c: l_schema.field(c).type for c in left_cols if c != key}
    right_side = sorted({right_ts, value_col})
    right_types = {c: r_schema.field(c).type for c in right_side}

    def tag_left(b: pa.Table, _rt=right_types) -> pa.Table:
        out = {key: b.column(key)}
        for c in left_cols:
            if c != key:
                out[c] = b.column(c)
        for c, typ in _rt.items():
            out[c] = pa.nulls(b.num_rows, typ)
        return pa.table(out)

    def tag_right(b: pa.Table, _lt=left_types) -> pa.Table:
        out = {key: b.column(right_key)}
        for c, typ in _lt.items():
            out[c] = pa.nulls(b.num_rows, typ)
        for c in right_side:
            out[c] = b.column(c)
        return pa.table(out)

    def add_order(b: pa.Table, side: str) -> pa.Table:
        ts_src = b.column(right_ts if side == "r" else left_ts)
        b = b.append_column("__sr", pa.array(
            np.full(b.num_rows, 0 if side == "r" else 1, np.int8)))
        return b.append_column("__ts", ts_src.cast(pa.int64()))

    tagged = l_proj.map_batches(tag_left, batch_format="pyarrow").map_batches(
        lambda b: add_order(b, "l"), batch_format="pyarrow"
    ).union(
        r_proj.map_batches(tag_right, batch_format="pyarrow").map_batches(
            lambda b: add_order(b, "r"), batch_format="pyarrow"
        )
    )

    def _range_block(sub: pa.Table, offsets) -> pa.Table:
        n = sub.num_rows
        out_cols = {}
        if n == 0:
            for c in left_cols:
                out_cols[c] = sub.column(c)
            out_cols["n_matches"] = pa.array([], pa.int64())
            out_cols["sum_value"] = pa.array([], pa.float64())
            return pa.table(out_cols)
        offsets = np.asarray(offsets, dtype=np.int64)
        sr = sub.column("__sr").combine_chunks().to_numpy(zero_copy_only=False)
        ts = sub.column("__ts").combine_chunks().to_numpy(zero_copy_only=False)
        seg = _seg_ids_per_row(offsets, n)
        is_right = sr == 0
        # right rows are contiguous per segment and (seg, ts)-sorted under
        # the (key, __sr, __ts) sort — one structured searchsorted bounds
        # every left row's window inside its own segment
        r_sel = np.flatnonzero(is_right)
        comp = np.empty(len(r_sel), dtype=[("s", "<i8"), ("t", "<i8")])
        comp["s"] = seg[r_sel]
        comp["t"] = ts[r_sel]
        rv = sub.column(value_col).take(
            pa.array(r_sel, pa.int64())
        ).cast(pa.float64()).to_numpy(zero_copy_only=False)
        prefix = np.concatenate(([0.0], np.cumsum(rv)))
        l_sel = np.flatnonzero(~is_right)
        q = np.empty(len(l_sel), dtype=comp.dtype)
        q["s"] = seg[l_sel]
        q["t"] = ts[l_sel] + lo_us
        lo = np.searchsorted(comp, q, side="left")
        q["t"] = ts[l_sel] + hi_us
        hi = np.searchsorted(comp, q, side="right")
        l_take = pa.array(l_sel, pa.int64())
        for c in left_cols:
            out_cols[c] = sub.column(c).take(l_take)
        out_cols["n_matches"] = pa.array((hi - lo).astype(np.int64))
        out_cols["sum_value"] = pa.array(prefix[hi] - prefix[lo])
        return pa.table(out_cols)

    from .segments import sorted_group_apply

    return sorted_group_apply(
        tagged, key_cols=[key], order_cols=["__sr", "__ts"],
        apply_block=_range_block,
    )


def asof_join(left_ds, right_ds, *, key: str, right_key: str,
              left_ts: str, right_ts: str, left_cols: list[str],
              right_cols: list[str], right_id: str):
    """For every left row, attach ``right_cols`` from the right row with the
    greatest ``right_ts`` <= ``left_ts`` within the same key (NULLs when no
    right row qualifies).  ``left_cols`` must include ``key`` and
    ``left_ts``; output columns are ``left_cols + right_cols``."""
    if key not in left_cols or left_ts not in left_cols:
        raise ValueError("left_cols must include key and left_ts")
    l_proj = left_ds.select_columns(sorted(set(left_cols)))
    r_proj = right_ds.select_columns(sorted(set(right_cols + [right_key, right_ts])))

    # resolve both sides' types on the driver; the maps are captured by
    # value in the tag closures (module globals would not ship to workers)
    l_schema = l_proj.schema().base_schema
    r_schema = r_proj.schema().base_schema
    left_types = {c: l_schema.field(c).type for c in left_cols if c != key}
    right_side = sorted(set(right_cols + [right_ts]))
    right_types = {c: r_schema.field(c).type for c in right_side}

    def tag_left(b: pa.Table, _rt=right_types) -> pa.Table:
        out = {key: b.column(key)}
        for c in left_cols:
            if c != key:
                out[c] = b.column(c)
        for c, typ in _rt.items():
            out[c] = pa.nulls(b.num_rows, typ)
        return pa.table(out)

    def tag_right(b: pa.Table, _lt=left_types) -> pa.Table:
        out = {key: b.column(right_key)}
        for c, typ in _lt.items():
            out[c] = pa.nulls(b.num_rows, typ)
        for c in right_side:
            out[c] = b.column(c)
        return pa.table(out)

    def add_order(b: pa.Table, side: str) -> pa.Table:
        n = b.num_rows
        # at equal (key, ts): right rows sort BEFORE left rows (inclusive
        # <= semantics) and among right rows the max right_id comes last,
        # so the carried-index pass lands on it (deterministic tie-break)
        b = b.append_column("__sr", pa.array(
            np.full(n, 0 if side == "r" else 1, np.int8)))
        b = b.append_column("__ts", b.column(
            right_ts if side == "r" else left_ts).cast(pa.int64()))
        rid = (b.column(right_id).cast(pa.int64()) if side == "r"
               else pa.array(np.zeros(n, np.int64)))
        return b.append_column("__rid", rid)

    tagged = l_proj.map_batches(tag_left, batch_format="pyarrow").map_batches(
        lambda b: add_order(b, "l"), batch_format="pyarrow"
    ).union(
        r_proj.map_batches(tag_right, batch_format="pyarrow").map_batches(
            lambda b: add_order(b, "r"), batch_format="pyarrow"
        )
    )
    right_cols = list(right_cols)

    def _asof_block(sub: pa.Table, offsets) -> pa.Table:
        n = sub.num_rows
        if n == 0:
            return pa.table(
                {c: sub.column(c) for c in left_cols + right_cols})
        offsets = np.asarray(offsets, dtype=np.int64)
        sr = sub.column("__sr").combine_chunks().to_numpy(zero_copy_only=False)
        is_left = sr == 1
        # carried right-row index: under the (key, ts, side, rid) sort, the
        # latest eligible right row for any left row is simply the nearest
        # preceding right row in the SAME segment — one maximum.accumulate
        carried = np.maximum.accumulate(
            np.where(is_left, -1, np.arange(n, dtype=np.int64)))
        seg_start = _seg_starts_per_row(offsets, n)
        matched = carried >= seg_start
        l_sel = np.flatnonzero(is_left)
        take = carried[l_sel]
        m = matched[l_sel]
        l_take = pa.array(l_sel, pa.int64())
        out_cols = {c: sub.column(c).take(l_take) for c in left_cols}
        take_safe = pa.array(np.where(m, take, 0), pa.int64())
        valid = pa.array(m)
        for c in right_cols:
            col = sub.column(c).take(take_safe)
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            out_cols[c] = pc.if_else(valid, col,
                                     pa.nulls(len(l_sel), col.type))
        return pa.table(out_cols)

    from .segments import sorted_group_apply

    return sorted_group_apply(
        tagged, key_cols=[key], order_cols=["__ts", "__sr", "__rid"],
        apply_block=_asof_block,
    )


def _bloom_hashes(keys, n_bits: int, n_hashes: int):
    """k vectorized SplitMix64 hash positions per key (uint64 numpy in)."""
    import numpy as np

    from .hashing import splitmix64 as _splitmix64_np

    pos = np.empty((n_hashes, len(keys)), dtype=np.uint64)
    for i in range(n_hashes):
        with np.errstate(over="ignore"):
            salted = keys ^ np.uint64(0xA076_1D64_78BD_642F * (i + 1) & (2**64 - 1))
        pos[i] = _splitmix64_np(salted) % np.uint64(n_bits)
    return pos


def build_bloom(ds, key_col: str, *, n_bits: int = 1 << 23, n_hashes: int = 4):
    """Bloom filter of an integer key column as a packed uint8 bitmap.

    Per-block partial bitmaps are OR-merged on the driver — driver traffic
    is O(blocks × n_bits/8), never key rows (n_bits=2^23 → 1 MiB per
    block; at larger key cardinalities raise n_bits and tree-reduce)."""
    import numpy as np
    import pyarrow as pa

    nbytes = n_bits // 8

    def _partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        bm = np.zeros(nbytes, dtype=np.uint8)
        if len(keys):
            pos = _bloom_hashes(keys, n_bits, n_hashes).ravel()
            np.bitwise_or.at(bm, (pos // 8).astype(np.int64),
                             np.left_shift(np.uint8(1), (pos % 8).astype(np.uint8)))
        return pa.table({"bloom": pa.array([bm.tobytes()], pa.binary())})

    out = np.zeros(nbytes, dtype=np.uint8)
    for row in ds.map_batches(_partial, batch_format="pyarrow").take_all():
        out |= np.frombuffer(row["bloom"], dtype=np.uint8)
    return out


def bloom_prune(ds, key_col: str, bloom, *, n_hashes: int = 4):
    """Drop rows whose key is definitely NOT in the bloom (exact rows always
    survive — the filter is a superset, so a downstream exact join stays
    exact while the shuffle moves only candidate rows).  ``bloom`` is
    broadcast once via ``ray.put`` and read zero-copy per task."""
    import numpy as np
    import pyarrow as pa
    import ray

    n_bits = len(bloom) * 8
    bloom_ref = ray.put(bloom)

    def _filter(batch: pa.Table) -> pa.Table:
        bm = ray.get(bloom_ref)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        if not len(keys):
            return batch
        pos = _bloom_hashes(keys, n_bits, n_hashes)
        hit = np.ones(len(keys), dtype=bool)
        for i in range(pos.shape[0]):
            p = pos[i]
            hit &= (bm[(p // 8).astype(np.int64)]
                    & np.left_shift(np.uint8(1), (p % 8).astype(np.uint8))) != 0
        return batch.filter(pa.array(hit))

    return ds.map_batches(_filter, batch_format="pyarrow")
