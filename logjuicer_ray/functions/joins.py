"""Keyed temporal joins: as-of join.

Engine addition beyond the reference: "enrich each event with the most
recent right-side row at or before it" — the standard as-of join a feature
pipeline needs (latest order / model version / config active at event time).

Distribution shape: tag both sides, union, ONE keyed shuffle
(``groupby(key)``), then a vectorized per-group merge (sort both sides,
``np.searchsorted``).  This is the general big-both-sides plan; when the
right side is small, broadcast it instead (see ``__ray_entry__``'s
orders_enriched for the broadcast-join pattern).  Partitioning assumption:
one key's rows (both sides) fit in a worker — the usual as-of contract.

Determinism: among right rows sharing the max eligible timestamp the one
with the greatest ``right_id`` wins (explicit tie-break; a plain SQL ASOF
JOIN leaves this unspecified).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["asof_join", "range_join_agg", "build_bloom", "bloom_prune"]


def _asof_group(group: pa.Table, *, left_ts: str, right_ts: str,
                left_cols: list[str], right_cols: list[str], right_id: str) -> pa.Table:
    side = group.column("__side")
    side = side.combine_chunks() if isinstance(side, pa.ChunkedArray) else side
    is_left = pc.equal(side, "l")
    left = group.filter(is_left)
    right = group.filter(pc.invert(is_left))
    out_cols = {c: left.column(c) for c in left_cols}
    if right.num_rows == 0:
        for c in right_cols:
            out_cols[c] = pa.nulls(left.num_rows, group.schema.field(c).type)
        return pa.table(out_cols)
    lt = left.column(left_ts).cast(pa.int64()).to_numpy(zero_copy_only=False)
    rt = right.column(right_ts).cast(pa.int64()).to_numpy(zero_copy_only=False)
    rid = right.column(right_id).to_numpy(zero_copy_only=False)
    order = np.lexsort((rid, rt))
    rt_s = rt[order]
    # latest right row with right_ts <= left_ts; ties on right_ts resolve to
    # the max right_id because the sort puts it last
    pos = np.searchsorted(rt_s, lt, side="right") - 1
    matched = pos >= 0
    take = np.where(matched, order[np.clip(pos, 0, None)], 0)
    take_arr = pa.array(take, pa.int64())
    valid = pa.array(matched)
    for c in right_cols:
        col = right.column(c).take(take_arr)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        out_cols[c] = pc.if_else(valid, col, pa.nulls(left.num_rows, col.type))
    return pa.table(out_cols)


def _range_agg_group(group: pa.Table, *, left_ts: str, right_ts: str,
                     left_cols: list[str], value_col: str,
                     lo_us: int, hi_us: int) -> pa.Table:
    side = group.column("__side")
    side = side.combine_chunks() if isinstance(side, pa.ChunkedArray) else side
    is_left = pc.equal(side, "l")
    left = group.filter(is_left)
    right = group.filter(pc.invert(is_left))
    out_cols = {c: left.column(c) for c in left_cols}
    n = left.num_rows
    if right.num_rows == 0:
        out_cols["n_matches"] = pa.array(np.zeros(n, np.int64))
        out_cols["sum_value"] = pa.array(np.zeros(n, np.float64))
        return pa.table(out_cols)
    lt = left.column(left_ts).cast(pa.int64()).to_numpy(zero_copy_only=False)
    rt = right.column(right_ts).cast(pa.int64()).to_numpy(zero_copy_only=False)
    rv = right.column(value_col).cast(pa.float64()).to_numpy(zero_copy_only=False)
    order = np.argsort(rt, kind="stable")
    rt_s = rt[order]
    # prefix sums turn the per-row window aggregate into two searchsorted
    # lookups — no pair materialization, O((L+R) log R) per key
    prefix = np.concatenate(([0.0], np.cumsum(rv[order])))
    lo = np.searchsorted(rt_s, lt + lo_us, side="left")
    hi = np.searchsorted(rt_s, lt + hi_us, side="right")
    out_cols["n_matches"] = pa.array((hi - lo).astype(np.int64))
    out_cols["sum_value"] = pa.array(prefix[hi] - prefix[lo])
    return pa.table(out_cols)


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
        out = {key: b.column(key), "__side": pa.array(["l"] * b.num_rows)}
        for c in left_cols:
            if c != key:
                out[c] = b.column(c)
        for c, typ in _rt.items():
            out[c] = pa.nulls(b.num_rows, typ)
        return pa.table(out)

    def tag_right(b: pa.Table, _lt=left_types) -> pa.Table:
        out = {key: b.column(right_key), "__side": pa.array(["r"] * b.num_rows)}
        for c, typ in _lt.items():
            out[c] = pa.nulls(b.num_rows, typ)
        for c in right_side:
            out[c] = b.column(c)
        return pa.table(out)

    tagged = l_proj.map_batches(tag_left, batch_format="pyarrow").union(
        r_proj.map_batches(tag_right, batch_format="pyarrow")
    )
    return tagged.groupby(key).map_groups(
        lambda g: _range_agg_group(
            g, left_ts=left_ts, right_ts=right_ts, left_cols=left_cols,
            value_col=value_col, lo_us=lo_us, hi_us=hi_us,
        ),
        batch_format="pyarrow",
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
        out = {key: b.column(key), "__side": pa.array(["l"] * b.num_rows)}
        for c in left_cols:
            if c != key:
                out[c] = b.column(c)
        for c, typ in _rt.items():
            out[c] = pa.nulls(b.num_rows, typ)
        return pa.table(out)

    def tag_right(b: pa.Table, _lt=left_types) -> pa.Table:
        out = {key: b.column(right_key), "__side": pa.array(["r"] * b.num_rows)}
        for c, typ in _lt.items():
            out[c] = pa.nulls(b.num_rows, typ)
        for c in right_side:
            out[c] = b.column(c)
        return pa.table(out)

    tagged = l_proj.map_batches(tag_left, batch_format="pyarrow").union(
        r_proj.map_batches(tag_right, batch_format="pyarrow")
    )
    return tagged.groupby(key).map_groups(
        lambda g: _asof_group(
            g, left_ts=left_ts, right_ts=right_ts,
            left_cols=left_cols, right_cols=list(right_cols), right_id=right_id,
        ),
        batch_format="pyarrow",
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
