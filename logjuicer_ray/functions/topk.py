"""Grouped top-k with a map-side combiner.

The scale-relevant shape: each ``map_batches`` task first reduces its batch
to at most k rows per group (vectorized lexsort + segmented rank), so the
keyed shuffle moves O(groups × k × tasks) rows instead of the whole
dataset; a final per-group pass re-ranks the survivors.  Deterministic
under any partitioning: ties break by the caller's ``tie_cols`` (ascending).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..arrow_util import dict_codes, to_np

__all__ = ["topk_per_group"]


def _sort_key(col, descending: bool) -> np.ndarray:
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_string(a.type) or pa.types.is_dictionary(a.type):
        import pyarrow.compute as pc

        codes, d = dict_codes(col)
        order = pc.sort_indices(d).to_numpy(zero_copy_only=False)
        ranks = np.empty(len(d), dtype=np.int64)
        ranks[order] = np.arange(len(d))
        key = ranks[codes] if len(codes) else codes.astype(np.int64)
    else:
        key = a.to_numpy(zero_copy_only=False)
    return -key if descending else key


def _topk_table(batch: pa.Table, *, group_cols, order_col, k, tie_cols,
                descending, with_rank) -> pa.Table:
    n = batch.num_rows
    if n == 0:
        return batch.append_column("rank", pa.array([], pa.int64())) if with_rank else batch
    gkeys = [_sort_key(batch.column(c), False) for c in group_cols]
    okey = _sort_key(batch.column(order_col), descending)
    tkeys = [_sort_key(batch.column(c), False) for c in tie_cols]
    # np.lexsort: LAST key is primary → (group..., order, ties...)
    perm = np.lexsort(tuple(reversed(gkeys + [okey] + tkeys)))
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for g in gkeys:
        gs = g[perm]
        change[1:] |= gs[1:] != gs[:-1]
    starts = np.flatnonzero(change)
    rank = np.arange(n, dtype=np.int64) - np.repeat(starts, np.diff(np.append(starts, n)))
    keep = rank < k
    idx = pa.array(perm[keep], pa.int64())
    out = batch.take(idx)
    if with_rank:
        out = out.append_column("rank", pa.array(rank[keep] + 1, pa.int64()))
    return out


def topk_per_group(ds, *, group_cols: list[str], order_col: str, k: int,
                   tie_cols: list[str], descending: bool = True):
    """Top-k rows per group ordered by ``order_col`` (ties by ``tie_cols``
    ascending); output gains a 1-based ``rank`` column.

    Final pass runs on the sorted grouped-apply exchange
    (``functions/segments.py``): the k-bounded partials sort once on
    (group, order, ties) and every group in a block is ranked/truncated by
    one vectorized segment scan — no ``groupby().map_groups`` hash
    exchange, no per-group Python at high group cardinality."""
    kw = dict(group_cols=list(group_cols), order_col=order_col, k=k,
              tie_cols=list(tie_cols), descending=descending)
    partial = ds.map_batches(
        lambda b: _topk_table(b, with_rank=False, **kw), batch_format="pyarrow"
    )

    from .segments import sorted_group_apply

    def _rank_block(sub: pa.Table, offsets) -> pa.Table:
        n = sub.num_rows
        if n == 0:
            return sub.append_column("rank", pa.array([], pa.int64()))
        offsets = np.asarray(offsets, dtype=np.int64)
        counts = np.diff(np.append(offsets, n))
        rank = np.arange(n, dtype=np.int64) - np.repeat(offsets, counts)
        keep = rank < k
        out = sub.filter(pa.array(keep))
        return out.append_column("rank", pa.array(rank[keep] + 1, pa.int64()))

    # dedupe sort columns (a tie_col may repeat order_col or a group col;
    # Ray's sort rejects duplicate key names — first mention wins, which
    # matches lexsort semantics since a repeated key can't change order)
    seen = set(group_cols)
    order_cols, order_desc = [], []
    for c, d in [(order_col, descending)] + [(c, False) for c in tie_cols]:
        if c not in seen:
            seen.add(c)
            order_cols.append(c)
            order_desc.append(d)

    return sorted_group_apply(
        partial,
        key_cols=list(group_cols),
        order_cols=order_cols,
        order_desc=order_desc,
        apply_block=_rank_block,
    )
