"""Distributed graph analytics over co-occurrence graphs: triangle
counting and PageRank.

The graph is derived, not stored: :func:`cooccurrence_edges` builds the
undirected edge set "items u, v appeared in the same group" from an
(group, item) incidence table with two distributed dedups and one
self-join — the pair explosion is bounded by max items per group (TPC-H
lineitem: ≤ 7 parts per order → ≤ 21 pairs).

- :func:`triangle_counts`: per-node triangle participation via the
  oriented wedge join — edges kept as u < v, wedges (u<v<w) from one
  hash join on the middle node, closed by a second join against the
  edge set, then one explode + groupby.  All native Ray Data joins —
  every step is a keyed exchange, nothing driver-side.  (Production
  refinement for skewed graphs: orient by (degree, id) instead of id —
  same output, wedge count drops to O(m^1.5); plain id orientation keeps
  the SQL oracle trivially parallel.)
- :func:`pagerank`: fixed-iteration PageRank with INTEGER micro-unit
  arithmetic — rank starts at 10^6 per node and each step is
  ``r'(v) = 150000 + Σ_{u→v} floor(0.85 · r(u) / deg(u))`` — floor'd
  per edge so every intermediate is an int64 and the result is
  bit-reproducible under any partitioning AND recomputable by an
  external SQL engine (floats would make the sum order-dependent).
  Each iteration is one native join (ranks ⋈ edges on source) + one
  groupby-sum on destination; driver state is zero — ranks live as a
  Dataset across iterations.

No reference analog (the logjuicer reference has no graph operators);
these extend the engine per the training-data brief — the same
join+groupby machinery that powers the distributed connected-components
labeler (functions/dedup.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["cooccurrence_edges", "triangle_counts", "pagerank", "frequent_pairs"]


def _auto_partitions(num_partitions: int | None) -> int:
    """Join shuffle partitions sized to the cluster: Ray's join operator
    reserves ~0.125 CPU per partition for its aggregator actors while its
    shuffle TASKS need a full CPU each — a plan with two 16-partition
    joins on a 4-CPU cluster reserves every core for aggregators and
    deadlocks the shuffle tasks.  Half a CPU's worth of partitions per
    join keeps multi-join plans schedulable at any cluster size."""
    if num_partitions is not None:
        return num_partitions
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, cpus // 2)


def _dedup_pairs_batch(batch: pa.Table, cols) -> pa.Table:
    return batch.select(cols).group_by(cols).aggregate([])


def _pair_explode_block(item_col: str):
    """Block kernel for the sorted-exchange pair generators: given a block
    of complete (group)-segments sorted by (group, item), drop duplicate
    (group, item) rows via the adjacent-equality mask and emit every
    oriented pair (u < v falls out of the in-segment item order) with a
    fully vectorized repeat/arange construction."""

    def _pairs_block(sub: pa.Table, offsets) -> pa.Table:
        item_type = sub.schema.field(item_col).type
        empty = pa.table({"u": pa.array([], item_type),
                          "v": pa.array([], item_type)})
        n = sub.num_rows
        if n == 0:
            return empty
        offsets = np.asarray(offsets, dtype=np.int64)
        x = sub.column(item_col).combine_chunks()
        # drop duplicate (group, item) rows: equal-adjacent items within a
        # segment (sorted ⇒ duplicates are adjacent; segment starts reset)
        keep = np.ones(n, bool)
        if n > 1:
            eq = pc.fill_null(pc.equal(x.slice(1), x.slice(0, n - 1)), False)
            keep[1:] = ~eq.to_numpy(zero_copy_only=False)
        keep[offsets] = True
        starts = np.zeros(n, bool)
        starts[offsets] = True
        seg = np.cumsum(starts) - 1
        kidx = np.flatnonzero(keep)
        kseg = seg[kidx]
        m = kidx.size
        seg_len = np.bincount(kseg, minlength=len(offsets))
        new_off = np.concatenate(([0], np.cumsum(seg_len)[:-1]))
        p = np.arange(m) - new_off[kseg]
        cnt = seg_len[kseg] - p - 1  # pairs led by each kept row
        total = int(cnt.sum())
        if total == 0:
            return empty
        left = np.repeat(np.arange(m), cnt)
        lead = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        right = left + (np.arange(total) - np.repeat(lead, cnt)) + 1
        li = pa.array(kidx[left], pa.int64())
        ri = pa.array(kidx[right], pa.int64())
        return pa.table({"u": x.take(li), "v": x.take(ri)})

    return _pairs_block


def cooccurrence_edges(ds, *, group_col: str, item_col: str,
                       num_partitions: int | None = None):
    """Undirected co-occurrence edges (u < v, deduped) from an incidence
    table, on the sorted exchange: one range sort of the per-batch-deduped
    (group, item) incidence replaces the old distinct-groupby + per-group
    self-join (two hash exchanges + a join).  Each sorted block generates
    its complete groups' oriented pairs with a fully vectorized
    repeat/arange kernel — duplicate (group, item) rows are dropped by an
    adjacent-equality mask first, and items arrive sorted within each
    group so ``u < v`` falls out of index order.  The pair explosion
    (bounded by max items per group — TPC-H lineitem: ≤ 7 parts per order
    → ≤ 21 pairs) happens AFTER the exchange, inside the block kernel;
    only the incidence rides the sort.  A final ``group_first_row`` on
    (u, v) — the same sorted exchange — dedups pairs across groups.

    ``num_partitions`` is accepted for API compatibility (the join path
    this replaced sized its shuffle with it) and unused."""
    import numpy as np

    from .segments import sorted_group_apply

    del num_partitions  # sorted exchange sizes itself

    inc = ds.map_batches(
        lambda b: _dedup_pairs_batch(b, [group_col, item_col]),
        batch_format="pyarrow",
    )
    _pairs_block = _pair_explode_block(item_col)

    pairs = sorted_group_apply(
        inc, key_cols=[group_col], order_cols=[item_col],
        apply_block=_pairs_block,
    ).map_batches(lambda b: _dedup_pairs_batch(b, ["u", "v"]),
                  batch_format="pyarrow")

    def _first_of_group(sub: pa.Table, offsets) -> pa.Table:
        if sub.num_rows == 0:
            return sub
        return sub.take(pa.array(np.asarray(offsets, np.int64), pa.int64()))

    # cross-group pair dedup via sorted_group_apply, NOT group_first_row:
    # identical (u, v) rows from different groups violate the first-row
    # helper's unique-row-identity requirement (a duplicate key starting
    # exactly at a block boundary could be dropped); the apply exchange
    # has no such requirement.  materialize: every downstream graph op
    # consumes the edge list more than once (triangle_counts reads it
    # three times, pagerank twice) — the REDUCED unique-pair artifact is
    # the cheap side to pin.
    return sorted_group_apply(
        pairs, key_cols=["u", "v"], order_cols=[],
        apply_block=_first_of_group,
    ).materialize()


def _triangle_broadcast(edges, *, driver_edge_rows: int, strict: bool):
    """Broadcast-adjacency triangle counting: the UNIQUE oriented edge
    list (the reduced artifact, already ≤ driver_edge_rows small side) is
    collected once, remapped to dense node indices and shipped as one
    object-store copy (sorted packed keys + forward-adjacency CSR); each
    edge batch then generates its wedges and closes them with a
    vectorized searchsorted membership test — zero joins, per-block
    (node, cnt) partials folded on the driver.  Returns ``None`` when the
    edge count exceeds the bound and ``strict`` is False (auto-fallback
    to the join path)."""
    import ray
    import ray.data as rd

    u_parts, v_parts, total = [], [], 0
    for b in edges.iter_batches(batch_format="pyarrow"):
        u_parts.append(b.column("u").combine_chunks().cast(pa.int64())
                       .to_numpy(zero_copy_only=False))
        v_parts.append(b.column("v").combine_chunks().cast(pa.int64())
                       .to_numpy(zero_copy_only=False))
        total += len(u_parts[-1])
        if total > driver_edge_rows:
            if strict:
                raise ValueError(
                    f"edge count exceeds driver_edge_rows="
                    f"{driver_edge_rows}; use mode='join'"
                )
            return None
    if total == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "n_triangles": pa.array([], pa.int64()),
        }))
    eu = np.concatenate(u_parts)
    ev = np.concatenate(v_parts)
    nodes = np.unique(np.concatenate([eu, ev]))
    n = nodes.size
    iu = np.searchsorted(nodes, eu)
    iv = np.searchsorted(nodes, ev)
    keys_sorted = np.sort(iu * n + iv)  # packed (u, w) membership keys
    # forward-adjacency CSR: for node a, the sorted targets b > a
    order = np.lexsort((iv, iu))
    adj_tgt = iv[order]
    indptr = np.searchsorted(iu[order], np.arange(n + 1))
    state = ray.put((nodes, keys_sorted, adj_tgt, indptr, n))

    def _tri_partial(batch: pa.Table) -> pa.Table:
        nds, keys, tgt, ptr, nn = ray.get(state)
        bu = np.searchsorted(nds, batch.column("u").combine_chunks()
                             .cast(pa.int64()).to_numpy(zero_copy_only=False))
        bv = np.searchsorted(nds, batch.column("v").combine_chunks()
                             .cast(pa.int64()).to_numpy(zero_copy_only=False))
        cnt = ptr[bv + 1] - ptr[bv]  # wedges continue through v
        tot = int(cnt.sum())
        if tot == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        left = np.repeat(np.arange(len(bu)), cnt)
        lead = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        within = np.arange(tot) - np.repeat(lead, cnt)
        w = tgt[ptr[bv[left]] + within]
        wu, wv = bu[left], bv[left]
        probe = wu * nn + w
        pos = np.searchsorted(keys, probe)
        hit = (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)] == probe)
        tri_nodes = np.concatenate([wu[hit], wv[hit], w[hit]])
        acc = np.bincount(tri_nodes, minlength=nn)
        nz = np.flatnonzero(acc)
        return pa.table({"node_idx": pa.array(nz, pa.int64()),
                         "cnt": pa.array(acc[nz], pa.int64())})

    acc = np.zeros(n, np.int64)
    for b in edges.map_batches(
        _tri_partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        idx = b.column("node_idx").to_numpy(zero_copy_only=False)
        np.add.at(acc, idx, b.column("cnt").to_numpy(zero_copy_only=False))
    nz = np.flatnonzero(acc)
    return rd.from_arrow(pa.table({
        "node": pa.array(nodes[nz], pa.int64()),
        "n_triangles": pa.array(acc[nz], pa.int64()),
    }))


def triangle_counts(edges, *, num_partitions: int | None = None,
                    mode: str = "auto", driver_edge_rows: int = 10_000_000):
    """Per-node triangle participation over an oriented (u < v) edge
    Dataset.  Returns (node, n_triangles) for nodes in ≥ 1 triangle.

    ``broadcast`` mode (chosen by ``auto`` while the unique edge list —
    the already-reduced small side — fits ``driver_edge_rows``, ~16 B ×
    10M = 160 MB one object-store copy) replaces both hash joins with a
    searchsorted membership probe against the broadcast CSR; the wedge
    explosion still runs distributed per edge block.  ``join`` is the
    beyond-bound scale path: two native joins + one groupby-sum."""
    if mode not in ("auto", "broadcast", "join"):
        raise ValueError(f"unknown triangle_counts mode {mode!r}")
    if mode != "join":
        out = _triangle_broadcast(edges, driver_edge_rows=driver_edge_rows,
                                  strict=(mode == "broadcast"))
        if out is not None:
            return out
    num_partitions = _auto_partitions(num_partitions)
    # wedges u<v<w: middle node v joins (u,v) with (v,w)
    ev = edges.map_batches(
        lambda b: b.rename_columns(["v", "w"]), batch_format="pyarrow"
    )
    wedges = edges.join(ev, join_type="inner", on=("v",),
                        num_partitions=num_partitions)
    # close the triangle: (u, w) must be an edge — join on the composite key
    closing = edges.map_batches(
        lambda b: b.rename_columns(["u", "w"]).append_column(
            "is_edge", pa.array([True] * b.num_rows)
        ),
        batch_format="pyarrow",
    )
    tri = wedges.join(closing, join_type="inner", on=("u", "w"),
                      num_partitions=num_partitions)

    def _explode_nodes(batch: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays([
            batch.column(c).combine_chunks().cast(pa.int64())
            for c in ("u", "v", "w")
        ])
        t = pa.table({"node": nodes})
        g = t.group_by(["node"]).aggregate([([], "count_all")])
        return g.rename_columns(["node", "cnt"])

    from ray.data.aggregate import Sum

    return (
        tri.map_batches(_explode_nodes, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("cnt", alias_name="n_triangles"))
    )


def _pagerank_broadcast(sym, *, iterations: int, driver_rank_rows: int,
                        strict: bool):
    """Broadcast-vector PageRank over a pinned symmetrized edge Dataset.
    Returns the (node, rank_e6) Dataset, or ``None`` when the node count
    exceeds ``driver_rank_rows`` and ``strict`` is False (auto-fallback
    to the join path).  Arithmetic is bit-identical to the join path:
    per edge ``floor(0.85 · float64(r[src]) / float64(deg[src]))``
    summed as int64 per destination."""
    import numpy as np
    import ray
    import ray.data as rd

    # per-block partial degrees (unique nodes per block only ride back)
    def _deg_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["src"]).group_by(["src"]).aggregate([([], "count_all")])
        return g.rename_columns(["src", "cnt"])

    node_parts, cnt_parts, seen = [], [], 0
    for b in sym.map_batches(_deg_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        node_parts.append(b.column("src").to_numpy(zero_copy_only=False))
        cnt_parts.append(b.column("cnt").to_numpy(zero_copy_only=False))
        seen += b.num_rows
        if seen > 4 * driver_rank_rows and not strict:
            return None  # partial volume already past any plausible bound
    if not node_parts:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "rank_e6": pa.array([], pa.int64()),
        }))
    all_nodes = np.concatenate(node_parts)
    all_cnts = np.concatenate(cnt_parts).astype(np.int64)
    nodes, inv = np.unique(all_nodes, return_inverse=True)
    if nodes.size > driver_rank_rows:
        if strict:
            raise ValueError(
                f"{nodes.size} nodes exceed driver_rank_rows="
                f"{driver_rank_rows}; use mode='join'"
            )
        return None
    deg = np.zeros(nodes.size, np.int64)
    np.add.at(deg, inv, all_cnts)
    r = np.full(nodes.size, 1_000_000, np.int64)
    nodes_ref = ray.put(nodes)

    for _ in range(iterations):
        state_ref = ray.put((r, deg))

        def _contrib_partial(batch: pa.Table) -> pa.Table:
            nds = ray.get(nodes_ref)
            rv, dv = ray.get(state_ref)
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            idx = np.searchsorted(nds, src)
            c = np.floor(
                0.85 * rv[idx].astype(np.float64) / dv[idx].astype(np.float64)
            ).astype(np.int64)
            ud, dinv = np.unique(dst, return_inverse=True)
            acc = np.zeros(ud.size, np.int64)
            np.add.at(acc, dinv, c)
            return pa.table({"dst": pa.array(ud, pa.int64()),
                             "c": pa.array(acc, pa.int64())})

        acc = np.zeros(nodes.size, np.int64)
        for b in sym.map_batches(
            _contrib_partial, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            d = b.column("dst").to_numpy(zero_copy_only=False)
            c = b.column("c").to_numpy(zero_copy_only=False)
            np.add.at(acc, np.searchsorted(nodes, d), c)
        r = acc + 150_000

    return rd.from_arrow(pa.table({
        "node": pa.array(nodes, pa.int64()),
        "rank_e6": pa.array(r, pa.int64()),
    }))


def pagerank(edges, *, iterations: int = 3, num_partitions: int | None = None,
             mode: str = "auto", driver_rank_rows: int = 5_000_000):
    """Integer micro-unit PageRank over an oriented (u < v) undirected
    edge Dataset (symmetrized internally).  Returns (node, rank_e6) after
    ``iterations`` steps of
    ``r'(v) = 150000 + Σ floor(0.85 · r(u) / deg(u))`` from
    ``r0 = 10^6``.  Exact integer output — reproducible under any
    partitioning and SQL-recomputable.

    Two execution modes with IDENTICAL arithmetic (same float64
    ``floor(0.85·r/deg)`` per edge, same int64 sums):

    - ``broadcast`` (k-means-style, chosen by ``auto`` when the node
      count is ≤ ``driver_rank_rows``): the rank/degree vectors live in
      one object-store copy (~16 B/node — 5M nodes ≈ 80 MB) and each
      iteration is ONE ``map_batches`` over the pinned symmetrized edge
      Dataset producing per-block (dst, Σc) partials that the driver
      folds in O(nodes).  Zero shuffle per iteration; the edge set — the
      100-TB side — streams and never moves.
    - ``join`` (the scale path for node sets beyond the broadcast
      bound): one native join (ranks ⋈ edges on source) + one
      groupby-sum on destination per iteration; driver state is zero.
    """
    import numpy as np

    num_partitions = _auto_partitions(num_partitions)

    def _symmetrize(batch: pa.Table) -> pa.Table:
        u = batch.column("u").combine_chunks().cast(pa.int64())
        v = batch.column("v").combine_chunks().cast(pa.int64())
        return pa.table({
            "src": pa.concat_arrays([u, v]),
            "dst": pa.concat_arrays([v, u]),
        })

    sym = edges.map_batches(_symmetrize, batch_format="pyarrow").materialize()

    if mode not in ("auto", "broadcast", "join"):
        raise ValueError(f"unknown pagerank mode {mode!r}")
    if mode != "join":
        out = _pagerank_broadcast(sym, iterations=iterations,
                                  driver_rank_rows=driver_rank_rows,
                                  strict=(mode == "broadcast"))
        if out is not None:
            return out
        # auto: node count exceeded the broadcast bound — fall through
    # repartition the key-bounded aggregate so no schema-less empty block
    # reaches the join shuffle (same guard as the outer-join queries)
    deg = sym.groupby("src").count().map_batches(
        lambda b: b.rename_columns(["src", "deg"]), batch_format="pyarrow"
    ).repartition(2)
    # edges annotated with the source degree once — reused every iteration
    esrc = sym.join(deg, join_type="inner", on=("src",),
                    num_partitions=num_partitions).materialize()
    ranks = deg.map_batches(
        lambda b: pa.table({
            "src": b.column("src"),
            "r": pa.array([1_000_000] * b.num_rows, pa.int64()),
        }),
        batch_format="pyarrow",
    ).repartition(2)
    from ray.data.aggregate import Sum

    for _ in range(iterations):
        contrib_in = esrc.join(ranks, join_type="inner", on=("src",),
                               num_partitions=num_partitions)

        def _contrib(batch: pa.Table) -> pa.Table:
            r = batch.column("r").to_numpy(zero_copy_only=False).astype(np.float64)
            d = batch.column("deg").to_numpy(zero_copy_only=False).astype(np.float64)
            c = np.floor(0.85 * r / d).astype(np.int64)
            t = pa.table({"dst": batch.column("dst"),
                          "c": pa.array(c, pa.int64())})
            g = pa.TableGroupBy(t, "dst").aggregate([("c", "sum")])
            return g.rename_columns(["dst", "c"])

        summed = (
            contrib_in.map_batches(_contrib, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("c", alias_name="c"))
        )
        ranks = summed.map_batches(
            lambda b: pa.table({
                "src": b.column("dst"),
                "r": pc.add(b.column("c"), 150_000),
            }),
            batch_format="pyarrow",
        ).repartition(2).materialize()

    return ranks.map_batches(
        lambda b: b.rename_columns(["node", "rank_e6"]), batch_format="pyarrow"
    )


def frequent_pairs(ds, *, group_col: str, item_col: str, min_support: int,
                   num_partitions: int | None = None):
    """Frequent itemset pairs (market-basket support counting): item pairs
    co-occurring in at least ``min_support`` distinct groups, with their
    support counts.  The same incidence self-join as
    :func:`cooccurrence_edges`, but the final keyed aggregate keeps the
    per-pair group count and filters by support — support counting
    happens distributed; only (u, v, support) rows survive.

    Same sorted-exchange shape as :func:`cooccurrence_edges` (the shared
    ``_pair_explode_block`` emits each group's pairs exactly once, so
    support = the pair's row count), with ``sorted_group_sum`` as the
    final support aggregate — no self-join, no hash exchanges.
    ``num_partitions`` accepted for API compatibility, unused."""
    from .segments import sorted_group_apply, sorted_group_sum

    del num_partitions

    inc = ds.map_batches(
        lambda b: _dedup_pairs_batch(b, [group_col, item_col]),
        batch_format="pyarrow",
    )
    pairs = sorted_group_apply(
        inc, key_cols=[group_col], order_cols=[item_col],
        apply_block=_pair_explode_block(item_col),
    )

    def _precount(batch: pa.Table) -> pa.Table:
        t = batch.group_by(["u", "v"]).aggregate([([], "count_all")])
        return t.rename_columns(["u", "v", "cnt"])

    counted = sorted_group_sum(
        pairs.map_batches(_precount, batch_format="pyarrow"),
        key_cols=["u", "v"], sum_cols=["cnt"], out_cols=["support"],
    )
    return counted.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("support"), min_support)),
        batch_format="pyarrow",
    )
