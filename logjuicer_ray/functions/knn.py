"""Similarity search over an embedding column (``list<float>``).

- :func:`knn_brute_force` — exact top-k cosine: the (small) query matrix is
  broadcast once (``ray.put``), each batch does one numpy GEMM against it
  and emits its local top-k; a final tiny groupby-merge keeps the global
  top-k.  The scale path: batches stream, nothing materializes but the
  per-batch candidate rows (q × k each).
- :func:`knn_ivf` — IVF variant: k-means centroids from a driver-side
  sample, cluster assignment per batch, search restricted to the nprobe
  closest clusters.  Approximate; same output schema.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["knn_brute_force", "knn_ivf", "kmeans_fit", "kmeans_distributed", "semdedup",
           "grouped_centroids", "quantize_embeddings", "write_ivf_index",
           "load_ivf_centroids", "probed_cluster_dirs", "knn_ivf_index"]


def grouped_centroids(ds, *, group_col: str, vec_col: str = "embedding"):
    """Per-group vector centroid in EXACT integer micro-units: each vector
    component rounds half-up to ``e6`` int64 FIRST, so partial sums are
    associative and the result is bit-identical at any partitioning (and
    SQL-recomputable — float mean would depend on reduction order).

    Output is long-format (group, dim, sum_e6, n_vecs): consumers divide
    ``sum_e6 / n_vecs`` for the centroid component; the driver compare
    hashes bounded rows (groups x dims), never vectors.

    Distribution shape: per-batch partial (one zero-copy flatten + reshape,
    one ``np.add.at`` per batch), then ONE keyed shuffle of
    O(groups x dims x tasks) integer rows.  The corpus embeddings never
    move."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        col = batch.column(vec_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
        n = len(batch)
        if n == 0 or len(flat) == 0:
            return pa.table({group_col: pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "sum_e6": pa.array([], pa.int64()),
                             "n_vecs": pa.array([], pa.int64())})
        dim = len(flat) // n
        e6 = np.floor(flat.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
        m = e6.reshape(n, dim)
        g = batch.column(group_col).to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(g, return_inverse=True)
        sums = np.zeros((len(uniq), dim), dtype=np.int64)
        np.add.at(sums, inv, m)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        k = len(uniq)
        return pa.table({
            group_col: pa.array(np.repeat(uniq, dim), pa.int64()),
            "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), k), pa.int64()),
            "sum_e6": pa.array(sums.reshape(-1), pa.int64()),
            "n_vecs": pa.array(np.repeat(counts, dim), pa.int64()),
        })

    return (
        ds.select_columns([group_col, vec_col])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby([group_col, "dim"])
        .aggregate(Sum("sum_e6", alias_name="sum_e6"),
                   Sum("n_vecs", alias_name="n_vecs"))
    )


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _batch_topk(batch: pa.Table, *, queries_ref, k: int, id_col: str,
                vec_col: str) -> pa.Table:
    import ray

    q = queries_ref if isinstance(queries_ref, np.ndarray) else ray.get(queries_ref)
    ids = np.asarray(batch.column(id_col).to_pylist())
    vecs = _normalize(
        np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float32)
    )
    sims = q @ vecs.T  # (nq × nbatch) GEMM
    nq, n = sims.shape
    kk = min(k, n)
    # kth-largest threshold per query (O(n) partition); rows at the
    # threshold are tie-broken by id so the deterministic global winner is
    # always among the batch candidates
    kth = np.partition(sims, n - kk, axis=1)[:, n - kk]
    out_q: list[np.ndarray] = []
    out_sel: list[np.ndarray] = []
    for qi in range(nq):  # few queries; inner ops vectorized
        cand = np.flatnonzero(sims[qi] >= kth[qi])
        sel = cand[np.lexsort((ids[cand], -sims[qi][cand]))[:kk]]
        out_q.append(np.full(len(sel), qi, dtype=np.int32))
        out_sel.append(sel)
    flat = np.concatenate(out_sel) if out_sel else np.zeros(0, dtype=np.int64)
    qcol = np.concatenate(out_q) if out_q else np.zeros(0, dtype=np.int32)
    out_sim = sims[qcol, flat].astype(np.float64) if len(flat) else np.zeros(0)
    return pa.table(
        {
            "query_id": pa.array(qcol, pa.int32()),
            id_col: pa.array(ids[flat].tolist()),
            "cosine": pa.array(out_sim, pa.float64()),
        }
    )


def _merge_topk(group: pa.Table, *, k: int, id_col: str = "vec_id") -> pa.Table:
    # rank by (-cosine, id): ties at the k-th place break on the id, not on
    # partial-result arrival order, so the top-k is identical at any
    # cluster size (and matches the oracle's row_number ordering)
    sims = np.asarray(group.column("cosine").to_pylist())
    ids = np.asarray(group.column(id_col).to_pylist())
    order = np.lexsort((ids, -sims))[:k]
    return group.take(pa.array(order.tolist()))


def knn_brute_force(ds, queries: np.ndarray, *, k: int = 10, id_col: str = "vec_id",
                    vec_col: str = "embedding"):
    """Exact cosine top-k of each query row against the dataset.  Returns a
    Dataset (query_id, id_col, cosine) sorted by (query_id, -cosine,
    id_col)."""
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float32))
    queries_ref = ray.put(q)
    partial = ds.map_batches(
        _batch_topk,
        batch_format="pyarrow",
        batch_size=4096,
        fn_kwargs={"queries_ref": queries_ref, "k": k, "id_col": id_col, "vec_col": vec_col},
    )
    merged = partial.groupby("query_id").map_groups(
        lambda g: _merge_topk(g, k=k, id_col=id_col), batch_format="pyarrow"
    )
    return merged.sort(["query_id", "cosine", id_col], descending=[False, True, False])


def kmeans_fit(sample: np.ndarray, *, n_clusters: int, iters: int = 10,
               seed: int = 42) -> np.ndarray:
    """Tiny deterministic k-means (driver-side, on a sample) for IVF."""
    rng = np.random.default_rng(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float32))
    centroids = sample[rng.choice(len(sample), size=n_clusters, replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(n_clusters):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def knn_ivf(ds, queries: np.ndarray, *, k: int = 10, n_clusters: int = 16,
            nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
            sample_size: int = 4096):
    """Approximate top-k: restrict the scan to the ``nprobe`` centroids
    closest to each query.  Per batch, rows outside every probed cluster are
    skipped before the GEMM."""
    import ray

    # seeded random sample across the whole dataset — at scale the first
    # file is not the distribution, so limit() would bias the centroids
    n = ds.count()
    frac = min(1.0, (sample_size * 1.25) / max(1, n))
    sample_rows = ds.random_sample(frac, seed=42).limit(sample_size).to_pandas()
    if len(sample_rows) < n_clusters:
        sample_rows = ds.limit(max(n_clusters, sample_size)).to_pandas()
    sample = np.asarray(list(sample_rows[vec_col]), dtype=np.float32)
    centroids = kmeans_fit(sample, n_clusters=n_clusters)
    q = _normalize(np.asarray(queries, dtype=np.float32))
    probed = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]  # (nq × nprobe)
    wanted_clusters = np.unique(probed)
    state_ref = ray.put((q, centroids, probed, frozenset(wanted_clusters.tolist())))

    def batch_fn(batch: pa.Table) -> pa.Table:
        qm, cents, probes, wanted = ray.get(state_ref)
        ids = np.asarray(batch.column(id_col).to_pylist())
        vecs = _normalize(np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float32))
        assign = np.argmax(vecs @ cents.T, axis=1)
        keep = np.isin(assign, list(wanted))
        if not keep.any():
            return pa.table(
                {
                    "query_id": pa.array([], pa.int32()),
                    id_col: pa.array([], batch.column(id_col).type),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        ids, vecs, assign = ids[keep], vecs[keep], assign[keep]
        sims = qm @ vecs.T
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[0]):
            mask = np.isin(assign, probes[qi])
            if not mask.any():
                continue
            sel_idx = np.flatnonzero(mask)
            kk = min(k, len(sel_idx))
            best = sel_idx[np.argpartition(-sims[qi, sel_idx], kk - 1)[:kk]]
            out_q.extend([qi] * len(best))
            out_id.extend(ids[best].tolist())
            out_sim.extend(sims[qi, best].astype(float).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int32()),
                id_col: pa.array(out_id),
                "cosine": pa.array(out_sim, pa.float64()),
            }
        )

    partial = ds.map_batches(batch_fn, batch_format="pyarrow", batch_size=4096)
    merged = partial.groupby("query_id").map_groups(
        lambda g: _merge_topk(g, k=k, id_col=id_col), batch_format="pyarrow"
    )
    return merged.sort(["query_id", "cosine", id_col], descending=[False, True, False])


def kmeans_distributed(ds, *, n_clusters: int = 16, iters: int = 5,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       sample_size: int = 4096, seed: int = 42):
    """Distributed Lloyd's iterations over the full dataset (spherical
    k-means, cosine like ``kmeans_fit``) — the brief's iterative-algorithm
    class done Ray-Data-first:

    - init: seeded whole-dataset sample (no first-file bias), driver fit;
    - each iteration: centroids broadcast via ``ray.put``; one streaming
      ``map_batches`` emits PER-BLOCK partials (k rows of cluster vector
      sums + counts) — driver merge is O(blocks × k × dim), never rows;
    - no shuffle at any point; wall per iteration = one pass over the data.

    Returns (centroids float32 (k × dim), assign_fn) where ``assign_fn``
    is a batch mapper adding a ``cluster`` column — compose with
    ``ds.map_batches(assign_fn)`` for the final labeling pass."""
    import ray

    from .hashing import splitmix64

    n = ds.count()
    # deterministic content-hash init: the sample is the sample_size rows
    # with the smallest splitmix64(id XOR seed) — independent of block
    # layout, read order and run history (random_sample is seeded per
    # TASK, so its sample shifts whenever the block layout does, making
    # k-means labels non-deterministic across runs/cluster sizes)
    frac = (sample_size * 1.5) / max(1, n)
    if frac >= 1.0:
        threshold = np.uint64((1 << 64) - 1)  # keep everything
    else:
        threshold = np.uint64(int(frac * float(1 << 64)))

    def _hash_pick(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        hv = splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
        keep = hv <= threshold
        t = batch.filter(pa.array(keep)).select([id_col, vec_col])
        # order-preserving int64 view of the uint64 hash (flip the sign bit)
        enc = (hv[keep] ^ np.uint64(1 << 63)).view(np.int64)
        return t.append_column("__h", pa.array(enc))

    sample_rows = (
        ds.map_batches(_hash_pick, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["__h", id_col])
        .head(sample_size)
    )
    if len(sample_rows) < n_clusters:
        sample_rows = ds.limit(max(n_clusters, sample_size)).to_pandas()
    centroids = kmeans_fit(
        np.asarray(list(sample_rows[vec_col]), dtype=np.float32),
        n_clusters=n_clusters, iters=3, seed=seed,
    )

    for _ in range(iters):
        cref = ray.put(centroids)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            vecs = _normalize(
                np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float32)
            )
            assign = np.argmax(vecs @ c.T, axis=1)
            k, dim = c.shape
            sums = np.zeros((k, dim), dtype=np.float64)
            np.add.at(sums, assign, vecs)
            counts = np.bincount(assign, minlength=k).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.arange(k, dtype=np.int64)),
                "vsum": pa.array(sums.tolist(), pa.list_(pa.float64())),
                "cnt": pa.array(counts),
            })

        rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
        k, dim = centroids.shape
        sums = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for r in rows:
            sums[r["cluster"]] += np.asarray(r["vsum"])
            counts[r["cluster"]] += r["cnt"]
        nonzero = counts > 0
        centroids = centroids.astype(np.float64)
        centroids[nonzero] = sums[nonzero] / counts[nonzero, None]
        centroids = _normalize(centroids.astype(np.float32))

    final = ray.put(centroids)

    def assign_fn(batch: pa.Table) -> pa.Table:
        c = ray.get(final)
        vecs = _normalize(
            np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float32)
        )
        assign = np.argmax(vecs @ c.T, axis=1)
        return batch.append_column("cluster", pa.array(assign.astype(np.int64)))

    return centroids, assign_fn


def quantize_embeddings(ds, *, id_col: str = "vec_id",
                        vec_col: str = "embedding"):
    """Int8 scalar quantization summary per vector — the storage-reduction
    step before ANN serving.  Per vector: ``scale = max(|x|)/127``,
    ``q_i = floor(x_i/scale + 0.5)`` (half-up, matching SQL FLOOR, not
    numpy's half-even round); emits the compact verification row
    (id, scale_e9, q_sum, q_min, q_max) rather than the int8 payload so
    the whole quantization arithmetic sits under a value oracle.

    Stateless vectorized map — no shuffle: each batch converts its vectors
    to one (rows × dim) float64 matrix (float32 → float64 is exact, the
    same widening an external SQL engine applies) and reduces along the
    dim axis.  All-zero vectors define q = 0.
    """
    import numpy as np
    import pyarrow.compute as _pc

    def _quant(batch: pa.Table) -> pa.Table:
        emb = batch.column(vec_col)
        emb = emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb
        flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
        offs = emb.offsets.to_numpy(zero_copy_only=False)
        n = batch.num_rows
        widths = np.diff(offs)
        if n and (widths != widths[0]).any():
            raise ValueError("quantize_embeddings requires fixed-dim vectors")
        dim = int(widths[0]) if n else 0
        m = flat.reshape(n, dim) if n else flat.reshape(0, 0)
        scale = np.abs(m).max(axis=1) / 127.0 if dim else np.zeros(n)
        safe = np.where(scale == 0.0, 1.0, scale)
        q = np.floor(m / safe[:, None] + 0.5)
        q[scale == 0.0, :] = 0.0
        return pa.table({
            id_col: batch.column(id_col),
            "scale_e9": pa.array(
                np.floor(scale * 1e9 + 0.5).astype(np.int64), pa.int64()),
            "q_sum": pa.array(q.sum(axis=1).astype(np.int64), pa.int64()),
            "q_min": pa.array(
                (q.min(axis=1) if dim else np.zeros(n)).astype(np.int64),
                pa.int64()),
            "q_max": pa.array(
                (q.max(axis=1) if dim else np.zeros(n)).astype(np.int64),
                pa.int64()),
        })

    return ds.map_batches(_quant, batch_format="pyarrow")


def semdedup(ds, *, id_col: str = "vec_id", vec_col: str = "embedding",
             n_clusters: int = 16, iters: int = 5, tau: float = 0.95,
             seed: int = 42, max_cluster_rows: int = 100_000):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication — k-means cluster the embeddings, then inside each
    cluster drop all but one of every group of vectors whose pairwise
    cosine similarity reaches ``tau``.  Near-duplicate MEANING, not
    near-duplicate text: catches paraphrases MinHash can't.

    Ray shape: :func:`kmeans_distributed` (broadcast centroids, per-block
    partials, zero shuffle per iteration) assigns clusters in the same
    pass that routes rows; ONE keyed shuffle moves (id, vector) rows to
    their cluster; within a cluster the similarity graph is a dense GEMM
    (m × m, bounded by ``max_cluster_rows`` — asserted, like the fuzzy
    blocking cap) and survivors are the min-id representative of each
    connected component (union-find over the τ-edges — deterministic
    under any partitioning).  At corpus scale, raise ``n_clusters`` to
    keep clusters inside the cap; the paper's setting is k ≈ corpus/1e4.

    Returns (id, cluster, kept, rep_id) sorted by id: ``kept`` marks
    survivors, ``rep_id`` is the surviving representative of the row's
    duplicate group (its own id for singletons/survivors).
    """

    centroids, assign_fn = kmeans_distributed(
        ds, n_clusters=n_clusters, iters=iters, id_col=id_col,
        vec_col=vec_col, seed=seed,
    )

    def project(batch: pa.Table) -> pa.Table:
        t = assign_fn(batch)
        return t.select([id_col, vec_col, "cluster"])

    def dedup_cluster(group: pa.Table) -> pa.Table:
        m = group.num_rows
        assert m <= max_cluster_rows, (
            f"semdedup cluster of {m} rows exceeds max_cluster_rows="
            f"{max_cluster_rows}; raise n_clusters"
        )
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids = ids[order]
        vecs = _normalize(np.asarray(
            group.column(vec_col).take(pa.array(order)).to_pylist(),
            dtype=np.float32,
        ))
        # union-find over τ-edges; ids pre-sorted so root = min id
        parent = np.arange(m)

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        sim = vecs @ vecs.T
        ia, ib = np.nonzero(np.triu(sim >= tau, k=1))
        for a, b in zip(ia.tolist(), ib.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        roots = np.array([find(i) for i in range(m)])
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "cluster": group.column("cluster").take(pa.array(order)),
            "kept": pa.array(roots == np.arange(m)),
            "rep_id": pa.array(ids[roots], pa.int64()),
        })

    return (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(dedup_cluster, batch_format="pyarrow")
        .sort(id_col)
    )


# ------------------------------------------------------- persistent IVF index

def write_ivf_index(ds, path: str, *, n_clusters: int = 16,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    sample_size: int = 4096, seed: int = 42) -> dict:
    """Build and PERSIST an IVF index: the vector table re-written as
    hive-partitioned parquet (``vectors/cl=K/``) plus a centroids bundle
    (report_codec single-file artifact).  The 100-TB query pattern this
    buys: probing is **read-level pruning** — a query opens only its
    ``nprobe`` clusters' files; the other partitions are never read.
    Build cost is one assignment pass + one partitioned write; the
    cluster id is stored BOTH as the partition key and as a regular
    ``cl`` column so readers do not depend on hive-path inference.

    Returns the centroid-bundle footer (carries n_clusters / dim /
    metric in ``meta``)."""
    import os

    import ray

    from ..report_codec import write_report_bundle

    n = ds.count()
    frac = min(1.0, (sample_size * 1.25) / max(1, n))
    sample_rows = ds.random_sample(frac, seed=seed).limit(sample_size).to_pandas()
    if len(sample_rows) < n_clusters:
        sample_rows = ds.limit(max(n_clusters, sample_size)).to_pandas()
    sample = np.asarray(list(sample_rows[vec_col]), dtype=np.float32)
    centroids = kmeans_fit(sample, n_clusters=n_clusters, seed=seed)
    cents_ref = ray.put(centroids)

    def _assign(batch: pa.Table) -> pa.Table:
        import ray as _ray

        cents = _ray.get(cents_ref)
        vecs = _normalize(np.asarray(batch.column(vec_col).to_pylist(),
                                     dtype=np.float32))
        cl = np.argmax(vecs @ cents.T, axis=1).astype(np.int32)
        batch = batch.append_column("cl", pa.array(cl, pa.int32()))
        return batch.append_column("cluster", pa.array(cl, pa.int32()))

    os.makedirs(path, exist_ok=True)
    (ds.map_batches(_assign, batch_format="pyarrow")
       .write_parquet(os.path.join(path, "vectors"),
                      partition_cols=["cluster"]))
    dim = int(centroids.shape[1])
    return write_report_bundle(
        os.path.join(path, "centroids.bundle"),
        {"centroids": pa.table({
            "cluster": pa.array(range(n_clusters), pa.int32()),
            "centroid": pa.array([c.tolist() for c in centroids],
                                 pa.list_(pa.float32())),
        })},
        kind="ivf_index",
        meta={"n_clusters": n_clusters, "dim": dim, "metric": "cosine",
              "id_col": id_col, "vec_col": vec_col})


def load_ivf_centroids(path: str) -> tuple[np.ndarray, dict]:
    """Read back the centroid matrix + meta from a persisted index."""
    import os

    from ..report_codec import read_report_bundle

    tables, footer = read_report_bundle(
        os.path.join(path, "centroids.bundle"), sections=["centroids"])
    t = tables["centroids"].sort_by("cluster")
    cents = np.asarray(t.column("centroid").to_pylist(), dtype=np.float32)
    return cents, footer["meta"]


def probed_cluster_dirs(path: str, queries: np.ndarray, *,
                        nprobe: int) -> tuple[list[str], np.ndarray]:
    """The partition dirs a query batch needs: union of each query's
    ``nprobe`` closest centroids.  Exposed for tests and ops visibility
    (how much of the index a workload actually touches)."""
    import os

    cents, _meta = load_ivf_centroids(path)
    q = _normalize(np.asarray(queries, dtype=np.float32))
    probed = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]
    wanted = np.unique(probed)
    dirs = [os.path.join(path, "vectors", f"cluster={int(c)}")
            for c in wanted]
    return [d for d in dirs if os.path.isdir(d)], probed


def knn_ivf_index(path: str, queries: np.ndarray, *, k: int = 10,
                  nprobe: int = 4):
    """Top-k cosine against a PERSISTED IVF index: only the probed
    partitions are read (``probed_cluster_dirs``), assignment comes from
    the stored ``cl`` column (no recompute), then the same broadcast-GEMM
    + k-bounded merge as the in-memory paths.  ``nprobe = n_clusters``
    reproduces brute force over the full table bit-for-bit."""
    import ray
    import ray.data as rd

    cents, meta = load_ivf_centroids(path)
    id_col = meta["id_col"]
    vec_col = meta["vec_col"]
    dirs, probed = probed_cluster_dirs(path, queries, nprobe=nprobe)
    q = _normalize(np.asarray(queries, dtype=np.float32))
    state_ref = ray.put((q, probed))

    def batch_fn(batch: pa.Table) -> pa.Table:
        qm, probes = ray.get(state_ref)
        ids = np.asarray(batch.column(id_col).to_pylist())
        cl = np.asarray(batch.column("cl"), dtype=np.int64)
        vecs = _normalize(np.asarray(batch.column(vec_col).to_pylist(),
                                     dtype=np.float32))
        sims = qm @ vecs.T
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[0]):
            mask = np.isin(cl, probes[qi])
            if not mask.any():
                continue
            sel_idx = np.flatnonzero(mask)
            kk = min(k, len(sel_idx))
            best = sel_idx[np.argpartition(-sims[qi, sel_idx], kk - 1)[:kk]]
            out_q.extend([qi] * len(best))
            out_id.extend(ids[best].tolist())
            out_sim.extend(sims[qi, best].astype(float).tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int32()),
            id_col: pa.array(out_id, batch.column(id_col).type),
            "cosine": pa.array(out_sim, pa.float64()),
        })

    import os

    files = [os.path.join(d, f)
             for d in dirs for f in sorted(os.listdir(d))
             if f.endswith(".parquet")]
    ds = rd.read_parquet(files, columns=[id_col, vec_col, "cl"])
    partial = ds.map_batches(batch_fn, batch_format="pyarrow",
                             batch_size=4096)
    merged = partial.groupby("query_id").map_groups(
        lambda g: _merge_topk(g, k=k, id_col=id_col), batch_format="pyarrow")
    return merged.sort(["query_id", "cosine", id_col],
                       descending=[False, True, False])
