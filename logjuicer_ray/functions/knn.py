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

__all__ = ["knn_brute_force", "knn_ivf", "kmeans_fit"]


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
    kk = min(k, sims.shape[1])
    top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
    out_q, out_id, out_sim = [], [], []
    for qi in range(sims.shape[0]):
        sel = top[qi]
        out_q.extend([qi] * len(sel))
        out_id.extend(ids[sel].tolist())
        out_sim.extend(sims[qi, sel].astype(float).tolist())
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int32()),
            id_col: pa.array(out_id),
            "cosine": pa.array(out_sim, pa.float64()),
        }
    )


def _merge_topk(group: pa.Table, *, k: int) -> pa.Table:
    sims = np.asarray(group.column("cosine").to_pylist())
    order = np.argsort(-sims, kind="stable")[:k]
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
        lambda g: _merge_topk(g, k=k), batch_format="pyarrow"
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

    sample_rows = ds.limit(sample_size).to_pandas()
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
        lambda g: _merge_topk(g, k=k), batch_format="pyarrow"
    )
    return merged.sort(["query_id", "cosine", id_col], descending=[False, True, False])
