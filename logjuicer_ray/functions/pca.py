"""Distributed PCA over an embedding column: exact moment partials →
driver eigendecomposition → broadcast projection.

Classic two-phase distributed PCA (the covariance route — textbook
material, e.g. the tall-skinny covariance factorization used by every
MapReduce-era PCA): the corpus contributes ONLY an O(dim²) sufficient
statistic, the driver does an O(dim³) eigensolve on it, and the
projection streams with the components broadcast once.  Embeddings never
shuffle; nothing data-sized ever concentrates.

Float-sum parity convention (same as grouped_centroids,
functions/knn.py): element values are quantized to e6 integer micro-units
(``floor(x * 1e6)`` in float64) so every partial is an EXACT int64 and
the second-moment matrix is bit-identical under any partitioning — and
recomputable by an external SQL engine (the ``embedding_covariance``
hard oracle).

- :func:`moment_partials`: Dataset → upper-triangle ``(i, j, sxy)`` rows
  (int64 Σ qᵢqⱼ) plus the ``i == j`` diagonal carrying Σ qᵢ in ``sx``;
  one 64×64 GEMM per batch (``Q.T @ Q`` in int64), one small groupby.
- :func:`pca_components`: moments → (mean, top-k eigenvectors) on the
  driver — O(dim²) rows in, O(dim·k) out.
- :func:`pca_project`: broadcast (mean, W) via ``ray.put``; per-batch
  centered GEMM projection.

No reference counterpart (engine addition for embedding pipelines).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["moment_partials", "pca_components", "pca_project"]

SCALE = 1_000_000.0


def _quantize(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return np.zeros((0, 0), dtype=np.int64)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(arr[0])
    x = flat.reshape(len(arr), dim)
    return np.floor(x * SCALE).astype(np.int64)


def moment_partials(ds, *, col: str = "embedding"):
    """Exact integer second moments: one row per upper-triangle (i, j)
    with ``sxy = Σ qᵢqⱼ`` (int64), ``sx = Σ qᵢ`` on diagonal rows
    (0 elsewhere), and ``n`` (row count) on the (0, 0) row only."""

    def _partial(batch: pa.Table) -> pa.Table:
        q = _quantize(batch, col)
        n, dim = q.shape
        if n == 0:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("i", "j", "sxy", "sx", "n")})
        s2 = q.T @ q  # int64 GEMM — exact
        s1 = q.sum(axis=0)
        iu, ju = np.triu_indices(dim)
        sx = np.zeros(len(iu), dtype=np.int64)
        diag = iu == ju
        sx[diag] = s1[iu[diag]]
        cnt = np.zeros(len(iu), dtype=np.int64)
        cnt[0] = n
        return pa.table({
            "i": pa.array(iu.astype(np.int64), pa.int64()),
            "j": pa.array(ju.astype(np.int64), pa.int64()),
            "sxy": pa.array(s2[iu, ju], pa.int64()),
            "sx": pa.array(sx, pa.int64()),
            "n": pa.array(cnt, pa.int64()),
        })

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table({
            "i": b.column("i"),
            "j": b.column("j"),
            "sxy": b.column("sum(sxy)").cast(pa.int64()),
            "sx": b.column("sum(sx)").cast(pa.int64()),
            "n": b.column("sum(n)").cast(pa.int64()),
        })

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .sum(["sxy", "sx", "n"])
        .map_batches(_rename, batch_format="pyarrow")
    )


def pca_components(ds, *, col: str = "embedding", k: int = 8):
    """(mean, components): driver-side eigensolve over the O(dim²)
    moment rows.  Returns ``(mean[dim], W[dim, k])`` float64 with a
    deterministic sign convention (largest-|coef| entry positive)."""
    rows = moment_partials(ds, col=col).take_all()
    dim = max(r["j"] for r in rows) + 1
    s2 = np.zeros((dim, dim), dtype=np.float64)
    s1 = np.zeros(dim, dtype=np.float64)
    n = 0
    for r in rows:
        v = r["sxy"] / (SCALE * SCALE)
        s2[r["i"], r["j"]] = v
        s2[r["j"], r["i"]] = v
        if r["i"] == r["j"]:
            s1[r["i"]] = r["sx"] / SCALE
        n += r["n"]
    mean = s1 / n
    cov = s2 / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    w = vecs[:, order]
    # sign convention: the largest-|coefficient| entry of each component
    # is positive — eigenvectors are otherwise sign-ambiguous
    for c in range(w.shape[1]):
        m = np.argmax(np.abs(w[:, c]))
        if w[m, c] < 0:
            w[:, c] = -w[:, c]
    return mean, w


def pca_project(ds, mean: np.ndarray, components: np.ndarray, *,
                id_col: str = "vec_id", col: str = "embedding",
                out_col: str = "pca"):
    """Project each embedding onto the components: one broadcast of
    (mean, W), one centered GEMM per batch.  Output rows are
    ``(id, pca: list<double>[k])``; projection runs on the QUANTIZED
    values (the same e6 floor used for the moments) so the transform is
    the exact linear map of the statistics it was fit on."""
    import ray

    bcast = ray.put((np.asarray(mean, np.float64),
                     np.asarray(components, np.float64)))

    class Projector:
        def __init__(self):
            self.mean, self.w = ray.get(bcast)

        def __call__(self, batch: pa.Table) -> pa.Table:
            q = _quantize(batch, col).astype(np.float64) / SCALE
            y = (q - self.mean) @ self.w
            return pa.table({
                id_col: batch.column(id_col),
                out_col: pa.array(list(y), pa.list_(pa.float64())),
            })

    return ds.map_batches(Projector, batch_format="pyarrow",
                          concurrency=(1, 8))
