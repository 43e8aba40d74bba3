"""Hashing-trick vectorizer and cosine-distance index (numpy only).

Re-implements the feature math of the reference index crate
(crates/index/src/index.rs:183-214):

- each token word hashes to one of ``SIZE = 260_000`` columns with value
  ``±1`` (sign from the hash high bit, "alternate sign to improve inner
  product preservation", index.rs:193-195);
- duplicate columns within a line are dropped, not summed (sklearn
  HashingVectorizer compatibility note, index.rs:198-205);
- rows are L2-normalized, so baselines × targetsᵀ yields cosine similarity
  directly (index.rs:161-181); ``distance = 1 - max(0, max_row(sim))``
  starting from 1.0 when there is no overlap (index.rs:85-102,175-181);
- scoring is batched: the reference's recorded benches show batched matmul
  ≈56× faster than per-line scoring (bench-index.rs:21-35), which is why the
  Ray engine scores exclusively inside ``map_batches``.

There is no scipy in the target environment, so the sparse matrix is a
hand-rolled CSR (:class:`SparseIndex`) and the matmul is an inverted-index
scatter (vectorized numpy): for every target nonzero, gather the baseline
rows sharing that column, segment-sum the products per (target, baseline)
pair, and take the per-target max.

Hash choice: ``zlib.crc32`` (stable across processes/machines/runs, C speed).
The reference uses fxhash32; only self-consistency is required (SURVEY.md
§7.4) and the hash is pinned in the saved-model manifest (HASH_NAME).
"""

from __future__ import annotations

from zlib import crc32

import numpy as np

__all__ = [
    "SIZE",
    "CHUNK_SIZE",
    "THRESHOLD",
    "HASH_NAME",
    "SparseIndex",
    "build_index",
    "distances",
    "merge_indexes",
    "empty_index",
    "word_hash",
]

SIZE = 260_000  # hashing dimension (index.rs:183)
CHUNK_SIZE = 512  # scoring chunk size (process.rs:26, index.rs:94-99)
THRESHOLD = np.float32(0.3)  # anomaly cosine-distance threshold (process.rs:20)
HASH_NAME = "crc32"  # pinned in the model manifest (analog of MODEL_VERSION)

_SIGN_BIT = 2_147_483_648  # 2**31 (index.rs:194)


def word_hash(word: str) -> int:
    return crc32(word.encode("utf-8", "surrogatepass"))


class _WordCache:
    """Per-process cache word -> (column, sign).  Token vocabularies are tiny
    after normalization, so virtually every lookup hits."""

    __slots__ = ("cache",)

    def __init__(self) -> None:
        self.cache: dict[str, tuple[int, float]] = {}

    def lookup(self, word: str) -> tuple[int, float]:
        hit = self.cache.get(word)
        if hit is None:
            h = word_hash(word)
            hit = (h % SIZE, 1.0 if h >= _SIGN_BIT else -1.0)
            self.cache[word] = hit
        return hit


_GLOBAL_CACHE = _WordCache()


class SparseIndex:
    """Row-L2-normalized CSR matrix of shape (nrows, SIZE), float32.

    The analog of the reference ``FeaturesMatrix`` (index.rs:20).  Also holds
    a lazily-built inverted (by-column) view used when this index is the
    baseline side of a distance computation.
    """

    __slots__ = ("data", "indices", "indptr", "nrows", "_by_col")

    def __init__(self, data: np.ndarray, indices: np.ndarray, indptr: np.ndarray):
        self.data = data  # float32, normalized
        self.indices = indices  # int32 column ids
        self.indptr = indptr  # int64, len nrows+1
        self.nrows = len(indptr) - 1
        self._by_col = None

    # --- persistence ------------------------------------------------------
    def to_arrays(self) -> dict[str, np.ndarray]:
        return {"data": self.data, "indices": self.indices, "indptr": self.indptr}

    @classmethod
    def from_arrays(cls, arrays) -> "SparseIndex":
        return cls(
            np.asarray(arrays["data"], dtype=np.float32),
            np.asarray(arrays["indices"], dtype=np.int32),
            np.asarray(arrays["indptr"], dtype=np.int64),
        )

    @property
    def nnz(self) -> int:
        return len(self.data)

    # --- inverted view ----------------------------------------------------
    def by_col(self):
        """(col_indptr[SIZE+1], rows, vals) sorted by column — the CSC view
        used as the gather side of the inverted-index matmul."""
        if self._by_col is None:
            order = np.argsort(self.indices, kind="stable")
            rows = np.repeat(
                np.arange(self.nrows, dtype=np.int64), np.diff(self.indptr)
            )[order]
            vals = self.data[order]
            counts = np.bincount(self.indices, minlength=SIZE)
            col_indptr = np.zeros(SIZE + 1, dtype=np.int64)
            np.cumsum(counts, out=col_indptr[1:])
            self._by_col = (col_indptr, rows, vals)
        return self._by_col

    def row_keys(self) -> list[bytes]:
        """Content key per row (duplicate-row elimination on merge,
        vstack.rs:10-47)."""
        keys = []
        for i in range(self.nrows):
            lo, hi = self.indptr[i], self.indptr[i + 1]
            keys.append(self.indices[lo:hi].tobytes() + self.data[lo:hi].tobytes())
        return keys


def build_index(token_lines, cache: _WordCache | None = None) -> SparseIndex:
    """Token strings -> normalized CSR (FeaturesMatrixBuilder,
    index.rs:104-148 + create_mat index.rs:161-171)."""
    cache = cache or _GLOBAL_CACHE
    lookup = cache.lookup
    n = len(token_lines)
    indptr = np.zeros(n + 1, dtype=np.int64)
    all_cols: list[np.ndarray] = []
    all_vals: list[np.ndarray] = []
    for i, tokens in enumerate(token_lines):
        pairs = [lookup(w) for w in tokens.split(" ")]
        cols = np.fromiter((p[0] for p in pairs), dtype=np.int32, count=len(pairs))
        vals = np.fromiter((p[1] for p in pairs), dtype=np.float32, count=len(pairs))
        # stable-sort + drop duplicate columns keeping the first word in line
        # order (index.rs:196-206); np.unique return_index = first occurrence
        ucols, first = np.unique(cols, return_index=True)
        # values are ±1 → the L2 norm is sqrt(nnz) (index.rs:137)
        norm = np.float32(np.sqrt(len(ucols))) if len(ucols) else np.float32(1.0)
        all_cols.append(ucols)
        all_vals.append(vals[first] / norm)
        indptr[i + 1] = indptr[i] + len(ucols)
    if all_cols:
        indices = np.concatenate(all_cols)
        data = np.concatenate(all_vals).astype(np.float32, copy=False)
    else:
        indices = np.zeros(0, dtype=np.int32)
        data = np.zeros(0, dtype=np.float32)
    return SparseIndex(data, indices, indptr)


def empty_index() -> SparseIndex:
    return SparseIndex(
        np.zeros(0, dtype=np.float32),
        np.zeros(0, dtype=np.int32),
        np.zeros(1, dtype=np.int64),
    )


def distances(baselines: SparseIndex | None, targets: SparseIndex) -> np.ndarray:
    """Min cosine distance of each target row to the baseline rows
    (cosine_distance_chunk, index.rs:85-102,173-181).

    float32, len = targets.nrows; 1.0 where a target shares no column with
    any baseline row.  Targets are processed in CHUNK_SIZE slices to bound
    the intermediate pair arrays.
    """
    n = targets.nrows
    out = np.empty(n, dtype=np.float32)
    if n == 0:
        return out
    if baselines is None or baselines.nrows == 0:
        out.fill(1.0)
        return out
    nb = baselines.nrows
    t_indptr = targets.indptr
    b_indptr = baselines.indptr
    for start in range(0, n, CHUNK_SIZE):
        stop = min(start + CHUNK_SIZE, n)
        nt = stop - start
        lo, hi = t_indptr[start], t_indptr[stop]
        td = targets.indices[lo:hi]
        tv = targets.data[lo:hi]
        ti = np.repeat(
            np.arange(nt, dtype=np.int64), np.diff(t_indptr[start : stop + 1])
        )
        # compact vocabulary: only columns present in this target chunk can
        # contribute; T is dense (nt × V) over that vocabulary
        vocab, inv = np.unique(td, return_inverse=True)
        T = np.zeros((nt, vocab.size), dtype=np.float32)
        T[ti, inv] = tv
        best = np.zeros(nt, dtype=np.float32)
        for bstart in range(0, nb, CHUNK_SIZE):
            bstop = min(bstart + CHUNK_SIZE, nb)
            blo, bhi = b_indptr[bstart], b_indptr[bstop]
            bi = np.repeat(
                np.arange(bstop - bstart, dtype=np.int64),
                np.diff(b_indptr[bstart : bstop + 1]),
            )
            bcols = baselines.indices[blo:bhi]
            pos = np.searchsorted(vocab, bcols)
            pos_c = np.minimum(pos, vocab.size - 1)
            mask = vocab[pos_c] == bcols
            B = np.zeros((bstop - bstart, vocab.size), dtype=np.float32)
            B[bi[mask], pos_c[mask]] = baselines.data[blo:bhi][mask]
            # one BLAS GEMM per (target chunk × baseline chunk) — the
            # batched-matmul lesson from the reference bench
            # (bench-index.rs:21-35: chunked matmul ≈56× per-line scoring)
            sims = T @ B.T
            np.maximum(best, sims.max(axis=1), out=best)
        # distance = 1 - max(0, best similarity); 1.0 when no overlap
        out[start:stop] = np.float32(1.0) - np.maximum(best, np.float32(0.0))
    return out


def merge_indexes(mats: list[SparseIndex]) -> SparseIndex:
    """Monoidal merge dropping duplicate rows — the distributed combiner for
    salted / partial index builds (nub_vstack vstack.rs:10-47;
    Index::mappend model.rs:118-156)."""
    mats = [m for m in mats if m is not None and m.nrows]
    if not mats:
        return empty_index()
    if len(mats) == 1:
        return mats[0]
    data = np.concatenate([m.data for m in mats])
    indices = np.concatenate([m.indices for m in mats])
    nrows = sum(m.nrows for m in mats)
    indptr = np.zeros(nrows + 1, dtype=np.int64)
    pos, off = 1, 0
    for m in mats:
        indptr[pos : pos + m.nrows] = m.indptr[1:] + off
        off += m.indptr[-1]
        pos += m.nrows
    stacked = SparseIndex(data, indices, indptr)
    seen: set[bytes] = set()
    keep: list[int] = []
    for i, key in enumerate(stacked.row_keys()):
        if key not in seen:
            seen.add(key)
            keep.append(i)
    if len(keep) == stacked.nrows:
        return stacked
    return _take_rows(stacked, np.asarray(keep, dtype=np.int64))


def _take_rows(mat: SparseIndex, rows: np.ndarray) -> SparseIndex:
    lens = (mat.indptr[rows + 1] - mat.indptr[rows]).astype(np.int64)
    indptr = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(lens, out=indptr[1:])
    total = int(indptr[-1])
    flat = np.arange(total, dtype=np.int64) - np.repeat(
        indptr[:-1], lens
    ) + np.repeat(mat.indptr[rows], lens)
    return SparseIndex(mat.data[flat], mat.indices[flat], indptr)
