"""Deduplication operators for large-scale training-data pipelines.

All operators are Ray-Data-native: vectorized ``map_batches`` to derive
signatures, then a keyed ``groupby`` to bucket — the only all-to-all moves
signature rows, never full documents.  Winner rule everywhere: the minimum
``id_col`` survives, so results are deterministic at any cluster size.

- exact:    content hash → hash-partitioned first-per-group
- minhash:  k-shingles → minhash signature → banded LSH buckets
- simhash:  64-bit simhash → banded buckets
- ngram:    Jaccard verification of LSH candidate pairs
"""

from __future__ import annotations

from zlib import crc32

import numpy as np
import pyarrow as pa

__all__ = [
    "exact_dedup",
    "content_hashes",
    "minhash_signatures",
    "minhash_lsh_dedup",
    "simhash_signatures",
    "simhash_dedup",
    "ngram_jaccard_pairs",
]

_MERSENNE = (1 << 61) - 1


def content_hashes(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    h = [crc32(t.encode("utf-8", "surrogatepass")) if t else 0 for t in texts]
    return batch.append_column("content_hash", pa.array(h, pa.int64()))


def exact_dedup(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Exact dedup: hash-partition on the content hash, keep the min-id row
    per hash group.  Returns the surviving rows (original columns +
    content_hash)."""

    def keep_min(group: pa.Table) -> pa.Table:
        # min id per DISTINCT text within the hash group: a 32-bit hash
        # collision between two different documents must not drop either
        # (the full text column is already in the group, so text equality
        # is checked, never assumed from the hash)
        ids = group.column(id_col).to_pylist()
        texts = group.column(text_col).to_pylist()
        best: dict[str, int] = {}
        for i, t in enumerate(texts):
            j = best.get(t)
            if j is None or ids[i] < ids[j]:
                best[t] = i
        keep = sorted(best.values())
        if len(keep) == group.num_rows:
            return group
        return group.take(pa.array(keep, pa.int64()))

    hashed = ds.map_batches(
        content_hashes, batch_format="pyarrow", fn_kwargs={"text_col": text_col}
    )
    return hashed.groupby("content_hash").map_groups(keep_min, batch_format="pyarrow")


# --- MinHash ---------------------------------------------------------------

def _shingle_hashes(text: str, k: int) -> np.ndarray:
    data = text.encode("utf-8", "surrogatepass")
    if len(data) <= k:
        return np.array([crc32(data)], dtype=np.uint64)
    # rolling byte k-shingles hashed with crc32 (stable across processes)
    return np.unique(
        np.fromiter(
            (crc32(data[i : i + k]) for i in range(len(data) - k + 1)),
            dtype=np.uint64,
            count=len(data) - k + 1,
        )
    )


class MinHasher:
    """Stateful batch mapper: the permutation table is built once per worker
    (actor-pool pattern) — (a·x + b) mod p universal hashing."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text or "", self.shingle_k).astype(np.uint64)
        # (num_perm × n_shingles) universal hashes, min over shingles
        vals = (np.outer(self.a, sh) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch.column("text").to_pylist()]
        return batch.append_column(
            "minhash", pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64()))
        )


def minhash_signatures(ds, *, num_perm: int = 64, shingle_k: int = 5):
    return ds.map_batches(
        MinHasher(num_perm=num_perm, shingle_k=shingle_k),
        batch_format="pyarrow",
        batch_size=1024,
    )


def _explode_bands(batch: pa.Table, *, bands: int, id_col: str) -> pa.Table:
    ids = batch.column(id_col).to_pylist()
    sigs = batch.column("minhash").to_pylist()
    out_ids, out_band, out_hash = [], [], []
    for i, sig in enumerate(sigs):
        rows_per_band = len(sig) // bands
        for b in range(bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            h = crc32(np.asarray(chunk, dtype=np.uint64).tobytes())
            out_ids.append(ids[i])
            out_band.append(b)
            out_hash.append(h)
    return pa.table(
        {
            id_col: pa.array(out_ids),
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.int64()),
        }
    )


def minhash_lsh_dedup(
    ds,
    *,
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
):
    """MinHash-LSH near-dup candidates: shingle → minhash → band →
    ``groupby(band, band_hash)``.  Returns (id, dup_of) pairs where
    ``dup_of`` is the minimum id sharing a band bucket — a one-round
    min-label approximation of the connected components (iterate label
    propagation for exact components; at 10^12 scale that is a handful of
    tiny extra shuffles over the pair list)."""
    sigs = minhash_signatures(ds, num_perm=num_perm, shingle_k=shingle_k)
    bands_ds = sigs.select_columns([id_col, "minhash"]).map_batches(
        _explode_bands, batch_format="pyarrow", fn_kwargs={"bands": bands, "id_col": id_col}
    )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column(id_col).to_pylist()))
        root = ids[0]
        dups = [i for i in ids if i != root]
        return pa.table(
            {
                id_col: pa.array(dups, group.column(id_col).type),
                "dup_of": pa.array([root] * len(dups), group.column(id_col).type),
            }
        )

    pairs = bands_ds.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pyarrow"
    )

    # one id may appear in several buckets: keep its minimum dup_of
    def min_dup(group: pa.Table) -> pa.Table:
        dups = group.column("dup_of").to_pylist()
        return group.slice(int(np.argmin(dups)), 1)

    return pairs.groupby(id_col).map_groups(min_dup, batch_format="pyarrow")


# --- SimHash ---------------------------------------------------------------

def _token_hashes(text: str) -> np.ndarray:
    return np.fromiter(
        (crc32(w.encode("utf-8", "surrogatepass")) for w in (text or "").split()),
        dtype=np.uint64,
    )


def simhash64(text: str) -> int:
    """64-bit simhash over whitespace tokens (two crc32 halves)."""
    toks = (text or "").split()
    if not toks:
        return 0
    h1 = np.fromiter((crc32(w.encode()) for w in toks), dtype=np.uint64)
    h2 = np.fromiter((crc32((w + "#").encode()) for w in toks), dtype=np.uint64)
    h = (h1 << np.uint64(32)) | h2
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    return int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def simhash_signatures(ds, *, text_col: str = "text"):
    def add(batch: pa.Table) -> pa.Table:
        sigs = [simhash64(t) for t in batch.column(text_col).to_pylist()]
        return batch.append_column(
            "simhash", pa.array(np.array(sigs, dtype=np.uint64).view(np.int64), pa.int64())
        )

    return ds.map_batches(add, batch_format="pyarrow")


def simhash_dedup(ds, *, id_col: str = "doc_id", band_bits: int = 16):
    """Near-dup candidates via simhash bands: documents sharing any 16-bit
    band of their simhash bucket together; min id per bucket is the root."""
    sigs = simhash_signatures(ds).select_columns([id_col, "simhash"])

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        h = np.asarray(batch.column("simhash").to_pylist(), dtype=np.int64).view(np.uint64)
        n_bands = 64 // band_bits
        out_i, out_b, out_h = [], [], []
        for b in range(n_bands):
            part = (h >> np.uint64(b * band_bits)) & np.uint64((1 << band_bits) - 1)
            out_i.extend(ids)
            out_b.extend([b] * len(ids))
            out_h.extend(part.astype(np.int64).tolist())
        return pa.table(
            {
                id_col: pa.array(out_i, batch.column(id_col).type),
                "band": pa.array(out_b, pa.int32()),
                "band_hash": pa.array(out_h, pa.int64()),
            }
        )

    bands_ds = sigs.map_batches(explode, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column(id_col).to_pylist()))
        dups = ids[1:]
        return pa.table(
            {
                id_col: pa.array(dups, group.column(id_col).type),
                "dup_of": pa.array([ids[0]] * len(dups), group.column(id_col).type),
            }
        )

    pairs = bands_ds.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pyarrow"
    )

    def min_dup(group: pa.Table) -> pa.Table:
        dups = group.column("dup_of").to_pylist()
        return group.slice(int(np.argmin(dups)), 1)

    return pairs.groupby(id_col).map_groups(min_dup, batch_format="pyarrow")


# --- n-gram Jaccard verification ------------------------------------------

def ngram_jaccard(a: str, b: str, *, k: int = 5) -> float:
    sa = set(_shingle_hashes(a, k).tolist())
    sb = set(_shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def ngram_jaccard_pairs(ds, pairs_ds, *, id_col: str = "doc_id", k: int = 5,
                        threshold: float = 0.8):
    """Verify LSH candidate pairs with exact shingle Jaccard.  The documents
    for both sides of each pair are fetched via a broadcast of the (small)
    candidate id set — candidates are rare relative to the corpus."""
    import ray

    wanted = set()
    pairs = pairs_ds.to_pandas()
    wanted.update(pairs[id_col])
    wanted.update(pairs["dup_of"])
    wanted_ref = ray.put(wanted)

    def pick(batch: pa.Table) -> pa.Table:
        w = ray.get(wanted_ref)
        ids = batch.column(id_col).to_pylist()
        mask = pa.array([i in w for i in ids], pa.bool_())
        return batch.filter(mask)

    docs = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    texts = dict(zip(docs[id_col], docs["text"]))
    rows = []
    for _, r in pairs.iterrows():
        j = ngram_jaccard(texts.get(r[id_col], ""), texts.get(r["dup_of"], ""), k=k)
        if j >= threshold:
            rows.append((r[id_col], r["dup_of"], j))
    return pa.table(
        {
            id_col: pa.array([r[0] for r in rows]),
            "dup_of": pa.array([r[1] for r in rows]),
            "jaccard": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
