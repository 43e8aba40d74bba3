"""Portable 64-bit content hashes.

md5-derived (first 8 bytes of the digest, big-endian) so every hash the
dedup/fingerprint operators emit can be recomputed by an external SQL
engine (DuckDB: ``('0x' || substr(md5(s), 1, 16))::UBIGINT``) — the
operators' oracles are therefore hard value checks, not rows-only.
"""

from __future__ import annotations

import hashlib

__all__ = ["md5_u64", "md5_u64_str", "u64_to_i64", "TokenHasher"]

_MASK64 = (1 << 64) - 1


def md5_u64(data: bytes) -> int:
    """First 16 hex chars of md5 as an unsigned 64-bit int."""
    return int.from_bytes(hashlib.md5(data).digest()[:8], "big")


def md5_u64_str(s: str) -> int:
    return md5_u64(s.encode("utf-8", "surrogatepass"))


def u64_to_i64(v: int) -> int:
    """Two's-complement view (Arrow int64-friendly)."""
    return v - (1 << 64) if v >= (1 << 63) else v


class TokenHasher:
    """Memoized per-worker token → md5-u64 map (tokens repeat heavily)."""

    def __init__(self, max_size: int = 500_000):
        self._cache: dict[str, int] = {}
        self._max = max_size

    def __call__(self, token: str) -> int:
        h = self._cache.get(token)
        if h is None:
            h = md5_u64_str(token)
            if len(self._cache) >= self._max:
                self._cache.clear()
            self._cache[token] = h
        return h


def splitmix64(x):
    """Vectorized SplitMix64 finalizer (public domain, Steele et al. 2014)
    over a uint64 numpy array — the one canonical copy (MinHash shingles,
    fast hash sampling, and bloom hashing all share it)."""
    import numpy as np

    z = np.asarray(x, dtype=np.uint64).copy()
    with np.errstate(over="ignore"):  # mod-2^64 wraparound is the function
        z += np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z
