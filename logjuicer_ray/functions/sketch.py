"""Mergeable cardinality sketch: HyperLogLog.

The canonical "count distinct over 100 TB without a shuffle" operator: each
``map_batches`` task folds its rows into a fixed 2^p-register sketch, the
tiny per-block sketches merge with an element-wise max (a commutative,
idempotent monoid — any merge tree, any partitioning, same registers), and
one estimate comes out.  Standard error ≈ 1.04/sqrt(2^p) → ~0.8% at p=14
(16 KiB per sketch).

Hashes are md5-u64 (functions/hashing.py) so the sketch is deterministic
across runs, processes and cluster sizes — two runs over the same data
produce byte-identical registers.

Vectorization: hashing is one ``hashlib.md5`` call per UNIQUE value via a
per-batch Arrow dictionary encode; register updates are
``np.maximum.at``.  Estimation uses the classic bias corrections
(linear counting below 2.5m, the 2^32 correction is irrelevant at 64-bit
hashes and omitted).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..arrow_util import dict_codes
from .hashing import md5_u64_str

__all__ = ["HllSketch", "hll_count_distinct"]


class HllSketch:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def update_hashes(self, hashes: np.ndarray) -> None:
        """Fold unsigned-64 hashes into the registers (vectorized)."""
        if not len(hashes):
            return
        h = hashes.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rho = leading zeros of rest + 1 = 64 - floor(log2(rest)); the OR
        # plants guard bits in the low p positions so rho caps at 64-p+1 and
        # log2 never sees 0.  float64 rounding can flip rho by one for a
        # ~2^-53 sliver of hash space — deterministic and far below the
        # sketch's own error.
        rho = (64 - np.floor(np.log2(rest.astype(np.float64))).astype(np.int64)).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    def merge(self, other: "HllSketch") -> "HllSketch":
        if other.p != self.p:
            raise ValueError("incompatible precisions")
        return HllSketch(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        raw = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting
        return raw

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, p: int = 14) -> "HllSketch":
        return cls(p, np.frombuffer(data, dtype=np.uint8).copy())


def _batch_sketch(batch: pa.Table, *, column: str, p: int) -> pa.Table:
    codes, uniq = dict_codes(batch.column(column))
    sk = HllSketch(p)
    # one md5 per UNIQUE value in the batch; duplicate rows are free
    hashes = np.fromiter(
        (md5_u64_str(v if v is not None else "") for v in uniq.to_pylist()),
        dtype=np.uint64,
        count=len(uniq),
    )
    sk.update_hashes(hashes)
    return pa.table({"registers": pa.array([sk.to_bytes()], pa.binary())})


def hll_count_distinct(ds, column: str, *, p: int = 14) -> float:
    """Approximate COUNT(DISTINCT column) with one streaming pass.

    Per-block sketches are 2^p bytes; the driver-side merge is bounded by
    blocks × 2^p bytes (a tree reduce drops even that at extreme block
    counts — the monoid makes any merge topology equivalent)."""
    parts = ds.map_batches(
        _batch_sketch, batch_format="pyarrow", fn_kwargs={"column": column, "p": p}
    ).take_all()
    total = HllSketch(p)
    for row in parts:
        total = total.merge(HllSketch.from_bytes(bytes(row["registers"]), p))
    return total.estimate()
