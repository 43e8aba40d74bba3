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
from .text import split_whitespace

__all__ = ["HllSketch", "hll_count_distinct", "grouped_hll_distinct",
           "heavy_hitters", "histogram_quantiles"]


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


def _mg_trim(counts: dict, k: int) -> dict:
    """Misra-Gries trim: keep at most k-1 entries by subtracting the k-th
    largest weight from all (the mergeable-summaries reduction — every item
    with true frequency > n/k survives any sequence of sum+trim merges)."""
    if len(counts) < k:
        return counts
    cut = sorted(counts.values(), reverse=True)[k - 1]
    return {t: c - cut for t, c in counts.items() if c > cut}


def heavy_hitters(ds, *, text_col: str = "text", k: int = 32):
    """Exact heavy hitters (tokens with frequency > n/k) via a Misra-Gries
    candidate sketch + one exact recount pass:

    1. per-block MG sketches (≤ k-1 weighted rows each) — mergeable monoid,
       like the HLL above; the shuffle moves O(blocks × k) rows;
    2. groupby-sum + driver trim → candidate set (guaranteed ⊇ every token
       with freq > n/k, by the mergeable-summaries bound);
    3. one vectorized ``is_in`` recount pass → EXACT counts for candidates,
       filtered at the n/k threshold — so the approximate sketch yields an
       exactly-verifiable answer.

    Returns a pyarrow Table (token, cnt) sorted by token."""
    import pyarrow.compute as pc

    def _block_sketch(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            split_whitespace(pc.drop_null(batch.column(text_col)))
        )
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = toks.value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        counts = dict(zip(vc.field("values").to_pylist(),
                          vc.field("counts").to_pylist()))
        total = sum(counts.values())
        sk = _mg_trim(counts, k)
        # "" is never a token (filtered above) — safe total-count sentinel
        return pa.table({
            "token": pa.array(list(sk.keys()) + [""], pa.string()),
            "weight": pa.array(list(sk.values()) + [total], pa.int64()),
        })

    rows = (
        ds.map_batches(_block_sketch, batch_format="pyarrow")
        .groupby("token")
        .sum("weight")
        .take_all()
    )  # ≤ vocabulary ∩ (k-1 per block) unique tokens + the "" total row
    total = 0
    merged: dict = {}
    for r in rows:
        if r["token"] == "":
            total = r["sum(weight)"]
        else:
            merged[r["token"]] = r["sum(weight)"]
    candidates = list(_mg_trim(merged, k).keys())
    if not candidates:
        return pa.table({"token": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    cand_arr = pa.array(candidates, pa.string())

    def _recount(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            split_whitespace(pc.drop_null(batch.column(text_col)))
        )
        toks = toks.filter(pc.is_in(toks, value_set=cand_arr))
        vc = toks.value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table({"token": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    exact = ds.map_batches(_recount, batch_format="pyarrow").groupby("token").sum("cnt")
    out = [(r["token"], r["sum(cnt)"]) for r in exact.take_all()
           if r["sum(cnt)"] * k > total]
    out.sort()
    return pa.table({"token": pa.array([t for t, _ in out], pa.string()),
                     "cnt": pa.array([c for _, c in out], pa.int64())})


def _grouped_batch_sketch(batch: pa.Table, *, group_col: str, column: str,
                          p: int) -> pa.Table:
    """One (group, registers) partial per group present in the batch.
    Vectorized: dictionary-encode both columns, md5 once per UNIQUE value
    (never per row), numpy pair-dedup, then one register fold per group."""
    garr = batch.column(group_col)
    garr = garr.combine_chunks() if isinstance(garr, pa.ChunkedArray) else garr
    varr = batch.column(column)
    varr = varr.combine_chunks() if isinstance(varr, pa.ChunkedArray) else varr
    if garr.null_count or varr.null_count:
        # SQL COUNT(DISTINCT) semantics: null values don't count; null
        # groups are dropped
        import pyarrow.compute as pc

        m = pc.and_(pc.is_valid(garr), pc.is_valid(varr))
        garr, varr = garr.filter(m), varr.filter(m)
    if len(garr) == 0:
        return pa.table({group_col: pa.array([], batch.schema.field(group_col).type),
                         "registers": pa.array([], pa.binary())})
    gd, vd = garr.dictionary_encode(), varr.dictionary_encode()
    gc = gd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vc = vd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    nv = max(len(vd.dictionary), 1)
    hashes_u = np.fromiter(
        (md5_u64_str(str(v)) for v in vd.dictionary.to_pylist()),
        dtype=np.uint64, count=len(vd.dictionary),
    )
    upair = np.unique(gc * nv + vc)
    ug, uv = upair // nv, upair % nv
    out_g, out_r = [], []
    for code in np.unique(ug):
        sk = HllSketch(p)
        sk.update_hashes(hashes_u[uv[ug == code]])
        out_g.append(int(code))
        out_r.append(sk.to_bytes())
    return pa.table({
        group_col: gd.dictionary.take(pa.array(out_g, pa.int64())),
        "registers": pa.array(out_r, pa.binary()),
    })


def grouped_hll_distinct(ds, *, group_col: str, column: str, p: int = 12):
    """Approximate per-group COUNT(DISTINCT): the grouped twin of
    :func:`hll_count_distinct` and the scale path next to the exact
    two-stage distinct (functions/corpus.py grouped_distinct) — per-batch
    per-group register partials (2^p bytes each), ONE keyed shuffle of
    sketches (never values), element-wise-max merge per group.

    Returns (group, approx_distinct int64) rows; standard error
    ~1.04/sqrt(2^p) (~1.6% at p=12).  Same registers at any partitioning —
    the merge is a commutative idempotent monoid."""

    from .segments import sorted_group_apply

    def _merge_block(sub: pa.Table, offsets) -> pa.Table:
        n = sub.num_rows
        if n == 0:
            return pa.table({
                group_col: sub.column(group_col),
                "approx_distinct": pa.array([], pa.int64()),
            })
        offsets = np.asarray(offsets, dtype=np.int64)
        m = 1 << p
        regs = np.frombuffer(
            b"".join(bytes(r) for r in sub.column("registers").to_pylist()),
            dtype=np.uint8,
        ).reshape(n, m)
        merged = np.maximum.reduceat(regs, offsets, axis=0)
        # vectorized HllSketch.estimate (same float64 arithmetic per group)
        mf = float(m)
        alpha = 0.7213 / (1.0 + 1.079 / mf)
        inv_sum = np.power(2.0, -merged.astype(np.float64)).sum(axis=1)
        raw = alpha * mf * mf / inv_sum
        zeros = (merged == 0).sum(axis=1)
        lin = mf * np.log(mf / np.maximum(zeros, 1))
        est = np.where((raw <= 2.5 * mf) & (zeros > 0), lin, raw)
        heads = pa.array(offsets, pa.int64())
        return pa.table({
            group_col: sub.column(group_col).take(heads),
            "approx_distinct": pa.array(
                np.round(est).astype(np.int64), pa.int64()),
        })

    parts = ds.select_columns([group_col, column]).map_batches(
        _grouped_batch_sketch, batch_format="pyarrow",
        fn_kwargs={"group_col": group_col, "column": column, "p": p},
    )
    # order_cols empty: register merge is order-independent (monoid)
    return sorted_group_apply(
        parts, key_cols=[group_col], order_cols=[],
        apply_block=_merge_block,
    )


def histogram_quantiles(ds, col: str, qs: list[float], *, bins: int = 4096,
                        lo: int | None = None, hi: int | None = None):
    """Approximate quantiles of an integer column via a MERGEABLE
    equi-width histogram — the fixed-size companion to the exact
    distributed quantiles (functions/corpus.py exact_quantiles) for
    columns whose distinct-value count is NOT bounded (raw ids, prices at
    corpus scale): the shuffle-free partial is always ``bins`` int64
    counters regardless of cardinality.

    Bounds default to a first cheap min/max aggregate pass (two streaming
    passes total; pass explicit ``lo``/``hi`` to skip it).  Rank error is
    bounded by the heaviest bin; the returned value is the UPPER EDGE of
    the bin where the cumulative count reaches ceil(q*n) — within one bin
    width of the exact percentile_disc answer.

    Returns a one-row pyarrow Table with int64 columns ``p<q*100>``
    (matching exact_quantiles' schema for side-by-side comparison).
    """
    import math

    import pyarrow.compute as pc

    if lo is None or hi is None:
        from ray.data.aggregate import Max, Min

        mm = ds.aggregate(Min(col), Max(col))
        lo = int(mm[f"min({col})"]) if lo is None else lo
        hi = int(mm[f"max({col})"]) if hi is None else hi
    width = max((hi - lo + 1) / bins, 1e-12)

    def _partial(batch: pa.Table) -> pa.Table:
        v = pc.drop_null(batch.column(col)).to_numpy(zero_copy_only=False)
        idx = np.clip(((v - lo) / width).astype(np.int64), 0, bins - 1)
        counts = np.bincount(idx, minlength=bins).astype(np.int64)
        return pa.table({"counts": pa.array([counts.tobytes()], pa.binary())})

    parts = ds.map_batches(_partial, batch_format="pyarrow").take_all()
    total = np.zeros(bins, dtype=np.int64)
    for row in parts:
        total += np.frombuffer(bytes(row["counts"]), dtype=np.int64)
    n = int(total.sum())
    cum = np.cumsum(total)
    out: dict[str, list] = {}
    for q in qs:
        target = max(1, math.ceil(q * n))
        b = int(np.searchsorted(cum, target))
        edge = int(math.floor(lo + (b + 1) * width)) if n else None
        out[f"p{int(round(q * 100))}"] = [min(edge, hi) if n else None]
    return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})
