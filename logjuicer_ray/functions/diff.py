"""Keyed dataset diff — added / removed / changed classification between
two corpus versions.

The data-ops primitive behind incremental curation: given version A and
version B of a keyed table, emit one row per key whose content differs
(``changed``), exists only in A (``removed``) or only in B (``added``).
Unchanged keys are dropped (at corpus scale they are ~all of the data).

Scale shape: each side is first REDUCED to (key, content_digest) inside
``map_batches`` — the full content never enters the wide exchange; the
classification is one native full-outer hash join on the key plus a
vectorized CASE.  Dual-mode digest (the same contract as MinHash and
hash_sample): ``fast`` is a vectorized 64-bit hash with no Python per
row (the default — both sides hash within one job, so only
within-version determinism is required); ``md5`` is the
cross-version-stable 128-bit hex for diffing against persisted digests.
Either way the compare is per-key — unlike grouping-by-hash (exact
dedup, functions/dedup.py:44-69, which verifies text in-group), a
same-key collision needs that single key's two texts to collide
(~2^-64 / ~2^-128), so the digest IS the cheap and sufficient
certificate.

No reference analog (the logjuicer reference diffs nothing; its nearest
concept is model staleness detection, crates/web-service/src/worker.rs:
463-493) — extends the engine for training-data pipeline ops.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["dataset_diff"]


def _digest_side(ds, key_col: str, compare_cols: list[str], out: str,
                 digest: str):
    def _digest(batch: pa.Table) -> pa.Table:
        cols = [pc.fill_null(pc.cast(batch.column(c), pa.string()), "\x00")
                for c in compare_cols]
        joined = cols[0] if len(cols) == 1 else pc.binary_join_element_wise(
            *cols, "\x1f"
        )
        if isinstance(joined, pa.ChunkedArray):
            joined = joined.combine_chunks()
        if digest == "fast":
            # vectorized 64-bit hash (polars, fixed seed): no Python per
            # row.  Deterministic within a run and across processes of one
            # polars version — exactly the lifetime a diff needs, since
            # both sides hash in the same job.  Collisions (~2^-64 per
            # key) only matter for same-key changed-vs-unchanged calls.
            import polars as pl

            hs = pl.from_arrow(joined).hash(seed=0)
            dig = hs.to_arrow().cast(pa.string())
        else:  # "md5": cross-version-stable 128-bit hex
            dig = pa.array(
                [hashlib.md5(s.encode()).hexdigest() for s in joined.to_pylist()],
                pa.string(),
            )
        return pa.table({key_col: batch.column(key_col), out: dig})

    return ds.map_batches(_digest, batch_format="pyarrow")


def dataset_diff(ds_a, ds_b, *, key_col: str, compare_cols: list[str],
                 num_partitions: int = 16, digest: str = "fast"):
    """Diff two keyed Datasets; returns (key, status) rows with status in
    {'added', 'removed', 'changed'}.  Keys must be unique per side.
    ``digest='fast'`` (default) hashes content with a vectorized 64-bit
    hash; ``digest='md5'`` uses the slower cross-version-stable 128-bit
    hex (e.g. when one side's digests were persisted by an older job)."""
    if digest not in ("fast", "md5"):
        raise ValueError("digest must be 'fast' or 'md5'")
    a = _digest_side(ds_a, key_col, compare_cols, "dig_a", digest)
    b = _digest_side(ds_b, key_col, compare_cols, "dig_b", digest)
    joined = a.join(b, join_type="full_outer", on=(key_col,),
                    num_partitions=num_partitions)

    def _classify(batch: pa.Table) -> pa.Table:
        da, db = batch.column("dig_a"), batch.column("dig_b")
        in_a, in_b = pc.is_valid(da), pc.is_valid(db)
        status = pc.if_else(
            pc.invert(in_b), pa.scalar("removed"),
            pc.if_else(
                pc.invert(in_a), pa.scalar("added"),
                pc.if_else(pc.not_equal(da, db), pa.scalar("changed"),
                           pa.scalar(None, pa.string())),
            ),
        )
        out = pa.table({key_col: batch.column(key_col), "status": status})
        return out.filter(pc.is_valid(status))

    return joined.map_batches(_classify, batch_format="pyarrow")
