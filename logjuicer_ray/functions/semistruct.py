"""Semi-structured extraction: pull typed fields out of a JSON-string
column without a per-row Python parse.

The hot path is a vectorized Arrow RE2 ``extract_regex`` over the raw
string — correct for flat objects whose target field holds a scalar (the
overwhelmingly common event-properties shape).  Rows the fast pattern
cannot resolve (nested objects, escaped keys, absent field) fall back to a
real ``json.loads`` — but only for those rows, so a clean corpus pays zero
Python.  Malformed JSON yields null.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["extract_json_int_batch", "add_json_int"]


def extract_json_int_batch(batch: pa.Table, *, col: str = "props", field: str,
                           out_col: str | None = None) -> pa.Table:
    """Append ``out_col`` (int64) = the integer value of ``field`` in the
    JSON-object column ``col``; null where absent/malformed/non-integer."""
    out_col = out_col or field
    src = batch.column(col)
    src = src.combine_chunks() if isinstance(src, pa.ChunkedArray) else src
    # fast path: top-level "field": <int> (RE2, vectorized) — but only on
    # strings that are provably a FLAT object (exactly one '{'); anything
    # that could nest (the regex can't see depth) routes to the real parser
    pat = '"' + field + '"\\s*:\\s*(?P<v>-?\\d+)\\s*[,}]'
    hit = pc.extract_regex(src, pat)
    flat = pc.equal(pc.count_substring(src, "{"), 1)
    vals = pc.if_else(
        pc.fill_null(flat, False),
        pc.cast(pc.struct_field(hit, "v"), pa.int64()),
        pa.nulls(len(src), pa.int64()),
    )
    # slow path only where the fast path didn't resolve a non-null string
    missed = pc.and_(pc.is_null(vals), pc.is_valid(src))
    if pc.any(missed).as_py():
        idx = pc.indices_nonzero(missed).to_pylist()
        fixes: dict[int, int] = {}
        for i in idx:
            try:
                v = json.loads(src[i].as_py()).get(field)
            except (ValueError, TypeError, AttributeError):
                v = None
            if isinstance(v, bool) or not isinstance(v, int):
                v = None
            if v is not None:
                fixes[i] = v
        if fixes:
            py = vals.to_pylist()
            for i, v in fixes.items():
                py[i] = v
            vals = pa.array(py, pa.int64())
    return batch.append_column(out_col, vals)


def add_json_int(ds, **kw):
    return ds.map_batches(extract_json_int_batch, batch_format="pyarrow", fn_kwargs=kw)
