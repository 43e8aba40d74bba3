"""Small shared Arrow helpers for the hot stages."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["dict_codes", "to_np"]


def to_np(col) -> np.ndarray:
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return a.to_numpy(zero_copy_only=False)


def dict_codes(col) -> tuple[np.ndarray, pa.Array]:
    """(codes, unique_values) for a string column.

    Accepts plain or dictionary-encoded input.  Dictionary input is NOT
    assumed to have unique values (the tokenize stage's dictionaries are
    keyed on unique folded *lines*; several lines can map to one token
    string), so the dictionary itself is re-encoded — a dictionary-sized
    operation — to guarantee ``unique_values`` is a proper unique set.
    Scoring cost is proportional to len(unique_values), so collapsing
    duplicates here is what keeps the per-batch GEMM at unique-token size.
    """
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(a, pa.ChunkedArray):  # zero-chunk edge
        a = pa.array([], pa.string())
    if pa.types.is_dictionary(a.type):
        inner = a.dictionary.dictionary_encode()
        remap = inner.indices.to_numpy(zero_copy_only=False)
        raw = a.indices.to_numpy(zero_copy_only=False)
        codes = remap[raw] if len(raw) else raw.astype(remap.dtype)
        return codes, inner.dictionary
    enc = a.dictionary_encode()
    return enc.indices.to_numpy(zero_copy_only=False), enc.dictionary
