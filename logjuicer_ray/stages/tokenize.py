"""Tokenization stage: raw turn text → LogJuicer token string.

A stateless ``map_batches`` transform over Arrow batches
(``batch_format="pyarrow"``).  The per-line tokenizer (tokenizer.rs:507-585)
is a recursive Python scanner, so the stage's job is to call it as rarely as
possible and keep everything else in Arrow C++ kernels:

1. the text column is byte-capped at 6000 in place (iterator.rs:155-157 —
   the reference iterator truncates the LINE, so tokens, contexts and
   line/byte counters all see the same capped text);
2. digits are folded to a private-use codepoint with one vectorized regex
   replace — the tokenizer's output is invariant to replacing one ASCII
   digit with another at the same position (every classifier treats [0-9]
   as a character class and every surviving literal passes remove_numbers,
   tokenizer.rs:117-123,571-583), so lines differing only in digit values
   share one tokenization;
3. the folded column is dictionary-encoded (C++), ``process()`` runs once
   per *unique* folded line (with a per-worker memo cache on top), and the
   full columns are rebuilt with a vectorized ``take`` — no per-row Python.

Adds columns: ``tokens`` (normalized string), ``dedup_key`` (unordered token
bag, unordered.rs:9-44), ``group_key`` (role/tool, the IndexName analog).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..index_name import GROUP_SEP
from ..tokenizer import process, unordered_key

__all__ = ["tokenize_batch", "truncate_text_column", "TOKEN_COLUMNS"]

TOKEN_COLUMNS = ["tokens", "dedup_key", "group_key"]

# private-use codepoint the digit fold maps to — can never collide with a
# literal character of the text
_FOLD_CHAR = "\ue000"
_CACHE_MAX = 200_000
_token_cache: dict[str, tuple[str, str]] = {}


def truncate_text_column(
    batch: pa.Table, max_bytes: int = 6000, column: str = "text"
) -> pa.Table:
    """Byte-cap the text column like the reference line iterator
    (iterator.rs:155-157).  Vectorized detect; the (rare) long rows are fixed
    in Python — a dangling partial UTF-8 char at the cut is dropped."""
    col = batch.column(column)
    over = pc.greater(pc.binary_length(col), max_bytes)
    if not pc.any(over).as_py():
        return batch
    texts = col.to_pylist()
    for i in np.flatnonzero(over.combine_chunks().to_numpy(zero_copy_only=False)):
        t = texts[i]
        if t is not None:
            texts[i] = t.encode("utf-8", "surrogatepass")[:max_bytes].decode(
                "utf-8", "ignore"
            )
    return batch.set_column(
        batch.schema.get_field_index(column), column, pa.array(texts, pa.string())
    )


def _tokenize_array(text: pa.Array) -> tuple[pa.Array, pa.Array]:
    """(tokens, dedup_key) arrays for one combined string array."""
    folded = pc.replace_substring_regex(
        pc.fill_null(text, ""), pattern="[0-9]", replacement=_FOLD_CHAR
    )
    enc = folded.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False)
    uniq_folded = enc.dictionary.to_pylist()
    # representative raw line per unique folded value (first occurrence);
    # process() is digit-fold-invariant so any representative yields the
    # same tokens
    _, first_pos = np.unique(codes, return_index=True)
    rep_raw = text.take(pa.array(first_pos, pa.int64())).to_pylist()
    cache = _token_cache
    toks_u: list[str] = []
    keys_u: list[str] = []
    for fkey, raw in zip(uniq_folded, rep_raw):
        hit = cache.get(fkey)
        if hit is None:
            if not raw:
                hit = ("", "")
            else:
                t = process(raw)
                hit = (t, unordered_key(t))
            if len(cache) >= _CACHE_MAX:
                cache.clear()
            cache[fkey] = hit
        toks_u.append(hit[0])
        keys_u.append(hit[1])
    idx = pa.array(codes, pa.int32())
    tokens = pc.take(pa.array(toks_u, pa.string()), idx)
    keys = pc.take(pa.array(keys_u, pa.string()), idx)
    return tokens, keys


def tokenize_batch(batch: pa.Table, *, max_line_bytes: int = 6000) -> pa.Table:
    """Append tokens/dedup_key/group_key to a batch of turns (and byte-cap
    the text column itself)."""
    batch = truncate_text_column(batch, max_line_bytes)
    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = (
            text.combine_chunks()
            if text.num_chunks
            else pa.array([], pa.string())
        )
    if isinstance(text, pa.ChunkedArray):  # older pyarrow keeps the wrapper
        text = text.chunk(0)
    tokens, keys = _tokenize_array(text)
    group = pc.binary_join_element_wise(
        pc.fill_null(batch.column("role"), ""),
        pc.fill_null(batch.column("tool"), ""),
        GROUP_SEP,
    )
    return (
        batch.append_column("tokens", tokens)
        .append_column("dedup_key", keys)
        .append_column("group_key", group)
    )
