"""Tokenization stage: raw turn text → LogJuicer token string.

A stateless ``map_batches`` transform over Arrow batches
(``batch_format="pyarrow"``).  The per-line tokenizer is necessarily a Python
loop (recursive word splitting with iterator side effects,
tokenizer.rs:507-585) but regexes are compiled once at module import and the
vectorizer's word→column cache lives per worker process, so the hot path does
no setup work.

Adds columns: ``tokens`` (normalized string), ``dedup_key`` (unordered token
bag, unordered.rs:9-44), ``group_key`` (role/tool, the IndexName analog).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..index_name import GROUP_SEP
from ..tokenizer import process, unordered_key

__all__ = ["tokenize_batch", "TOKEN_COLUMNS"]

TOKEN_COLUMNS = ["tokens", "dedup_key", "group_key"]

# Digit-folded memo cache.  The tokenizer's output is invariant to replacing
# one ASCII digit with another at the same position: every classifier treats
# [0-9] as a character class (is_uid/is_uuid/is_hash/is_base64/... in
# tokenizer.rs) and every literal that reaches the output first passes
# remove_numbers (tokenizer.rs:117-123,571-583), so no raw digit survives.
# Lines that differ only in digit values (timestamps, counters, ips, sizes)
# therefore share one cache entry keyed on the per-char digit-folded line.
# Digits fold to a private-use codepoint so a folded digit can never collide
# with a literal character of the text.
_DIGIT_FOLD = str.maketrans("0123456789", "" * 10)
_CACHE_MAX = 200_000
_token_cache: dict[str, tuple[str, str]] = {}


def tokenize_batch(batch: pa.Table, *, max_line_bytes: int = 6000) -> pa.Table:
    """Append tokens/dedup_key/group_key to a batch of turns."""
    texts = batch.column("text").to_pylist()
    tokens: list[str] = []
    keys: list[str] = []
    cache = _token_cache
    for raw in texts:
        if not raw:
            tokens.append("")
            keys.append("")
            continue
        if len(raw) > max_line_bytes:
            # the reference line iterator caps lines at 6000 bytes
            # (iterator.rs:155-157)
            raw = raw[:max_line_bytes]
        memo_key = raw.translate(_DIGIT_FOLD)
        hit = cache.get(memo_key)
        if hit is None:
            t = process(raw)
            hit = (t, unordered_key(t))
            if len(cache) >= _CACHE_MAX:
                cache.clear()
            cache[memo_key] = hit
        t, k = hit
        tokens.append(t)
        keys.append(k)
    group = pc.binary_join_element_wise(
        pc.fill_null(batch.column("role"), ""),
        pc.fill_null(batch.column("tool"), ""),
        GROUP_SEP,
    )
    return (
        batch.append_column("tokens", pa.array(tokens, pa.string()))
        .append_column("dedup_key", pa.array(keys, pa.string()))
        .append_column("group_key", group)
    )
