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


def tokenize_batch(batch: pa.Table, *, max_line_bytes: int = 6000) -> pa.Table:
    """Append tokens/dedup_key/group_key to a batch of turns."""
    texts = batch.column("text").to_pylist()
    tokens: list[str] = []
    keys: list[str] = []
    for raw in texts:
        if raw and len(raw) > max_line_bytes:
            # the reference line iterator caps lines at 6000 bytes
            # (iterator.rs:155-157)
            raw = raw[:max_line_bytes]
        t = process(raw) if raw else ""
        tokens.append(t)
        keys.append(unordered_key(t))
    group = pc.binary_join_element_wise(
        batch.column("role"), batch.column("tool"), GROUP_SEP
    )
    return (
        batch.append_column("tokens", pa.array(tokens, pa.string()))
        .append_column("dedup_key", pa.array(keys, pa.string()))
        .append_column("group_key", group)
    )
