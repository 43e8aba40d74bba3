"""Format-aware log-line framing — the reference's ``BytesLines``
iterator re-expressed as one vectorized pass over whole entry payloads
(crates/iterator/src/iterator.rs:150-346, dispatch
crates/model/src/source.rs:28-48).

The reference frames lines with FOUR separator kinds:

- ``NewLine`` — a real ``\\n`` (len 1); the only kind that advances the
  line counter for the following slice.
- ``SubLine`` — a LITERAL backslash-n embedded in a one-liner command
  output (len 2, split before the backslash; the escape state machine
  means ``\\\\n`` — escaped backslash then n — does NOT split, and an
  escaped real newline does not split either).
- ``Json`` — for ``.json`` logs, every scalar separator ``, [ ] { }``
  OUTSIDE a string literal splits (len 1); string state toggles on
  unescaped quotes.
- ``Xml`` — for ``.xml`` logs, a ``<`` immediately following ``>``
  splits between the two characters (len 0 — both stay).

plus the ansible marker ``", "stdout_lines": [`` which acts as a
``NewLine`` in EVERY mode (iterator.rs:330-333), and a 6000-byte line
cap: an over-long line is DROPPED entirely, not truncated
(iterator.rs:210-225 steps I/J), while still counting toward line
numbers.

Scale shape: the reference scans byte-by-byte in Rust; a Python port of
that loop would be ~1 MB/s.  Here the separator positions are computed
with numpy boolean algebra over the whole payload — backslash-run
parity for the escape state, a quote-parity cumsum for the JSON
in-string state, one shifted compare for ``><`` — and only the O(lines)
emit loop is Python.  Pure-text payloads with no backslashes or ansible
markers short-circuit to a single ``bytes.split``.

One deliberate divergence: the reference scans in 8192-byte chunks and
an ansible marker or escape pair spanning a chunk boundary is missed
(`find_next_line` resumes at ``prev_pos`` past the already-scanned
prefix); whole-payload scanning has no boundary to miss.
"""

from __future__ import annotations

import numpy as np

__all__ = ["ANSIBLE_MARKER", "MAX_LINE_LENGTH", "file_type_for",
           "split_log_lines", "split_log_text"]

#: iterator.rs:329-333 — matched at the current scan position in every mode
ANSIBLE_MARKER = b'", "stdout_lines": ['

#: iterator.rs:156 — lines longer than this are dropped (not truncated)
MAX_LINE_LENGTH = 6000

_NL, _SUB, _XML, _JSON = 0, 1, 2, 3

_JSON_SEP_BYTES = np.frombuffer(b",[]{}", np.uint8)


def file_type_for(path: str) -> str:
    """source.rs:36-44: ``.json``/``.json.gz`` → json, ``.xml``/
    ``.xml.gz`` → xml, everything else text (journal payloads dispatch
    before this, as in LinesIterator::new)."""
    if path.endswith((".json", ".json.gz")):
        return "json"
    if path.endswith((".xml", ".xml.gz")):
        return "xml"
    return "text"


def _escaped_mask(arr: np.ndarray) -> np.ndarray:
    """``escaped[i]`` — the run of consecutive backslashes immediately
    before position i has odd length (the Rust escape flag is set by a
    backslash only when not itself escaped, and consumed by the next
    char)."""
    bs = arr == 0x5C  # '\\'
    n = len(arr)
    escaped = np.zeros(n, bool)
    if not bs.any():
        return escaped
    cum = np.cumsum(bs.astype(np.int64))
    reset = np.where(~bs, cum, 0)
    run = cum - np.maximum.accumulate(reset)
    escaped[1:] = (run[:-1] & 1).astype(bool)
    return escaped


def split_log_lines(data: bytes, *, file_type: str = "text",
                    max_line_length: int = MAX_LINE_LENGTH):
    """Frame ``data`` into ``[(line_bytes, line_number), ...]`` with the
    reference's separator, escape, line-count, empty-skip and
    over-length-drop semantics (golden cases iterator.rs:352-442)."""
    n = len(data)
    if n == 0:
        return []
    has_marker = ANSIBLE_MARKER in data
    if file_type == "text" and not has_marker and b"\\" not in data:
        # fast path: every separator is a real newline
        out = []
        for i, ln in enumerate(data.split(b"\n")):
            if ln and len(ln) <= max_line_length:
                out.append((ln, i + 1))
        return out

    arr = np.frombuffer(data, np.uint8)
    escaped = _escaped_mask(arr)

    marker_pos: list[int] = []
    if has_marker:
        at = data.find(ANSIBLE_MARKER)
        while at != -1:
            if not escaped[at]:
                marker_pos.append(at)
            at = data.find(ANSIBLE_MARKER, at + 1)

    pos_parts = [np.flatnonzero((arr == 0x0A) & ~escaped)]  # '\n'
    kind_parts = [np.full(len(pos_parts[0]), _NL, np.int8)]
    if marker_pos:
        pos_parts.append(np.asarray(marker_pos, np.int64))
        kind_parts.append(np.full(len(marker_pos), _NL, np.int8))
    sub = np.flatnonzero((arr == 0x6E) & escaped)  # escaped 'n'
    pos_parts.append(sub)
    kind_parts.append(np.full(len(sub), _SUB, np.int8))
    if file_type == "xml":
        xml = np.flatnonzero(
            (arr[1:] == 0x3C) & (arr[:-1] == 0x3E) & ~escaped[1:]
        ) + 1  # '<' after '>'
        pos_parts.append(xml)
        kind_parts.append(np.full(len(xml), _XML, np.int8))
    elif file_type == "json":
        quote = (arr == 0x22) & ~escaped  # '"'
        if marker_pos:
            # the quote OPENING an ansible marker fires the NewLine arm
            # first in the Rust chain, so it never toggles string state
            quote[np.asarray(marker_pos, np.int64)] = False
        toggles = np.cumsum(quote.astype(np.int64))
        in_str = np.zeros(n, bool)
        in_str[1:] = (toggles[:-1] & 1).astype(bool)
        jsep = np.flatnonzero(
            np.isin(arr, _JSON_SEP_BYTES) & ~escaped & ~in_str
        )
        pos_parts.append(jsep)
        kind_parts.append(np.full(len(jsep), _JSON, np.int8))

    pos = np.concatenate(pos_parts)
    kinds = np.concatenate(kind_parts)
    order = np.argsort(pos, kind="stable")
    pos, kinds = pos[order], kinds[order]

    out = []
    line_no, last_nl, start = 0, True, 0
    for p, k in zip(pos.tolist(), kinds.tolist()):
        if k == _SUB:
            end, nxt = p - 1, p + 1
        elif k == _XML:
            end, nxt = p, p
        else:
            end, nxt = p, p + 1
        if last_nl:
            line_no += 1
        last_nl = k == _NL
        seg = data[start:end]
        start = nxt
        if seg and len(seg) <= max_line_length:
            out.append((seg, line_no))
    if start < n:
        if last_nl:
            line_no += 1
        seg = data[start:]
        if len(seg) <= max_line_length:
            out.append((seg, line_no))
    return out


def split_log_text(data: bytes, *, file_type: str = "text",
                   max_line_length: int = MAX_LINE_LENGTH) -> list[str]:
    """Line texts only (lossy UTF-8), the shape ``_entry_rows`` feeds
    into turns-schema rows."""
    return [
        seg.decode("utf-8", errors="replace")
        for seg, _no in split_log_lines(
            data, file_type=file_type, max_line_length=max_line_length
        )
    ]
