"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

All are vectorized-per-batch ``map_batches`` transforms over the
``documents`` table (or any text column).  Deterministic, dependency-free.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

__all__ = [
    "split_whitespace",
    "token_count_batch",
    "quality_batch",
    "lang_id_batch",
    "fingerprint_batch",
    "redact_batch",
    "repetition_batch",
    "add_token_counts",
    "add_quality",
    "add_lang_id",
    "add_fingerprints",
    "add_redaction",
    "add_repetition",
    "char_entropy_batch",
    "add_char_entropy",
    "normalize_text_batch",
    "add_normalized_text",
]

def split_whitespace(arr):
    """Whitespace tokenization with DuckDB ``regexp_split('\\s+')``
    parity: collapse ASCII whitespace runs to one space (RE2 replace),
    trim, then split on the exact ``' '`` byte.

    Deliberately NOT ``pc.utf8_split_whitespace``: that kernel was
    observed returning alignment-dependent wrong pieces for
    whitespace-only strings inside Ray workers (pyarrow 16.1:
    ``'   '`` → ``['', ' ']`` under some buffer layouts), which
    poisoned corpus token counts.  The replace + exact-byte
    ``split_pattern`` path is layout-independent, and RE2's ASCII
    ``\\s`` matches the SQL oracles' semantics exactly (the unicode
    split kernel did not).  Empty / whitespace-only strings yield
    ``['']`` — callers filter ``''`` tokens, as before.
    """
    import pyarrow.compute as pc

    collapsed = pc.utf8_trim(
        pc.replace_substring_regex(arr, r"\s+", " "), " "
    )
    return pc.split_pattern(collapsed, " ")


# default PII scrub chain (training-data hygiene): applied IN ORDER, each
# pattern sees the previous pattern's output — identical semantics to a
# nested SQL regexp_replace(..., 'g') chain (RE2 on both sides)
DEFAULT_REDACTIONS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
]

_WS_RE = re.compile(r"\s+")
# BPE-ish word/number/punct splitter (GPT-2-style coarse approximation)
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]")
_PUNCT_RE = re.compile(r"[^\w\s]")
_WORD_RE = re.compile(r"[a-zA-Z']+")

# tiny stopword lists for n-gram-free language ID (heuristic)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "with", "was", "on"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "est", "que", "pour", "dans", "du"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein", "eine", "zu"},
    "es": {"el", "la", "los", "las", "de", "y", "que", "un", "una", "es", "en", "por", "para"},
}


def token_count_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Whitespace token count + BPE-ish sub-token count."""
    texts = batch.column(text_col).to_pylist()
    ws = [len([w for w in _WS_RE.split(t.strip()) if w]) if t and t.strip() else 0 for t in texts]
    bpe = [len(_BPE_RE.findall(t)) if t else 0 for t in texts]
    return batch.append_column("ws_tokens", pa.array(ws, pa.int64())).append_column(
        "bpe_tokens", pa.array(bpe, pa.int64())
    )


def quality_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Heuristic quality features: char length, punct ratio, stopword ratio,
    mean word length, and a composite [0,1] score."""
    texts = batch.column(text_col).to_pylist()
    n_chars, punct_ratio, stop_ratio, mean_wlen, score = [], [], [], [], []
    en_stop = _STOPWORDS["en"]
    for t in texts:
        t = t or ""
        n = len(t)
        n_chars.append(n)
        punct = len(_PUNCT_RE.findall(t))
        pr = punct / n if n else 0.0
        words = _WORD_RE.findall(t.lower())
        sr = sum(w in en_stop for w in words) / len(words) if words else 0.0
        mw = float(np.mean([len(w) for w in words])) if words else 0.0
        punct_ratio.append(pr)
        stop_ratio.append(sr)
        mean_wlen.append(mw)
        # composite: long-enough, some stopwords, sane punctuation & words
        s = 1.0
        s *= min(1.0, n / 200.0)
        s *= min(1.0, sr / 0.2) if sr < 0.2 else 1.0
        s *= max(0.0, 1.0 - max(0.0, pr - 0.2) * 2.0)
        s *= 1.0 if 3.0 <= mw <= 10.0 else 0.5
        score.append(s)
    return (
        batch.append_column("n_chars_q", pa.array(n_chars, pa.int64()))
        .append_column("punct_ratio", pa.array(punct_ratio, pa.float64()))
        .append_column("stopword_ratio", pa.array(stop_ratio, pa.float64()))
        .append_column("mean_word_len", pa.array(mean_wlen, pa.float64()))
        .append_column("quality", pa.array(score, pa.float64()))
    )


def lang_id_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Stopword-vote language ID over {en, fr, de, es}; 'und' when no
    stopword of any language appears."""
    texts = batch.column(text_col).to_pylist()
    langs = []
    for t in texts:
        words = _WORD_RE.findall((t or "").lower())
        best_lang, best = "und", 0
        for lang, stops in _STOPWORDS.items():
            v = sum(w in stops for w in words)
            if v > best:
                best, best_lang = v, lang
        langs.append(best_lang)
    return batch.append_column("lang_id", pa.array(langs, pa.string()))


def fingerprint_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Document fingerprints over the normalized (lowercase,
    whitespace-collapsed) text: a whole-document md5-u64 hash plus a
    winnowed 4-gram min-hash robust to local edits.  md5-derived so an
    external SQL engine can recompute both columns (functions/hashing.py)."""
    from .hashing import md5_u64_str, u64_to_i64

    texts = batch.column(text_col).to_pylist()
    fp, winnow = [], []
    for t in texts:
        norm = _WS_RE.sub(" ", (t or "").lower()).strip()
        doc_h = u64_to_i64(md5_u64_str(norm))
        fp.append(doc_h)
        words = norm.split(" ")
        if len(words) >= 4:
            winnow.append(
                u64_to_i64(
                    min(
                        md5_u64_str(" ".join(words[i : i + 4]))
                        for i in range(len(words) - 3)
                    )
                )
            )
        else:
            winnow.append(doc_h)
    return batch.append_column("fingerprint", pa.array(fp, pa.int64())).append_column(
        "winnow_fp", pa.array(winnow, pa.int64())
    )


def redact_batch(batch: pa.Table, *, patterns: list[tuple[str, str, str]] | None = None,
                 text_col: str = "text", out_col: str = "redacted") -> pa.Table:
    """Sequential regex redaction (PII scrub): for each (label, pattern,
    replacement) in order, count the non-overlapping RE2 matches in the
    CURRENT text (as ``n_<label>``) then replace them all — so later
    patterns never re-match inside earlier replacements, exactly like a
    nested SQL ``regexp_replace(..., 'g')`` chain.

    Fully vectorized: ``pc.count_substring_regex`` +
    ``pc.replace_substring_regex`` (Arrow RE2 kernels); no Python per row."""
    import pyarrow.compute as pc

    cur = batch.column(text_col)
    for label, pat, repl in (patterns if patterns is not None else DEFAULT_REDACTIONS):
        batch = batch.append_column(
            f"n_{label}", pc.cast(pc.count_substring_regex(cur, pat), pa.int64())
        )
        cur = pc.replace_substring_regex(cur, pat, repl)
    return batch.append_column(out_col, cur)


def add_redaction(ds, **kw):
    return ds.map_batches(redact_batch, batch_format="pyarrow", fn_kwargs=kw)


def repetition_batch(batch: pa.Table, *, id_col: str = "doc_id",
                     text_col: str = "text") -> pa.Table:
    """Gopher-style repetition signals per document, as EXACT integer
    counts (consumers derive the published fractions; integers hash-match
    SQL bit-for-bit):

    - ``n_words`` / ``n_distinct_words``: whitespace tokens and their
      per-doc distinct count (duplicate-word fraction = 1 - distinct/n)
    - ``top_word_cnt``: occurrences of the most frequent word (top-1-gram
      fraction = top_word_cnt / n_words)
    - ``n_bigrams`` / ``n_distinct_bigrams``: adjacent word pairs
      (duplicate-2-gram fraction = 1 - distinct/n)

    Fully vectorized: one Arrow whitespace split + dictionary-encode, then
    numpy ``bincount`` / ``unique`` / ``maximum.at`` over integer codes —
    no Python per row or per word.
    """
    import numpy as np
    import pyarrow.compute as pc

    n_rows = len(batch)
    texts = pc.fill_null(batch.column(text_col), "")
    lists = split_whitespace(texts)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    mask = pc.not_equal(flat, "")
    flat = flat.filter(mask)
    par = parents.filter(mask).to_numpy(zero_copy_only=False).astype(np.int64)
    de = flat.dictionary_encode()
    if isinstance(de, pa.ChunkedArray):
        de = de.combine_chunks()
    codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    v = max(int(len(de.dictionary)), 1)

    n_words = np.bincount(par, minlength=n_rows)
    uk, cnts = np.unique(par * v + codes, return_counts=True)
    upar = uk // v
    n_distinct = np.bincount(upar, minlength=n_rows)
    top_cnt = np.zeros(n_rows, dtype=np.int64)
    np.maximum.at(top_cnt, upar, cnts)

    adj = par[1:] == par[:-1]
    big_par = par[1:][adj]
    bigkey = codes[:-1][adj] * v + codes[1:][adj]
    n_bigrams = np.bincount(big_par, minlength=n_rows)
    ubk = np.unique(big_par * (v * v) + bigkey)
    n_distinct_bigrams = np.bincount(ubk // (v * v), minlength=n_rows)

    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_words": pa.array(n_words, pa.int64()),
            "n_distinct_words": pa.array(n_distinct, pa.int64()),
            "top_word_cnt": pa.array(top_cnt, pa.int64()),
            "n_bigrams": pa.array(n_bigrams, pa.int64()),
            "n_distinct_bigrams": pa.array(n_distinct_bigrams, pa.int64()),
        }
    )


def add_repetition(ds, **kw):
    return ds.map_batches(repetition_batch, batch_format="pyarrow", fn_kwargs=kw)


def add_token_counts(ds, **kw):
    return ds.map_batches(token_count_batch, batch_format="pyarrow", fn_kwargs=kw)


def add_quality(ds, **kw):
    return ds.map_batches(quality_batch, batch_format="pyarrow", fn_kwargs=kw)


def add_lang_id(ds, **kw):
    return ds.map_batches(lang_id_batch, batch_format="pyarrow", fn_kwargs=kw)


def add_fingerprints(ds, **kw):
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow", fn_kwargs=kw)


def char_entropy_batch(batch: pa.Table, *, id_col: str = "doc_id",
                       text_col: str = "text",
                       round_digits: int = 4) -> pa.Table:
    """Per-document Shannon entropy over characters (nats) — the classic
    gibberish / binary-spill / single-char-spam signal: natural text sits
    ~2.5-4.5, base64 blobs and padded junk sit far outside.  Codepoint
    counting per doc is a numpy ``unique`` over the utf-32 view (no
    per-char Python).  Docs with NULL or empty text emit no row (the SQL
    unnest produces no rows for them).
    """
    import numpy as np

    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    out_id, out_e = [], []
    for doc_id, t in zip(ids, texts):
        if not t:
            continue
        cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
        counts = np.unique(cp, return_counts=True)[1].astype(np.float64)
        p = counts / counts.sum()
        out_id.append(doc_id)
        out_e.append(round(float(-(p * np.log(p)).sum()), round_digits))
    return pa.table({
        id_col: pa.array(out_id, pa.int64()),
        "char_entropy": pa.array(out_e, pa.float64()),
    })


def add_char_entropy(ds, **kw):
    return ds.map_batches(
        lambda b: char_entropy_batch(b, **kw), batch_format="pyarrow"
    )


def normalize_text_batch(batch: pa.Table, *, id_col: str = "doc_id",
                         text_col: str = "text") -> pa.Table:
    """CCNet-style text normalization for dedup keys (Wenzek et al. 2020,
    arXiv:1911.00359 §4.1, simplified to the RE2/SQL-mirrorable core):
    lowercase, every ASCII digit → ``0``, whitespace runs collapsed to one
    space, trimmed.  Fully vectorized Arrow kernels — no per-row Python.
    Returns (id, norm_text, n_chars_norm)."""
    import pyarrow.compute as pc

    t = pc.fill_null(batch.column(text_col), "")
    t = pc.utf8_lower(t)
    t = pc.replace_substring_regex(t, "[0-9]", "0")
    t = pc.utf8_trim(pc.replace_substring_regex(t, r"\s+", " "), " ")
    return pa.table({
        id_col: batch.column(id_col),
        "norm_text": t,
        "n_chars_norm": pc.utf8_length(t).cast(pa.int64()),
    })


def add_normalized_text(ds, **kw):
    return ds.map_batches(
        lambda b: normalize_text_batch(b, **kw), batch_format="pyarrow"
    )


# -------------------------------------------------------------- markup strip

_ENTITY_MAP = (
    # named entities first; ampersand LAST so "&amp;lt;" decodes to the
    # literal "&lt;" (single-pass HTML-unescape semantics)
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def strip_markup_batch(batch: pa.Table, *, id_col: str = "doc_id",
                       text_col: str = "text") -> pa.Table:
    """Markup-to-text extraction — the web-corpus curation step that turns
    crawled HTML into training text: drop ``<script>``/``<style>`` blocks
    INCLUDING their content, drop comments, drop remaining tags, decode
    the standard entities (ampersand last, single-pass semantics), and
    collapse whitespace.  Fully vectorized Arrow RE2 kernels (inline
    ``(?is)`` flags — RE2 has no backreferences, so script and style get
    separate patterns); no per-row Python.  Returns
    ``(id, clean_text, n_chars_clean)``.

    Heuristic by design (like any regex-level extractor): unclosed
    script/style blocks strip to the end of the document, and exotic
    numeric entities pass through — both acceptable for corpus curation
    and exactly mirrorable in the SQL oracle."""
    import pyarrow.compute as pc

    t = pc.fill_null(batch.column(text_col), "")
    t = pc.replace_substring_regex(
        t, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    t = pc.replace_substring_regex(
        t, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    # unclosed blocks strip to end-of-document (never leak JS/CSS into
    # training text)
    t = pc.replace_substring_regex(t, r"(?is)<script\b[^>]*>.*$", " ")
    t = pc.replace_substring_regex(t, r"(?is)<style\b[^>]*>.*$", " ")
    t = pc.replace_substring_regex(t, r"(?s)<!--.*?-->", " ")
    t = pc.replace_substring_regex(t, r"<[^>]*>", " ")
    for src, dst in _ENTITY_MAP:
        t = pc.replace_substring(t, src, dst)
    t = pc.utf8_trim(pc.replace_substring_regex(t, r"\s+", " "), " ")
    return pa.table({
        id_col: batch.column(id_col),
        "clean_text": t,
        "n_chars_clean": pc.utf8_length(t).cast(pa.int64()),
    })


def add_stripped_markup(ds, **kw):
    return ds.map_batches(
        lambda b: strip_markup_batch(b, **kw), batch_format="pyarrow"
    )
