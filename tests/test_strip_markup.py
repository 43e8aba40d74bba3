"""strip_markup_batch (functions/text.py): markup-to-text extraction.

The sf-scale parity runs in the auto-discovered oracle sweep
(``markup_stripped_docs``); here we pin the semantics on adversarial
hand cases and check the Arrow RE2 chain against DuckDB's independent
RE2 on the same strings.
"""

import duckdb
import pyarrow as pa
import pytest

from logjuicer_ray.functions.text import strip_markup_batch

CASES = [
    # (html, expected clean text)
    ("<p>Hello <b>world</b></p>", "Hello world"),
    ("<SCRIPT>var x = '<p>not text</p>';</SCRIPT>after", "after"),
    ("<script src=\"a.js\"></script>kept", "kept"),
    ("<style>p { color: red }\n.x{}</style>kept", "kept"),
    ("<Style Media=print>h1{}</STYLE >kept", "kept"),
    ("<!-- a <b>comment</b> -->visible", "visible"),
    ("<!-- multi\nline -->visible", "visible"),
    ("a &lt;tag&gt; &quot;q&quot; &#39;s&#39; b&nbsp;c &amp; d",
     "a <tag> \"q\" 's' b c & d"),
    # single-pass entity decode: &amp;lt; is the LITERAL string "&lt;"
    ("&amp;lt;not a tag&amp;gt;", "&lt;not a tag&gt;"),
    ("no markup at all", "no markup at all"),
    ("  <br><br>   spaced \t out  <hr/> ", "spaced out"),
    # unclosed script strips to end of document (documented heuristic)
    ("before<script>var x=1;", "before"),
    ("<a href='x?a=1&amp;b=2'>link text</a>", "link text"),
    ("", ""),
]


def test_hand_cases():
    t = pa.table({
        "doc_id": pa.array(range(len(CASES)), pa.int64()),
        "text": pa.array([c[0] for c in CASES], pa.string()),
    })
    out = strip_markup_batch(t)
    got = out.column("clean_text").to_pylist()
    for (html, want), g in zip(CASES, got):
        assert g == want, f"{html!r}: {g!r} != {want!r}"
    assert out.column("n_chars_clean").to_pylist() == [
        len(w) for _, w in CASES]


def test_null_text_is_empty():
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array([None], pa.string())})
    out = strip_markup_batch(t)
    assert out.column("clean_text").to_pylist() == [""]


def test_duckdb_kernel_parity():
    """The exact strip chain mirrored in DuckDB must agree string-for-
    string on the adversarial cases (two independent RE2 bindings)."""
    con = duckdb.connect()
    sql = (
        "SELECT trim(regexp_replace("
        "replace(replace(replace(replace(replace(replace("
        "regexp_replace(regexp_replace("
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        "?, '(?is)<script\\b[^>]*>.*?</script\\s*>', ' ', 'g'), "
        "'(?is)<style\\b[^>]*>.*?</style\\s*>', ' ', 'g'), "
        "'(?is)<script\\b[^>]*>.*$', ' ', 'g'), "
        "'(?is)<style\\b[^>]*>.*$', ' ', 'g'), "
        "'(?s)<!--.*?-->', ' ', 'g'), "
        "'<[^>]*>', ' ', 'g'), "
        "'&lt;','<'),'&gt;','>'),'&quot;','\"'),'&#39;',chr(39)),"
        "'&nbsp;',' '),'&amp;','&'), "
        "'\\s+', ' ', 'g'))"
    )
    t = pa.table({
        "doc_id": pa.array(range(len(CASES)), pa.int64()),
        "text": pa.array([c[0] for c in CASES], pa.string()),
    })
    ray_out = strip_markup_batch(t).column("clean_text").to_pylist()
    for (html, _), got in zip(CASES, ray_out):
        want = con.execute(sql, [html]).fetchone()[0]
        assert got == want, f"{html!r}: arrow {got!r} != duckdb {want!r}"


def test_custom_columns():
    t = pa.table({"id": pa.array([7], pa.int64()),
                  "body": pa.array(["<i>x</i>"], pa.string())})
    out = strip_markup_batch(t, id_col="id", text_col="body")
    assert out.column_names == ["id", "clean_text", "n_chars_clean"]
    assert out.column("clean_text").to_pylist() == ["x"]
