"""Golden-case port of the reference BytesLines iterator tests
(crates/iterator/src/iterator.rs:352-442) against
logjuicer_ray.sources.linesplit — no Ray needed (pure framing)."""
import numpy as np
import pytest

from logjuicer_ray.sources.linesplit import (
    ANSIBLE_MARKER,
    file_type_for,
    split_log_lines,
    split_log_text,
)


def lines(data, file_type="text", **kw):
    return [
        (seg.decode(), no)
        for seg, no in split_log_lines(data, file_type=file_type, **kw)
    ]


def test_iterator_golden():
    # iterator.rs:352-374 test_iterator
    assert lines(b"first\nsecond\nthird\nfourth\\nsub4") == [
        ("first", 1),
        ("second", 2),
        ("third", 3),
        ("fourth", 4),
        ("sub4", 4),
    ]
    assert lines(b"first\\n") == [("first", 1)]


def test_doc_example():
    # iterator.rs:15-26 module doc example
    assert lines(b"first\nsecond\\nextra") == [
        ("first", 1),
        ("second", 2),
        ("extra", 2),
    ]


def test_long_line_golden():
    # iterator.rs:376-390 test_long_line: an over-cap line is DROPPED
    # entirely (not truncated) and still counts toward line numbers
    data = b"a" * (8192 * 2) + b"first\n" + b"second\nthird\n"
    assert lines(data) == [("second", 2), ("third", 3)]


def test_last_line_golden():
    # iterator.rs:399-409 test_last_line
    data = b"a" * (8192 * 2) + b"\ntest"
    out = lines(data)
    assert len(out) == 1
    assert out == [("test", 2)]


def test_ansible_stdout_golden():
    # iterator.rs:392-407 test_ansible_stdout (Text mode!)
    data = (b'stdout": "Stopping systemd OpenStack\\nERROR: oops'
            b'", "stdout_lines": ["Stop...", "ERR..."],')
    assert lines(data) == [
        ('stdout": "Stopping systemd OpenStack', 1),
        ("ERROR: oops", 1),
        (', "stdout_lines": ["Stop...", "ERR..."],', 2),
    ]


def test_json_iterator_golden():
    # iterator.rs:421-442 test_json_iterator
    data = b'[42, 43,\n {"key": "value", o:[1,2]}]'
    assert lines(data, "json") == [
        ("42", 1),
        (" 43", 1),
        (" ", 2),
        ('"key": "value"', 2),
        (" o:", 2),
        ("1", 2),
        ("2", 2),
    ]


def test_xml_split():
    # Sep::Xml: '<' immediately after '>' splits with len 0 (iterator.rs:265)
    assert lines(b"<a><b>text</b></a>", "xml") == [
        ("<a>", 1),
        ("<b>text</b>", 1),
        ("</a>", 1),
    ]
    # real newlines still frame and advance the counter
    assert lines(b"<a>x</a>\n<b>y</b><c/>", "xml") == [
        ("<a>x</a>", 1),
        ("<b>y</b>", 2),
        ("<c/>", 2),
    ]


def test_escape_semantics():
    # '\\\\n' = escaped backslash then n: NOT a subline split
    assert lines(b"a\\\\nb") == [("a\\\\nb", 1)]
    # escaped REAL newline is not a separator either (the escaped arm
    # only matches the literal 'n' char, iterator.rs:256-263)
    assert lines(b"a\\\nb") == [("a\\\nb", 1)]
    # escaped quote inside a JSON string does not toggle string state
    assert lines(b'{"k": "a\\"b,c"}', "json") == [('"k": "a\\"b,c"', 1)]


def test_json_string_protects_separators():
    assert lines(b'{"a,b": "c{d}e"}', "json") == [('"a,b": "c{d}e"', 1)]


def test_empty_and_consecutive_separators_skip():
    # empty slices are skipped but still advance line numbers
    assert lines(b"a\n\nb") == [("a", 1), ("b", 3)]
    assert lines(b"\n\nx") == [("x", 3)]


def test_exact_cap_boundary_kept():
    # iterator.rs:213 `pos > max_line_length`: exactly-at-cap survives
    data = b"x" * 6000 + b"\n" + b"y" * 6001 + b"\nz"
    out = lines(data)
    assert out == [("x" * 6000, 1), ("z", 3)]


def test_ansible_marker_in_json_mode_wins_over_quote_toggle():
    # the marker's opening quote fires the NewLine arm before the JSON
    # quote toggle (iterator.rs:252-271 match order)
    data = b'{"stdout": "a' + ANSIBLE_MARKER + b'1,2]}'
    out = lines(data, "json")
    # the quote opening the marker did NOT flip in-string state, so the
    # separators after it still split
    assert (', "stdout_lines": [', 2) in [(t, n) for t, n in out] or any(
        "stdout_lines" in t for t, _ in out
    )


def test_file_type_dispatch():
    # source.rs:36-44
    assert file_type_for("job-output.json") == "json"
    assert file_type_for("job-output.json.gz") == "json"
    assert file_type_for("report.xml") == "xml"
    assert file_type_for("report.xml.gz") == "xml"
    assert file_type_for("service.log") == "text"
    assert file_type_for("x.json.txt") == "text"


def test_split_log_text_decodes():
    assert split_log_text(b"a\nb\\nc") == ["a", "b", "c"]
    assert split_log_text(b"caf\xc3\xa9\nbad\xff") == ["caf\xe9", "bad\ufffd"]


def test_crlf_kept_like_reference():
    # only '\n' separates; the '\r' stays on the line (Rust parity)
    assert lines(b"a\r\nb") == [("a\r", 1), ("b", 2)]


@pytest.mark.parametrize("ft", ["text", "json", "xml"])
def test_vectorized_matches_naive_reference(ft):
    """Property check: the numpy separator algebra must equal a direct
    per-byte port of the Rust state machine on random byte soup."""
    rng = np.random.default_rng(42)
    alphabet = b'ab"\\n,{}[]<>\n ' + ANSIBLE_MARKER

    def naive(data, file_type):
        out, line_no, last_nl = [], 0, True
        escaped, in_str, last_char = False, False, " "
        start, i, n = 0, 0, len(data)
        seps = []
        while i < n:
            c = chr(data[i])
            sep = None
            if escaped:
                escaped = False
                if c == "n":
                    sep = ("sub", i)
            elif c == "\\":
                escaped = True
            elif c == "\n" or data[i:].startswith(ANSIBLE_MARKER):
                sep = ("nl", i)
            elif c == "<" and file_type == "xml" and last_char == ">":
                sep = ("xml", i)
            elif file_type == "json":
                if c == '"':
                    in_str = not in_str
                elif not in_str and c in ",[]{}":
                    sep = ("json", i)
            last_char = c
            if sep:
                seps.append(sep)
            i += 1
        for k, p in seps:
            end, nxt = (p - 1, p + 1) if k == "sub" else \
                       (p, p) if k == "xml" else (p, p + 1)
            if last_nl:
                line_no += 1
            last_nl = k == "nl"
            seg = data[start:end]
            start = nxt
            if seg and len(seg) <= 6000:
                out.append((seg, line_no))
        if start < n:
            if last_nl:
                line_no += 1
            seg = data[start:]
            if len(seg) <= 6000:
                out.append((seg, line_no))
        return out

    for _ in range(60):
        m = int(rng.integers(0, 1200))
        data = bytes(rng.choice(np.frombuffer(alphabet, np.uint8), m))
        assert split_log_lines(data, file_type=ft) == naive(data, ft), data
    # full byte range (including NUL, \r, multi-byte UTF-8 fragments):
    # framing is byte-level and must agree everywhere
    for _ in range(20):
        m = int(rng.integers(0, 600))
        data = bytes(rng.integers(0, 256, m, dtype=np.uint8))
        assert split_log_lines(data, file_type=ft) == naive(data, ft), data
    # adversarial: markers preceded by escape runs of every parity, and
    # escape runs crossing would-be separators
    for pre in (b"", b"\\", b"\\\\", b"\\\\\\"):
        for mid in (b"x", b"\n", b"\\n", b'"'):
            data = b"head " + pre + ANSIBLE_MARKER + mid + pre + b"\ntail"
            assert split_log_lines(data, file_type=ft) == naive(data, ft), \
                (pre, mid)
