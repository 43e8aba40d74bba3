"""Conversation-scan fixtures ported from the reference expected-output tests:
process.rs:538-736 (chunk processor, extended context, ignore patterns),
errors.rs:215-280 (errors mode), filter.rs:72-147 (filter_anomalies)."""

import re

from logjuicer_ray.chunk import scan_conversation, scan_errors
from logjuicer_ray.filtering import filter_anomalies, is_ansible_conv, train_error_tokens
from logjuicer_ray.tokenizer import process as tokenize
from logjuicer_ray.tokenizer import unordered_key
from logjuicer_ray.vectorize import build_index, distances


def _train(lines):
    # IndexTrainer::add semantics (process.rs:63-83): tokenize, dedup, build
    seen, toks = set(), []
    for line in lines:
        t = tokenize(line)
        k = unordered_key(t)
        if k not in seen:
            seen.add(k)
            toks.append(t)
    return build_index(toks)


def _scored_rows(index, lines, start_pos=1):
    toks = [tokenize(line) for line in lines]
    d = distances(index, build_index(toks))
    return [
        (i + start_pos, line, unordered_key(t), float(di))
        for i, (line, t, di) in enumerate(zip(lines, toks, d))
    ]


def test_chunk_processor():
    # process.rs:538-606
    index = _train(["001: regular log line", "in-between line"])
    target = [
        "001: regular log line",
        "002: regular log line",
        "Traceback oops",
        "in-between line",
        "another Traceback",
        "003: regular log line",
    ]
    anomalies, line_count, _ = scan_conversation(_scored_rows(index, target))
    assert line_count == 6
    assert [(a["text"], a["turn_idx"]) for a in anomalies] == [
        ("Traceback oops", 3),
        ("another Traceback", 5),
    ]
    a1, a2 = anomalies
    assert abs(a1["distance"] - 1.0) < 0.001
    assert a1["before"] == ["001: regular log line", "002: regular log line"]
    assert a1["after"] == ["in-between line"]
    assert a2["before"] == []
    assert a2["after"] == ["003: regular log line"]


def test_extended_context():
    # process.rs:608-695 — the extra context falls inside BETWEEN_CTX_LENGTH
    index = _train(["001: regular log line", "in-between line", "extra context line"])
    target = [
        "001: regular log line",
        "Traceback oops",
        "in-between line",
        "in-between line",
        "in-between line",
        "extra context line",
        "in-between line",
        "in-between line",
        "in-between line",
        "another Traceback",
        "003: regular log line",
    ]
    anomalies, _, _ = scan_conversation(_scored_rows(index, target))
    assert len(anomalies) == 2
    a1, a2 = anomalies
    assert a1["turn_idx"] == 2 and a1["text"] == "Traceback oops"
    assert a1["before"] == ["001: regular log line"]
    assert a1["after"] == ["in-between line"] * 3
    assert a2["turn_idx"] == 10 and a2["text"] == "another Traceback"
    assert a2["before"] == ["extra context line"] + ["in-between line"] * 3
    assert a2["after"] == ["003: regular log line"]


def test_ignore_patterns():
    # process.rs:697-736
    ignore = re.compile("fetch logs|get logs")
    ignored = lambda raw: ignore.search(raw) is not None
    index = _train(["001: regular log line", "in-between line", "extra context line"])
    target = [
        "001: regular log line",
        "TASK fetch logs",
        "2024-03-19 get logs done",
        "Traceback oops",
    ]
    anomalies, _, _ = scan_conversation(_scored_rows(index, target), ignored=ignored)
    assert len(anomalies) == 1
    assert anomalies[0]["text"] == "Traceback oops"
    # ignored lines are excluded from contexts too
    assert anomalies[0]["before"] == ["001: regular log line"]


def test_duplicates_not_reported_twice():
    # per-source dedup (process.rs:270-281): the same token bag is scored once
    index = _train(["base line alpha", "filler words here"])
    target = ["Traceback oops", "filler words here", "Traceback oops"]
    anomalies, _, _ = scan_conversation(_scored_rows(index, target))
    assert [a["turn_idx"] for a in anomalies] == [1]
    # with skip_duplicates=False both occurrences are anomalies
    anomalies, _, _ = scan_conversation(
        _scored_rows(index, target), skip_duplicates=False
    )
    assert [a["turn_idx"] for a in anomalies] == [1, 3]


def test_job_output_cut():
    # process.rs:256-258: stop at the run-logjuicer marker
    index = _train(["base line alpha"])
    target = ["Traceback oops", "TASK [run-logjuicer : collect]", "another Traceback"]
    anomalies, line_count, _ = scan_conversation(
        _scored_rows(index, target), is_job_output=True
    )
    assert [a["turn_idx"] for a in anomalies] == [1]
    assert line_count == 2  # marker line counted, rest not read


def test_errors_processor():
    # errors.rs:215-251
    lines = [
        "",
        "2025-07-07 - Running a script",
        "2025-07-07 - Traceback (most recent call last):",
        '2025-07-07 -   File "test.py", line 7, in <module>',
        '2025-07-07 -     raise RuntimeError("bam")',
        "2025-07-07 - RuntimeError: bam",
        "2025-07-07 - Something went wrong",
    ]
    rows = [(i + 1, line) for i, line in enumerate(lines)]
    anomalies, _, _ = scan_errors(rows)
    assert len(anomalies) == 1
    a = anomalies[0]
    assert a["turn_idx"] == 6
    assert a["text"] == "2025-07-07 - RuntimeError: bam"
    assert a["distance"] == 0.5
    assert a["ts"] is None
    assert a["before"] == [
        "2025-07-07 - Running a script",
        "2025-07-07 - Traceback (most recent call last):",
        '2025-07-07 -   File "test.py", line 7, in <module>',
        '2025-07-07 -     raise RuntimeError("bam")',
    ]
    assert a["after"] == ["2025-07-07 - Something went wrong"]


def test_errors_timestamps():
    # errors.rs:253-280
    lines = ["", "2025-08-14 13:23:14 message", "| fatal: oops"]
    rows = [(i + 1, line) for i, line in enumerate(lines)]
    anomalies, _, _ = scan_errors(rows)
    assert len(anomalies) == 1
    a = anomalies[0]
    assert a["turn_idx"] == 3
    assert a["text"] == "| fatal: oops"
    assert a["ts"] == 1755177794000
    assert a["before"] == ["2025-08-14 13:23:14 message"]
    assert a["after"] == []


_FILTER_LINES = [
    "",
    "2025-10-22 10:02:43.255665 | TASK [Susbscription manager check]",
    "2025-10-22 10:02:43.304194 | primary | ERROR",
    "2025-10-22 10:02:43.304485 | primary | {",
    "nop",
    "nop",
    "2025-10-23 10:02:43.255665 | TASK [Second task]",
    "2025-10-23 10:02:43.304194 | primary | ERROR",
    "2025-10-23 10:02:43.304485 | primary | {",
]


def test_filter_anomalies():
    # filter.rs:72-147 — ansible source: no dedup, before-context checked
    rows = [(i + 1, line) for i, line in enumerate(_FILTER_LINES)]
    anomalies, _, _ = scan_errors(rows, is_ansible=True)
    assert [(a["turn_idx"], a["text"]) for a in anomalies] == [
        (3, "2025-10-22 10:02:43.304194 | primary | ERROR"),
        (8, "2025-10-23 10:02:43.304194 | primary | ERROR"),
    ]
    a1, a2 = anomalies
    assert a1["before"] == ["2025-10-22 10:02:43.255665 | TASK [Susbscription manager check]"]
    assert a1["after"] == ["2025-10-22 10:02:43.304485 | primary | {", "nop", "nop"]
    assert a1["ts"] == 1761127363304
    assert a2["before"] == ["2025-10-23 10:02:43.255665 | TASK [Second task]"]
    assert a2["after"] == ["2025-10-23 10:02:43.304485 | primary | {"]
    assert a2["ts"] == 1761213763304

    baseline_rows = [(i + 1, line) for i, line in enumerate(_FILTER_LINES[:4])]
    assert is_ansible_conv("logs/job-output.txt")
    tokens = train_error_tokens(baseline_rows, is_ansible=True)
    index = build_index(tokens)
    filtered = filter_anomalies(index, anomalies, check_before=True)
    assert filtered == [anomalies[1]]


# --- BlockScan block-level fast path ---------------------------------------

def _mk_conv(conv, n, dist=0.0, has_index=True, text_fn=None):
    import pyarrow as pa

    text_fn = text_fn or (lambda i: f"line {conv} {i} ok")
    return pa.table(
        {
            "conv_id": pa.array([conv] * n),
            "turn_idx": pa.array(range(n), pa.int32()),
            "role": pa.array(["user" if i % 2 else "assistant" for i in range(n)]),
            "tool": pa.array(["t"] * n),
            "group_key": pa.array([f"g/{conv}"] * n),
            "text": pa.array([text_fn(i) for i in range(n)]),
            "dedup_key": pa.array([f"d{i}" for i in range(n)]),
            "distance": pa.array([dist] * n, pa.float32()),
            "has_index": pa.array([has_index] * n),
        }
    )


def _norm_scan(t):
    df = t.to_pandas()
    return df.sort_values(
        ["row_type", "conv_id", "turn_idx", "group_key"]
    ).reset_index(drop=True)


def test_block_scan_fast_path_parity():
    """Block-level vectorized precheck: fast-path conversations (no anomaly
    candidate, no unknown rows, no cut marker) must yield byte-identical
    output to the exact per-conversation scan."""
    import collections

    import pandas as pd
    import pyarrow as pa

    from logjuicer_ray.stages.context import BlockScan, ConversationScan

    batch = pa.concat_tables(
        [
            _mk_conv("a", 5),
            _mk_conv("b", 7),
            _mk_conv("c", 3, dist=0.9),
            _mk_conv("d", 4, has_index=False),
            _mk_conv("e", 6),
        ]
    )
    scan = ConversationScan()
    fast = BlockScan(scan)(batch)
    counts = collections.Counter(fast.column("row_type").to_pylist())
    # b, c, d interior; a/e fragments; c anomalies; d unknown routing
    assert counts["counts"] == 3 and counts["anomaly"] >= 1 and counts["unknown"] == 1
    # fast path actually fires for conv b
    assert scan._slow_mask_np(batch, None, None, None) is not None

    class AllSlow(ConversationScan):
        def _slow_mask_np(self, *a):
            return None

    slow = BlockScan(AllSlow())(batch)
    pd.testing.assert_frame_equal(_norm_scan(fast), _norm_scan(slow))


def test_block_scan_errors_fast_path_parity():
    import pandas as pd
    import pyarrow as pa

    from logjuicer_ray.stages.context import BlockScan, ErrorsScan

    batch = pa.concat_tables(
        [
            _mk_conv("a", 5),
            _mk_conv("b", 7),
            _mk_conv(
                "c",
                4,
                text_fn=lambda i: "ERROR boom" if i == 2 else f"fine {i}",
            ),
            _mk_conv("e", 6),
        ]
    )
    fast = BlockScan(ErrorsScan())(batch)

    class AllSlow(ErrorsScan):
        def _slow_mask_np(self, *a):
            return None

    slow = BlockScan(AllSlow())(batch)
    pd.testing.assert_frame_equal(_norm_scan(fast), _norm_scan(slow))
