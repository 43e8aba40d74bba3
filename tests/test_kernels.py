"""Unit tests for the pure kernels: index-name grouping, vectorizer/index
math, timestamp parsing, errors parser.  All expectations are ported from the
reference crates' inline tests."""

import numpy as np
import pytest

from logjuicer_ray.index_name import group_key, index_name_from_path
from logjuicer_ray.timestamps import (
    TS_FULL,
    TS_TIME,
    parse_timestamp,
    set_date,
)
from logjuicer_ray.vectorize import (
    SIZE,
    build_index,
    distances,
    empty_index,
    merge_indexes,
)
from logjuicer_ray import errors_parser as ep


# --- index name (index_name.rs:191-237 + nested tests) ---------------------

@pytest.mark.parametrize(
    "expected,paths",
    [
        (
            "qemu/instance",
            [
                "containers/libvirt/qemu/instance-0000001d.log.txt.gz",
                "libvirt/qemu/instance-000000ec.log.txt.gz",
            ],
        ),
        ("builds/log", ["builds/2/log", "builds/42/log"]),
        (
            "journal/system",
            [
                "journal/191f9d948de542028f9b5b1731d2f400/system@00063b2d7c4cfbed-574870f97843e8e0.journal",
                "journal/system.journal",
            ],
        ),
        (
            "allnodes/sosreport-networker",
            [
                "_all_nodes/sosreport-networker-pyoo1wkk-2.tar.xz",
                "_all_nodes/sosreport-networker-pyoo1wka-1.tar.xz",
            ],
        ),
        ("audit/audit.log", ["audit/audit.log", "audit/audit.log.1"]),
        ("zuul/merger.log", ["zuul/merger.log", "zuul/merger.log.2017-11-12"]),
        (
            "pod/UID",
            [
                "pod/6339eec3ca2d6a0e36787b10daa5c6513b6ec79933804bd9dcb4c3b59bvwstc.txt",
                "pod/6339eec3cA2d6a0e36787b10daa5c6513b6ec79933804bd9dcb4c3b59bvwstc.txt",
            ],
        ),
        ("ironic/app.log", ["ironic/app.log.txt.gz", "ironic/app.log.1.gz"]),
        ("config-update/job-output.json", ["config-update/015da2b/job-output.json.gz"]),
        ("swift-proxy-log", ["swift-proxy-5b4bcb6699-hk9lb.log"]),
        ("rabbitmq-server/rabbitmq-server-log", ["rabbitmq-server-0/logs/rabbitmq-server-0.log"]),
        (
            "galera/log",
            ["pods/openstack_openstack-galera-0_a720a2da-7235-461d-95c2-19518e90cd33/galera/0.log"],
        ),
        (
            "rabbitmq/log",
            ["openstack_rabbitmq-server-0_b4fbdf24-cd9a-4572-8321-6dbd90356745/rabbitmq/0.log"],
        ),
        ("dummy-image-log", ["dummy-42-image-722e550664244ca5959a61f6dd950b9a.log"]),
    ],
)
def test_index_name_from_path(expected, paths):
    for path in paths:
        assert index_name_from_path(path) == expected, path


def test_group_key():
    assert group_key("assistant", "bash") == "assistant/bash"


# --- vectorizer / index (index.rs:216-281) --------------------------------

def test_search_semantics():
    baselines = build_index(["the first line", "the second line", "the third line is a warning"])
    targets = build_index(["a new error", "the second line"])
    d = distances(baselines, targets)
    assert d.dtype == np.float32
    # "a new error" is definitely not in the baseline (index.rs:276)
    assert d[0] > 0.6
    # exact match → distance ~0 (index.rs:239)
    assert abs(d[1]) < 1e-6


def test_no_overlap_is_one():
    baselines = build_index(["alpha beta gamma"])
    targets = build_index(["delta epsilon zeta"])
    assert distances(baselines, targets)[0] == pytest.approx(1.0)


def test_empty_baseline_distance_one():
    d = distances(empty_index(), build_index(["anything here"]))
    assert d.tolist() == [1.0]


def test_merge_dedups_rows():
    # test_index_mappend (index.rs:243-262)
    m1 = build_index(["the first line", "the second line"])
    m2 = build_index(["the first line", "the third line"])
    merged = merge_indexes([m1, m2])
    assert merged.nrows == 3
    d = distances(merged, build_index(["the third line", "the first line", "a new error"]))
    assert round(d[0] * 1000) == 0.0
    assert round(d[1] * 1000) == 0.0
    assert round(d[2] * 1000) == 1000.0


def test_duplicate_words_dropped_not_summed():
    # index.rs:198-205: "abc abc" has the same unit vector as "abc"
    a = build_index(["abc abc"])
    b = build_index(["abc"])
    assert distances(a, b)[0] == pytest.approx(0.0, abs=1e-6)


# --- timestamps (timestamps.rs:52-84,111-147) ------------------------------

@pytest.mark.parametrize(
    "line,expected",
    [
        ("    5-07-30 07:20:17,250 19 INFO ", None),
        ("2025-08-14 13:23:14 E0814 13:23:14.981141  124399 reflector.go", (TS_FULL, 1755177794000)),
        ("Feb 27 11:06:45 ", (TS_TIME, 40005000)),
        ("2024-02-27T15:58:33Z ", (TS_FULL, 1709049513000)),
        ('{"date":1708419555.859087,', (TS_FULL, 1708419555859)),
        ("[2024/02/20 09:13:35]", (TS_FULL, 1708420415000)),
        ("2024-02-20 09:15:54.012305", (TS_FULL, 1708420554012)),
        ("2024-02-20 09:06:57,036 INFO", (TS_FULL, 1708420017036)),
        ("I0220 08:45:08.004309  ", (TS_TIME, 31508004)),
    ],
)
def test_parse_timestamp(line, expected):
    assert parse_timestamp(line) == expected


def _full(s):
    kind, v = parse_timestamp(s)
    assert kind == TS_FULL
    return v


def _time(s):
    kind, v = parse_timestamp(s)
    assert kind == TS_TIME
    return v


@pytest.mark.parametrize(
    "date_str,time_str,expected_utc",
    [
        ("2024-02-27 11:05:43.333901", "Feb 27 10:41:36 ", "2024-02-27 10:41:36"),
        ("2000-01-01 23:00:00.000", "I0000 01:00:00.000", "2000-01-02 01:00:00"),
        ("2000-01-01 23:00:00.000", "I0000 18:00:00.000", "2000-01-01 18:00:00"),
        ("2000-01-01 01:00:00.000", "I0000 18:00:00.000", "1999-12-31 18:00:00"),
        ("2000-01-01 01:00:00.000", "I0000 05:00:00.000", "2000-01-01 05:00:00"),
    ],
)
def test_set_date(date_str, time_str, expected_utc):
    from datetime import datetime, timezone

    epoch = set_date(_full(date_str), _time(time_str))
    got = datetime.fromtimestamp(epoch / 1000, tz=timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
    assert got == expected_utc


# --- errors parser (errors_parser.rs:206-289) ------------------------------

def _is_multiline(body: str) -> bool:
    s = ep.State()
    completed = False
    for line in body.splitlines():
        assert not completed
        if s.parse(line) == ep.COMPLETED_TRACEBACK:
            completed = True
    return completed


def test_python_tb():
    assert _is_multiline(
        "\nTraceback (most recent call last):\n"
        '  File "test.py", line 5, in <module>\n'
        "    test()\n"
        '  File "test.py", line 2, in test\n'
        '    raise RuntimeError("oops")\n'
        "RuntimeError: oops\n"
    )
    assert _is_multiline(
        "\n2025-07-07 - Traceback (most recent call last):\n"
        '2025-07-07 -   File "test.py", line 7, in <module>\n'
        '2025-07-07 -     raise RuntimeError("bam")\n'
        "2025-07-07 - RuntimeError: bam\n"
    )


def test_go_tb():
    assert _is_multiline(
        "\npanic: runtime error: invalid memory address or nil pointer dereference\n"
        "[signal SIGSEGV: segmentation violation code=0x1 addr=0x0 pc=0x47b081]\n"
        "\n"
        "goroutine 1 [running]:\n"
        "main.main()\n"
        "\ttest.go:14 +0x61\n"
        "exit status 2\n"
    )


ERROR_LINES = [
    "ERROR 2002 (HY000): Can't connect to server on '127.0.0.1' (115)",
    "2025-07-07T21:21:52Z   Warning   Failed                  Pod                     "
    "logserver-0                           Error: ImagePullBackOff",
    '2025-07-07T17:03:05.595305798-04:00 stderr F time="2025-07-07T21:03:05Z" level=warning '
    'msg="an error was encountered ',
    "2025-07-07T17:09:04.148248939-04:00 stderr F E0707 21:09:04.148229       1 queueinformer_",
    '2025-07-07T17:09:26.167025939-04:00 stderr F time="2025-07-07T21:09:26Z" level=info '
    'msg="error updating ',
    '2025-07-07T17:02:55.673388956-04:00 stderr F time="2025-07-07T21:02:55Z" level=warning '
    'msg="error adding',
    '2025-07-07T17:02:55.753817892-04:00 stderr F {"level":"error","ts"',
    "{2} neutron.tests.unit.agent.test_plug_with_ns [0.034190s] ... FAILED",
    "E4242 oops",
    "test.go] E4242 bam",
    "13 ERROR neutron",
    "Z  ERROR  setup",
    "Z\tERROR\ttest",
    "fail level=error",
    "ovsdb_log(log_fsync3)|WARN|fsync failed (Invalid argument)",
    "BGP: [KTE2S-GTBDA][EC 100663301] INTERFACE_ADDRESS_DEL: Cannot find IF",
    "controller | controller-0 | FAILED | rc=2 >>",
    "[gw0] [ 97%] FAILED tobiko/tests",
    "job.batch/validate-edpm    Failed     0/1           67m        67m",
    "pod/cinder-backup-0  1/2     CrashLoopBackOff   17 (2m43s ago)   87m",
]


@pytest.mark.parametrize("line", ERROR_LINES, ids=range(len(ERROR_LINES)))
def test_is_error_line(line):
    assert ep.is_error_line(line)


def test_not_error_line():
    assert not ep.is_error_line("2025-07-07 - Running a script")


def test_index_name_goldenfile():
    """The reference's 32-path goldenfile corpus
    (crates/tokenizer/tests/index_tests.rs:8-19; data files copied as test
    fixtures)."""
    import os

    here = os.path.dirname(__file__)
    files = open(os.path.join(here, "data", "files-list.txt")).read().splitlines()
    expected = open(os.path.join(here, "data", "index-list.txt")).read().splitlines()
    assert len(files) == len(expected) == 32
    for path, want in zip(files, expected):
        assert index_name_from_path(path) == want, path
