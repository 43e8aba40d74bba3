"""systemd binary-journal source: the file format is crafted by hand here
(header + DATA/ENTRY objects per the public journal-file spec) and parsed
by sources/journal.py — line rendering, multi-line continuation, missing-
field empties, compact mode, archives integration, CLI e2e.
"""

import io
import struct

import pytest

_HEADER_MIN = 240


class JournalBuilder:
    """Writes a minimal valid journal: 240-byte header + 8-aligned objects."""

    def __init__(self, compact: bool = False):
        self.compact = compact
        self.objects = b""
        self.offsets: dict[str, int] = {}

    def _append(self, obj_type: int, payload: bytes, flags: int = 0) -> int:
        off = _HEADER_MIN + len(self.objects)
        size = 16 + len(payload)
        hdr = bytes([obj_type, flags]) + b"\x00" * 6 + struct.pack("<Q", size)
        padded = (size + 7) & ~7
        self.objects += hdr + payload + b"\x00" * (padded - size)
        return off

    def data(self, key: str, value: str) -> int:
        fixed = b"\x00" * (8 * 6 + (8 if self.compact else 0))
        off = self._append(1, fixed + f"{key}={value}".encode())
        self.offsets[f"{key}={value}"] = off
        return off

    def entry(self, realtime_us: int, data_offsets: list[int]) -> None:
        fixed = struct.pack("<QQQ", 1, realtime_us, 0) + b"\x00" * 16 + b"\x00" * 8
        if self.compact:
            items = b"".join(struct.pack("<I", o) for o in data_offsets)
        else:
            items = b"".join(struct.pack("<QQ", o, 0) for o in data_offsets)
        self._append(3, fixed + items)

    def build(self) -> bytes:
        head = bytearray(_HEADER_MIN)
        head[0:8] = b"LPKSHHRH"
        flags = (1 << 4) if self.compact else 0
        struct.pack_into("<I", head, 12, flags)
        struct.pack_into("<Q", head, 88, _HEADER_MIN)
        struct.pack_into("<Q", head, 96, len(self.objects))
        return bytes(head) + self.objects


# realtime 2024-05-06 07:08:09.123456 UTC in microseconds
TS_US = 1714979289123456
TS_STR = "2024-05-06 07:08:09,123"


def _simple_journal(compact=False) -> bytes:
    b = JournalBuilder(compact=compact)
    m1 = b.data("MESSAGE", "Accepted publickey for root")
    sid = b.data("SYSLOG_IDENTIFIER", "sshd")
    b.entry(TS_US, [m1, sid])
    m2 = b.data("MESSAGE", "line one\nline two")
    comm = b.data("_COMM", "kernel")
    b.entry(TS_US + 1_000_000, [m2, comm])
    m3 = b.data("MESSAGE", "orphan message with no identifier")
    b.entry(TS_US + 2_000_000, [m3])
    b.data("_PID", "42")  # unwanted field: never cached
    return b.build()


def test_journal_lines_rendering_and_multiline():
    from logjuicer_ray.sources.journal import journal_lines

    lines = list(journal_lines(io.BytesIO(_simple_journal())))
    assert lines[0] == (f"{TS_STR} - sshd: Accepted publickey for root", 1)
    ts2 = "2024-05-06 07:08:10,123"
    prefix = " " * (len(ts2) + len("kernel") + 5)
    assert lines[1] == (f"{ts2} - kernel: line one", 2)
    assert lines[2] == (prefix + "line two", 3)
    # entry with MESSAGE but no sid/_COMM renders an empty line (journal.rs)
    assert lines[3] == ("", 4)
    assert len(lines) == 4


def test_journal_compact_mode_matches_regular():
    from logjuicer_ray.sources.journal import journal_lines

    a = [t for t, _ in journal_lines(io.BytesIO(_simple_journal(False)))]
    b = [t for t, _ in journal_lines(io.BytesIO(_simple_journal(True)))]
    assert a == b


def test_journal_rejects_bad_signature():
    from logjuicer_ray.sources.journal import journal_lines

    with pytest.raises(ValueError):
        list(journal_lines(io.BytesIO(b"NOTAJRNL" + b"\x00" * 300)))


def test_read_journal_lines_dataset(ray_session, tmp_path):
    from logjuicer_ray.sources.journal import read_journal_lines

    p = tmp_path / "system.journal"
    p.write_bytes(_simple_journal())
    df = read_journal_lines(str(p)).to_pandas()
    assert len(df) == 4
    assert list(df["turn_idx"]) == [0, 1, 2, 3]
    assert df["text"][0].endswith("sshd: Accepted publickey for root")
    assert set(df["role"]) == {"file"}
    assert (df["conv_id"] == str(p)).all()


def test_journal_inside_tarball(ray_session, tmp_path):
    import tarfile

    from logjuicer_ray.sources.archives import read_archive_lines

    tar = str(tmp_path / "logs.tar")
    data = _simple_journal()
    with tarfile.open(tar, "w") as tf:
        info = tarfile.TarInfo("var/log/journal/system.journal")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    df = read_archive_lines(tar).to_pandas()
    assert len(df) == 4
    assert df["text"][0].endswith("sshd: Accepted publickey for root")
    assert df["conv_id"][0] == f"{tar}?entry=var/log/journal/system.journal"


def test_cli_errors_over_journal(ray_session, tmp_path):
    """The errors pipeline runs directly over a .journal input."""
    import json
    import os

    from logjuicer_ray.cli import main

    b = JournalBuilder()
    for i in range(30):
        m = b.data("MESSAGE", f"service heartbeat {i} ok")
        s = b.data("SYSLOG_IDENTIFIER", "svc")
        b.entry(TS_US + i * 1_000_000, [m, s])
    m = b.data("MESSAGE", "[boot] ERROR: disk failure detected on sda")
    s = b.data("SYSLOG_IDENTIFIER", "svc")
    b.entry(TS_US + 31_000_000, [m, s])
    p = tmp_path / "svc.journal"
    p.write_bytes(b.build())
    out = str(tmp_path / "out")
    rc = main(["errors", "--target", str(p), "--out", out, "--quiet"])
    assert rc == 0
    summary = json.load(open(os.path.join(out, "summary.json")))
    assert summary["sinks"]["anomalies"] >= 1


def test_corrupted_journals_fail_cleanly():
    """3000 random corruptions (byte flips / truncations / junk tails) of
    a valid journal must either parse or raise ValueError/EOFError — the
    two exceptions the archive/raw-file ingest catches to SKIP a corrupt
    member (archives._entry_rows) — never OverflowError/MemoryError from
    a corrupted 64-bit size field."""
    import io

    import numpy as np

    from logjuicer_ray.sources.journal import journal_lines

    rng = np.random.default_rng(9)
    base = bytearray(_simple_journal())
    seen = set()
    for _ in range(3000):
        buf = bytearray(base)
        for _ in range(int(rng.integers(1, 6))):
            kind = rng.integers(0, 3)
            if kind == 0 and len(buf) > 1:
                buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
            elif kind == 1 and len(buf) > 10:
                del buf[int(rng.integers(1, len(buf))):]
            else:
                buf += bytes(rng.integers(
                    0, 256, int(rng.integers(1, 64)), dtype=np.uint8))
        try:
            list(journal_lines(io.BytesIO(bytes(buf))))
        except (ValueError, EOFError) as e:
            seen.add(type(e).__name__)
        # any other exception type propagates and fails the test
    assert seen <= {"ValueError", "EOFError"}
