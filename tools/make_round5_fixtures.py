"""Deterministic generators for the round-5 conformance dataset dirs:

- ``journal-member``: a binary systemd journal INSIDE a plain tarball —
  the journals-in-tarballs ingest path (sources/journal.py via
  sources/archives.py) had e2e pytest but no conformance dir.
- ``zuul-build-layout``: a tarball shaped like a Zuul build results dir
  (job-output.txt + zuul-info/inventory.yaml + zuul-manifest.json) —
  the layout the zuul source walks; the .json member also exercises
  format-aware framing inside an archive.
- ``junit-xml``: a single-line JUnit ``results.xml`` pair — only the
  Xml ``><`` splitting (iterator.rs:265) gives per-element lines.

Run from the repo root: ``python tools/make_round5_fixtures.py``.
Regenerating produces byte-identical artifacts (fixed mtimes/uids).
"""
import io
import os
import struct
import sys
import tarfile

ROOT = os.path.join(os.path.dirname(__file__), "..", "tests", "data", "datasets")

_HEADER_MIN = 240


class JournalBuilder:
    """Minimal valid journal writer (mirrors tests/test_journal.py)."""

    def __init__(self, compact: bool = False):
        self.compact = compact
        self.objects = b""

    def _append(self, obj_type: int, payload: bytes) -> int:
        off = _HEADER_MIN + len(self.objects)
        size = 16 + len(payload)
        hdr = bytes([obj_type, 0]) + b"\x00" * 6 + struct.pack("<Q", size)
        padded = (size + 7) & ~7
        self.objects += hdr + payload + b"\x00" * (padded - size)
        return off

    def data(self, key: str, value: str) -> int:
        fixed = b"\x00" * (8 * 6 + (8 if self.compact else 0))
        return self._append(1, fixed + f"{key}={value}".encode())

    def entry(self, realtime_us: int, data_offsets: list[int]) -> None:
        fixed = struct.pack("<QQQ", 1, realtime_us, 0) + b"\x00" * 24
        items = b"".join(struct.pack("<QQ", o, 0) for o in data_offsets)
        self._append(3, fixed + items)

    def build(self) -> bytes:
        head = bytearray(_HEADER_MIN)
        head[0:8] = b"LPKSHHRH"
        struct.pack_into("<Q", head, 88, _HEADER_MIN)
        struct.pack_into("<Q", head, 96, len(self.objects))
        return bytes(head) + self.objects


def _journal(fail: bool) -> bytes:
    b = JournalBuilder()
    ts = 1714979289000000
    for i in range(40):
        m = b.data("MESSAGE",
                   f"Started Session {1000 + i} of User deployer.")
        sid = b.data("SYSLOG_IDENTIFIER", "systemd")
        b.entry(ts + i * 1_000_000, [m, sid])
        m2 = b.data("MESSAGE",
                    f"pam_unix(sshd:session): session opened for user deployer(uid={500 + i})")
        sid2 = b.data("SYSLOG_IDENTIFIER", "sshd")
        b.entry(ts + i * 1_000_000 + 500_000, [m2, sid2])
    if fail:
        m = b.data("MESSAGE",
                   "segfault at 0 ip 00007f3a sp 00007ffd error 4 in libcrypt.so")
        sid = b.data("SYSLOG_IDENTIFIER", "kernel")
        b.entry(ts + 41_000_000, [m, sid])
        m2 = b.data("MESSAGE",
                    "Main process exited, code=dumped, status=11/SEGV")
        sid2 = b.data("SYSLOG_IDENTIFIER", "systemd")
        b.entry(ts + 42_000_000, [m2, sid2])
    return b.build()


def _tar(path: str, members: dict[str, bytes]) -> None:
    with tarfile.open(path, "w") as tf:
        for name in sorted(members):
            data = members[name]
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 1714979289
            info.uid = info.gid = 0
            info.uname = info.gname = "root"
            tf.addfile(info, io.BytesIO(data))


def _job_output(fail: bool) -> bytes:
    lines = ["2024-05-06 07:08:09.000 | Job console starting..."]
    for i in range(30):
        lines.append(
            f"2024-05-06 07:08:{10 + i:02d}.000 | controller | "
            f"TASK [deploy : sync artifact bundle {i:02d}] complete"
        )
    if fail:
        lines.append("2024-05-06 07:08:41.000 | controller | "
                     "ERROR! the task 'restart api gateway' failed on controller")
        lines.append("2024-05-06 07:08:42.000 | controller | "
                     "POST-RUN END RESULT_FAILURE: [untrusted : review.example.com]")
    else:
        lines.append("2024-05-06 07:08:41.000 | controller | "
                     "PLAY RECAP: ok=31 changed=12 failed=0")
    return ("\n".join(lines) + "\n").encode()


def _manifest(fail: bool) -> bytes:
    # one-line JSON: only the Json scalar splitting frames this usefully
    status = "FAILURE" if fail else "SUCCESS"
    return (
        '{"tree": [{"name": "job-output.txt", "mimetype": "text/plain"}, '
        '{"name": "zuul-info", "mimetype": "application/directory"}], '
        f'"result": "{status}"}}'
    ).encode()


def _inventory() -> bytes:
    return (b"all:\n  hosts:\n    controller:\n      ansible_host: 10.0.0.5\n"
            b"  vars:\n    zuul:\n      job: deploy-control-plane\n")


def _junit(fail: bool) -> bytes:
    cases = "".join(
        f'<testcase classname="suite.core" name="test_case_{i:02d}" time="0.01"/>'
        for i in range(25)
    )
    failing = (
        '<testcase classname="suite.core" name="test_gateway_restart" time="1.40">'
        '<failure message="ConnectionRefusedError: [Errno 111] gateway did not come back">'
        "Traceback: connect() failed</failure></testcase>"
    ) if fail else (
        '<testcase classname="suite.core" name="test_gateway_restart" time="0.40"/>'
    )
    n_fail = 1 if fail else 0
    return (
        '<?xml version="1.0" encoding="utf-8"?>'
        f'<testsuite name="suite" tests="26" failures="{n_fail}">'
        f"{cases}{failing}</testsuite>"
    ).encode()


def _gz(data: bytes) -> bytes:
    import gzip
    import io as _io

    buf = _io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:  # reproducible
        f.write(data)
    return buf.getvalue()


def _app_log(fail: bool) -> bytes:
    lines = [f"INFO request handled route=/api/v1/items status=200 in 12ms"
             for _ in range(20)]
    lines += ["INFO cache refreshed entries=4096 in 88ms"] * 6
    if fail:
        lines.append("ERROR upstream timeout connecting to billing-svc:8443 after 30000ms")
        lines.append("WARN circuit breaker OPEN for billing-svc")
    else:
        lines.append("INFO upstream healthy billing-svc:8443 rtt 4ms")
    return ("\n".join(lines) + "\n").encode()


def main() -> None:
    jdir = os.path.join(ROOT, "journal-member")
    os.makedirs(jdir, exist_ok=True)
    _tar(os.path.join(jdir, "host.good.tar"),
         {"logs/journal/abc/system.journal": _journal(False)})
    _tar(os.path.join(jdir, "host.fail.tar"),
         {"logs/journal/abc/system.journal": _journal(True)})

    zdir = os.path.join(ROOT, "zuul-build-layout")
    os.makedirs(zdir, exist_ok=True)
    for kind, fail in (("good", False), ("fail", True)):
        _tar(os.path.join(zdir, f"build.{kind}.tar"), {
            "job-output.txt": _job_output(fail),
            "zuul-info/inventory.yaml": _inventory(),
            "zuul-manifest.json": _manifest(fail),
        })

    gdir = os.path.join(ROOT, "gzip-log")
    os.makedirs(gdir, exist_ok=True)
    with open(os.path.join(gdir, "app.good.gz"), "wb") as f:
        f.write(_gz(_app_log(False)))
    with open(os.path.join(gdir, "app.fail.gz"), "wb") as f:
        f.write(_gz(_app_log(True)))

    xdir = os.path.join(ROOT, "junit-xml")
    os.makedirs(xdir, exist_ok=True)
    with open(os.path.join(xdir, "results.good.xml"), "wb") as f:
        f.write(_junit(False))
    with open(os.path.join(xdir, "results.fail.xml"), "wb") as f:
        f.write(_junit(True))
    print("fixtures written under", os.path.abspath(ROOT))


if __name__ == "__main__":
    sys.exit(main())
