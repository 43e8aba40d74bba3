"""Stateful error-line classifier.

Port of crates/errors/src/errors_parser.rs:46-198: a standalone-error regex
(~30 alternatives) plus multi-line Python-traceback and Go-panic state
machines.  One ``State`` instance scans one conversation's turns in order
(sequential semantics → used inside ``groupby(conv_id).map_groups``).
"""

from __future__ import annotations

import re

__all__ = ["State", "NO_ERROR", "ERROR", "NEED_MORE", "COMPLETED_TRACEBACK"]

NO_ERROR = 0
ERROR = 1
NEED_MORE = 2
COMPLETED_TRACEBACK = 3

# errors_parser.rs:148-198
_ERROR_LINE_RE = re.compile(
    "("
    # Error codes
    r"ERROR [0-9]{4}"
    r"|<title>503 Service Unavailable</title>"
    # Ansible errors
    r"| ERROR$"
    r'|\|   "msg": "'
    r"|: FAILED!"
    r"|\| FAILED \|"
    r"|\| (fatal|failed|error): "
    r"| The error appears to be in "
    r"| failed: [1-9][0-9]*[ \t]"
    r"|stderr: 'error:"
    # OVS
    r"|\|WARN\|"
    r"|\[EC [0-9]+\]"
    # Galera
    r"| \[Error\] "
    # Python errors
    r"|[0-9Z][ \t]+ERROR[ \t]+[a-zA-Z]"
    # tempest errors
    r"|^FAIL: "
    r"|^(ERROR|FAILED): "
    r"|\.\.\. FAILED$"
    # test_results.xml
    r'|^<(failure|error) message='
    r"|^E       "
    # tobiko
    r"|%\] FAILED "
    # Go errors
    r"|\] ERROR: "
    # Fluentbit
    r'|"level":"ERROR"'
    # Kubernetes status, errors separated by at least 2 spaces, before a number
    r"|[ \t]{2,}(Failed|Error|CrashLoopBackOff)[ \t]{2,}[0-9]"
    # Kubernetes event
    r"|Warning[ \t]+Failed[ \t]+"
    r"|\bE[0-9]{4}\b"
    r'|msg="error'
    r'|msg="an error'
    r'|"level":"error"'
    r"|\blevel=error\b"
    ")"
)

_GO_FUNC_CALL_RE = re.compile(r"^[a-z].*\(.*\)$")

_PY_TB = "Traceback (most recent call last):"
_GO_PANIC = "panic:"

# parser phases
_UNKNOWN = 0
_PY = 1
_GO_HEADER = 2
_GO_ROUTINE = 3
_GO_THREADS = 4


def _start_find(line: str, needle: str) -> int | None:
    # errors_parser.rs:103-117: the needle at line start, or preceded by a
    # separator character
    if line.startswith(needle):
        return 0
    pos = line.find(needle)
    if pos > 0 and line[pos - 1] in " \t:|":
        return pos
    return None


def is_error_line(line: str) -> bool:
    return _ERROR_LINE_RE.search(line) is not None


def _go_tb_completed(pos: int, line: str) -> bool:
    # errors_parser.rs:130-146 (ported verbatim, including the quirky
    # l.chars().nth(pos) tab check)
    if len(line) > pos:
        l = line[pos:]
        tab_at = l[pos] if len(l) > pos else ""
        return not (
            l.startswith("goroutine ")
            or l.startswith("created by")
            or _GO_FUNC_CALL_RE.match(l) is not None
            or tab_at == "\t"
        )
    return False


class State:
    """Line-at-a-time parser; ``parse`` returns one of the result codes
    (errors_parser.rs:46-100)."""

    __slots__ = ("phase", "pos")

    def __init__(self) -> None:
        self.phase = _UNKNOWN
        self.pos = 0

    def _complete(self, result: int) -> int:
        self.phase = _UNKNOWN
        return result

    def _need_more(self, phase: int) -> int:
        self.phase = phase
        return NEED_MORE

    def parse(self, line: str) -> int:
        phase = self.phase
        if phase == _UNKNOWN:
            pos = _start_find(line, _PY_TB)
            if pos is not None:
                self.pos = pos
                return self._need_more(_PY)
            pos = _start_find(line, _GO_PANIC)
            if pos is not None:
                self.pos = pos
                return self._need_more(_GO_HEADER)
            return ERROR if is_error_line(line) else NO_ERROR
        pos = self.pos
        if phase == _PY:
            # Python traceback continues while the char at pos is a space
            c = line[pos] if len(line) > pos else None
            if c is None or c == " ":
                return NEED_MORE
            return self._complete(COMPLETED_TRACEBACK)
        if phase == _GO_HEADER:
            c = line[pos] if len(line) > pos else None
            if c == "[":
                return NEED_MORE  # signal debug statement
            if c is None:
                return self._need_more(_GO_ROUTINE)  # blank separator
            return self._complete(NO_ERROR)  # the 'panic:' was not valid
        if phase == _GO_ROUTINE:
            if len(line) > pos and line[pos:].startswith("goroutine "):
                return self._need_more(_GO_THREADS)
            return self._complete(NO_ERROR)
        # _GO_THREADS
        if _go_tb_completed(pos, line):
            return self._complete(COMPLETED_TRACEBACK)
        return NEED_MORE
