"""Group-key derivation.

The primary engine group key is ``(role, tool)`` from the transcript schema
(BASELINE.json input_hint) — see :func:`group_key`.  The path-cleaning
``index_name_from_path`` utility mirrors the reference ``IndexName::from_path``
(crates/tokenizer/src/index_name.rs:165-177) for provenance strings and for
parity with the reference's goldenfile tests.
"""

from __future__ import annotations

import posixpath
import re

__all__ = ["group_key", "index_name_from_path", "extend_index_name"]

GROUP_SEP = "/"


def group_key(role: str, tool: str) -> str:
    """The engine's IndexName analog: one baseline index per (role, tool)."""
    return f"{role}{GROUP_SEP}{tool}"


# index_name.rs:82-94 — very long continuous words and uuids become "UID"
_UID_RE = re.compile(
    r"([0-9a-zA-Z]{63,128}"
    r"|[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"
    r")"
)

_VOWELS = frozenset("aeiouy")


def _is_hexadecimal(name: str) -> bool:
    # index_name.rs:19-23
    base = name.strip("-_.")
    return all(("a" <= c <= "f") or c.isdigit() for c in base)


def _contains_vowel(name: str) -> bool:
    return any(c.lower() in _VOWELS for c in name)


def _is_dir_name_irrelevant(name: str) -> bool:
    # index_name.rs:44-51
    return (
        _is_hexadecimal(name)
        or not _contains_vowel(name)
        or name in ("util", "tasks", "manager", "current", "logs", "init")
    )


def _get_parent_name(path: str) -> str | None:
    # index_name.rs:62-70: climb to the first relevant parent directory
    parent = posixpath.dirname(path)
    while parent:
        name = posixpath.basename(parent)
        if not name:
            return None
        if not _is_dir_name_irrelevant(name):
            return name
        parent = posixpath.dirname(parent)
    return None


def _remove_non_vowel_component(name: str) -> str:
    # index_name.rs:104-110: split inclusive on -_./ keep vowel-ful components
    parts = re.split(r"(?<=[-_.])", name)
    return "".join(
        p for p in parts if p and not _is_hexadecimal(p) and _contains_vowel(p)
    )


def _clean_name(base: str) -> str:
    # index_name.rs:120-151
    if base.endswith(".journal"):
        base = base[: -len(".journal")]
    elif base.endswith(".journal~"):
        base = base[: -len(".journal~")]
    if base.startswith("instance-00"):
        return "instance"
    if "@" in base:
        return base[: base.find("@")]
    if base.startswith("sosreport-"):
        pos = base.find("-", len("sosreport-"))
        return base[:pos] if pos != -1 else base
    cleaned = _remove_non_vowel_component(base)
    cleaned = re.sub(r"[^A-Za-z.\-]", "", cleaned)
    if cleaned.endswith(".gz"):
        cleaned = cleaned[:-3]
    if cleaned.endswith(".txt"):
        cleaned = cleaned[:-4]
    return cleaned.strip("._-")


def index_name_from_path(base: str) -> str:
    """Noise-free file-path key grouping similar files
    (index_name.rs:165-177), e.g. ``qemu/instance-0000001d.log.txt.gz`` →
    ``qemu/instance``."""
    base_no_id = _UID_RE.sub("UID", base)
    filename = posixpath.basename(base_no_id) or "NA"
    parent = _get_parent_name(base_no_id)
    if parent is None:
        return _clean_name(filename)
    return f"{_clean_name(parent)}/{_clean_name(filename)}"


def extend_index_name(outer: str, inner: str) -> str:
    # index_name.rs:180-182 (tarball containers)
    return f"{outer}__{inner}"
