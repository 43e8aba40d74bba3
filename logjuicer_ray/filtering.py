"""Anomaly re-scoring against a baseline index.

Port of crates/model/src/filter.rs:34-70 (``filter_anomalies``) and the
errors-mode index trainer (``IndexTrainer::add_errors``,
crates/model/src/process.rs:85-116).  Used by the errors pipeline to drop
error anomalies already present in a baseline run.
"""

from __future__ import annotations

from .chunk import scan_errors
from .tokenizer import process as tokenize
from .tokenizer import unordered_key
from .vectorize import SparseIndex, THRESHOLD, build_index, distances

__all__ = ["filter_anomalies", "train_error_tokens", "is_ansible_conv"]


def is_ansible_conv(conv_id: str) -> bool:
    """Conversation analog of Source::is_ansible (report.rs:479-485)."""
    name = conv_id.rsplit("/", 1)[-1]
    return name.startswith("job-output") or "ansible" in name


def filter_anomalies(
    index: SparseIndex,
    anomalies: list[dict],
    *,
    check_before: bool = False,
) -> list[dict]:
    """Keep only anomalies whose line (or, for ansible sources, any
    before-context line) is > THRESHOLD away from the baseline index
    (filter.rs:34-70)."""
    lines: list[str] = []
    for a in anomalies:
        if check_before:
            lines.extend(tokenize(b) for b in a["before"])
        lines.append(tokenize(a["text"]))
    d = distances(index, build_index(lines))
    fresh: list[dict] = []
    pos = 0
    for a in anomalies:
        skip = True
        if check_before:
            for _ in a["before"]:
                if skip and d[pos] > THRESHOLD:
                    skip = False
                pos += 1
        if not skip or d[pos] > THRESHOLD:
            fresh.append(a)
        pos += 1
    return fresh


def train_error_tokens(rows, *, is_ansible: bool) -> list[str]:
    """Token strings to index from a baseline conversation's errors
    (IndexTrainer::add_errors, process.rs:85-116): ansible sources also index
    the before-context lines and skip the per-source dedup."""
    anomalies, _, _ = scan_errors(rows, is_ansible=is_ansible)
    seen: set[str] = set()
    out: list[str] = []
    for a in anomalies:
        if is_ansible:
            out.extend(tokenize(b) for b in a["before"])
        tokens = tokenize(a["text"])
        key = unordered_key(tokens)
        if key not in seen:
            seen.add(key)
            out.append(tokens)
    return out
