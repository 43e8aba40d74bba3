"""The reference's Python-bindings surface (crates/python/src/lib.rs):
four flat functions — ``process`` / ``generate`` / ``index`` /
``search`` — so a user of the reference's ``logjuicer_rust`` module can
switch imports and keep their scripts.

- ``process(line)``: tokenize one log line (tokenizer.rs:588-608).
- ``generate(size)``: ``size`` deterministic random log lines joined by
  newlines (generate.rs:13-52 role; our stream is numpy-seeded so the
  BYTES differ from the Rust ChaCha8 stream, but the shape — 2-10 words
  of 2-18 alphanumeric chars per line, fixed seed — and determinism
  match).
- ``index(baselines)``: whitespace-hash feature index over the given
  lines (index.rs:30-41 ``into_feature``/``index_list``; lines are NOT
  tokenized here — same as the reference binding, which feeds raw
  strings straight to ``vectorize``).
- ``search(model, target)``: 1 − max cosine similarity against the
  indexed baselines ∈ [0, 1]; ~0 means the line is in the baseline
  (index.rs:43-50 ``search_list``).

These are driver-side, small-data conveniences; the distributed
pipelines live in ``logjuicer_ray.pipelines``.
"""

from __future__ import annotations

from .tokenizer import process  # noqa: F401  (re-export, reference name)

__all__ = ["process", "generate", "index", "search"]

_GEN_SEED = 42
_ALNUM = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ"
          "abcdefghijklmnopqrstuvwxyz0123456789")


def generate(size: int) -> str:
    """``size`` seeded random log lines joined by ``\\n``."""
    import numpy as np

    rng = np.random.default_rng(_GEN_SEED)
    alpha = np.frombuffer(_ALNUM.encode(), dtype=np.uint8)
    lines = []
    for _ in range(size):
        words = []
        for _ in range(int(rng.integers(2, 10))):
            n = int(rng.integers(2, 18))
            words.append(bytes(rng.choice(alpha, n)).decode())
        lines.append(" ".join(words))
    return "\n".join(lines)


def index(baselines: list[str]):
    """Feature index over raw lines (the opaque "model" the reference
    binding returns as a PyCapsule; here a ``vectorize.SparseIndex``)."""
    from .vectorize import build_index

    return build_index(list(baselines))


def search(model, target: str) -> float:
    """Distance of ``target`` to the indexed baselines (0 = present)."""
    from .vectorize import build_index, distances

    return float(distances(model, build_index([target]))[0])
