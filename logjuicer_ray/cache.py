"""Generational memo cache for the tokenizer hot paths.

The previous policy cleared the whole dict on overflow: with a real-world
unbounded vocabulary (the memo caps exist precisely because unique
hex/uuid material is unbounded) a steady stream of one-off keys wiped the
hot working set every few hundred thousand lines, re-paying the expensive
``process()``/classifier cost for the frequent lines too.

Two generations fix that at O(1) per op: on overflow the live dict becomes
the old generation (dropped wholesale on the NEXT overflow); hot keys touch
again quickly and re-promote into the live dict, so only genuinely cold
entries age out.  Worst-case memory is 2× the cap, matching the budget the
caps were chosen for.
"""

from __future__ import annotations

__all__ = ["GenCache"]

_MISSING = object()


class GenCache:
    __slots__ = ("max_entries", "live", "old")

    def __init__(self, max_entries: int):
        self.max_entries = max_entries
        self.live: dict = {}
        self.old: dict = {}

    def __len__(self) -> int:
        return len(self.live) + len(self.old)

    def __getitem__(self, key):
        try:
            return self.live[key]
        except KeyError:
            value = self.old[key]  # KeyError propagates on a true miss
            self[key] = value  # promote
            return value

    def get(self, key, default=None):
        v = self.live.get(key, _MISSING)
        if v is not _MISSING:
            return v
        v = self.old.get(key, _MISSING)
        if v is not _MISSING:
            self[key] = v
            return v
        return default

    def __setitem__(self, key, value) -> None:
        if len(self.live) >= self.max_entries:
            self.old = self.live
            self.live = {}
        self.live[key] = value
