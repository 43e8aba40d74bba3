"""The trained model: per-(role,tool) baseline feature indexes.

Analog of the reference ``Model`` (crates/model/src/model.rs:76-104):
``{created_at, baselines, indexes: HashMap<IndexName, Index>}`` with version
discipline (MODEL_VERSION + magic, model.rs:50-53) and monoidal merge
(model.rs:118-217).  Persisted as one ``.npz`` per group plus a JSON
manifest; loaded once per scorer actor via a ``ray.put`` handle.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

from ..vectorize import HASH_NAME, SIZE, SparseIndex, merge_indexes

MODEL_VERSION = 1
MODEL_MAGIC = "LJRD"  # logjuicer-ray data


class GroupIndex:
    """Index + provenance (model.rs:96-104)."""

    __slots__ = ("index", "line_count", "byte_count", "train_time")

    def __init__(self, index: SparseIndex, line_count: int = 0, byte_count: int = 0,
                 train_time: float = 0.0):
        self.index = index
        self.line_count = line_count
        self.byte_count = byte_count
        self.train_time = train_time

    def mappend(self, other: "GroupIndex") -> "GroupIndex":
        return GroupIndex(
            merge_indexes([self.index, other.index]),
            self.line_count + other.line_count,
            self.byte_count + other.byte_count,
            self.train_time + other.train_time,
        )


class Model:
    def __init__(self, indexes: dict[str, GroupIndex] | None = None,
                 created_at: float | None = None):
        self.indexes: dict[str, GroupIndex] = indexes or {}
        self.created_at = created_at if created_at is not None else time.time()

    def lookup(self, group_key: str) -> SparseIndex | None:
        """Index for a group; falls back to the single index when exactly one
        exists regardless of key (lookup_or_single, model.rs:857-869 — this
        matters for diff-mode parity)."""
        gi = self.indexes.get(group_key)
        if gi is None and len(self.indexes) == 1:
            gi = next(iter(self.indexes.values()))
        return gi.index if gi is not None else None

    def mappend(self, other: "Model") -> "Model":
        """Monoidal merge (Model::mappend, model.rs:158-217)."""
        merged = dict(self.indexes)
        for key, gi in other.indexes.items():
            merged[key] = merged[key].mappend(gi) if key in merged else gi
        return Model(merged, max(self.created_at, other.created_at))

    @staticmethod
    def mconcat(models: list["Model"]) -> "Model":
        out = Model({}, 0.0)
        for m in models:
            out = out.mappend(m)
        return out

    # --- persistence (model.rs:793-853 analog: npz + manifest) -----------
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        manifest = {
            "magic": MODEL_MAGIC,
            "version": MODEL_VERSION,
            "hash": HASH_NAME,
            "dim": SIZE,
            "created_at": self.created_at,
            "groups": {},
        }
        for i, (key, gi) in enumerate(sorted(self.indexes.items())):
            fname = f"group_{i:05d}.npz"
            np.savez_compressed(os.path.join(path, fname), **gi.index.to_arrays())
            manifest["groups"][key] = {
                "file": fname,
                "rows": gi.index.nrows,
                "line_count": gi.line_count,
                "byte_count": gi.byte_count,
                "train_time": gi.train_time,
            }
        tmp = os.path.join(path, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, os.path.join(path, "manifest.json"))

    def is_stale(self, input_paths, max_age_s: float | None = None) -> bool:
        """Model-cache staleness (worker.rs:463-493 ``content.older_than``
        analog): stale when any input file (or file inside an input dir) is
        newer than ``created_at``, or when the model is older than
        ``max_age_s``."""
        if max_age_s is not None and time.time() - self.created_at > max_age_s:
            return True
        for p in input_paths or []:
            if p is None:
                continue
            if os.path.isdir(p):
                mtimes = [
                    os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p)
                ]
                mt = max(mtimes, default=0.0)
            elif os.path.exists(p):
                mt = os.path.getmtime(p)
            else:
                continue
            if mt > self.created_at:
                return True
        return False

    @classmethod
    def load_if_fresh(cls, path: str, inputs, max_age_s: float | None = None):
        """Load a saved model unless missing, incompatible, or stale vs the
        inputs — the worker-cache decision in one call; None → retrain."""
        try:
            model = cls.load(path)
        except (FileNotFoundError, ValueError):
            return None
        return None if model.is_stale(inputs, max_age_s) else model

    @classmethod
    def load(cls, path: str) -> "Model":
        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        if manifest.get("magic") != MODEL_MAGIC:
            raise ValueError("not a logjuicer-ray model directory")
        if manifest.get("version") != MODEL_VERSION or manifest.get("hash") != HASH_NAME:
            # same discipline as the reference version check (model.rs:828-840)
            raise ValueError(
                f"incompatible model (version={manifest.get('version')}, "
                f"hash={manifest.get('hash')}); retrain required"
            )
        indexes = {}
        for key, info in manifest["groups"].items():
            with np.load(os.path.join(path, info["file"])) as arrays:
                idx = SparseIndex.from_arrays(arrays)
            indexes[key] = GroupIndex(
                idx, info["line_count"], info["byte_count"], info.get("train_time", 0.0)
            )
        return cls(indexes, manifest["created_at"])
