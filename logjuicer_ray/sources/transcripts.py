"""Transcript sources: Parquet readers for the input_hint table.

The Content/Input analog (model.rs:339-357): a logical source of turns is a
``ray.data.Dataset`` read from Parquet; the baseline/target split is either a
``split`` column or separate paths.  Reads prune to the engine's columns.
"""

from __future__ import annotations

import ray.data as rd

TURN_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _default_num_blocks(path: str) -> int | None:
    """Small-file heuristic: Ray splits a small parquet into ~200 micro
    blocks whose per-task dispatch overhead dominates at bench scale; cap at
    2× the CPU count.  Inputs over ~2 GiB keep Ray's default block sizing
    (at real scale blocks should stay ≈128 MiB; pass ``num_blocks=0`` to
    force the default explicitly)."""
    try:
        import os

        if os.path.isfile(path) and os.path.getsize(path) > 2 << 30:
            return None
        import ray

        if ray.is_initialized():
            return max(8, 2 * int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        pass
    return None


def read_turns(path: str, *, split: str | None = None, columns=None, num_blocks=None):
    """Read a turns table; ``split`` filters on the generator's split column
    at the parquet scan (row-group pushdown)."""
    cols = list(columns or TURN_COLUMNS)
    if num_blocks is None:
        num_blocks = _default_num_blocks(path)
    kwargs = {}
    if num_blocks:
        kwargs["override_num_blocks"] = num_blocks
    if split is not None:
        import pyarrow.compute as pc

        ds = rd.read_parquet(
            path, columns=cols + ["split"], filter=pc.field("split") == split, **kwargs
        )
        return ds.select_columns(cols)
    return rd.read_parquet(path, columns=cols, **kwargs)


def baseline_and_target(path: str):
    return read_turns(path, split="baseline"), read_turns(path, split="target")


def read_turns_json(path: str, *, columns=None):
    """JSON-lines turns source (the reference's json LinesIterator analog,
    source.rs:28-48 — ours reads whole turn records, not split scalars)."""
    import ray.data as rd

    ds = rd.read_json(path)
    cols = list(columns or TURN_COLUMNS)
    return ds.map_batches(
        lambda t: t.select([c for c in cols if c in t.schema.names]),
        batch_format="pyarrow",
    )


def read_turns_csv(path: str, *, columns=None):
    """CSV turns source."""
    import ray.data as rd

    ds = rd.read_csv(path)
    cols = list(columns or TURN_COLUMNS)
    return ds.map_batches(
        lambda t: t.select([c for c in cols if c in t.schema.names]),
        batch_format="pyarrow",
    )
