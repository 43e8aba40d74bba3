"""Transcript sources: Parquet readers for the input_hint table.

The Content/Input analog (model.rs:339-357): a logical source of turns is a
``ray.data.Dataset`` read from Parquet; the baseline/target split is either a
``split`` column or separate paths.  Reads prune to the engine's columns.
"""

from __future__ import annotations

import ray.data as rd

TURN_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
# The flagship pipelines never consume the input ``ts`` column (anomaly
# timestamps are parsed from the text per reference semantics,
# timestamps.rs:22-109) — pruning it at the parquet scan saves its decode
# and one object-store copy per phase.
ENGINE_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool"]
# The errors scan does ~2× less work per row than the report scan, so its
# per-task cost at 2 MiB blocks is dispatch-dominated; 8 MiB measured best
# (32 CPUs: 12.8 → 8.4 s, 8 CPUs: 29.1 → 23.4 s at sf0.1).
ERRORS_BLOCK_MIB = 8


def _split_selectivity(path: str, split: str, *, cap_files: int = 64) -> float:
    """Estimated fraction of rows matching ``split == value``, from parquet
    row-group FOOTER statistics only (no data pages read; at most
    ``cap_files`` footers, sampled evenly across the directory).

    MEASURED DEAD END — kept opt-in (``GRAFT_SEL_ADJUST=1``), default OFF.
    The hypothesis was that filtered blocks carry 1/selectivity× the
    intended work; in fact with the sorted layout a block is either all-
    matching or all-dropped, so heavy blocks already sit AT the 2 MiB
    post-filter target and the adjustment just makes every block
    1/sel× finer.  A/B at sf0.1: the 32-CPU report scan was flat
    (26.3 → 25.8 s, noise) while train regressed ~3× (17 → 56–78 s e2e
    train phase) because finer baseline blocks gut the per-block
    unique-token dedup that keeps train's shuffle small."""
    import os

    import pyarrow.parquet as pq

    try:
        if os.path.isdir(path):
            files = sorted(
                os.path.join(path, f) for f in os.listdir(path)
                if f.endswith(".parquet")
            )
        else:
            files = [path]
        if not files:
            return 1.0
        if len(files) > cap_files:
            step = len(files) / cap_files
            files = [files[int(i * step)] for i in range(cap_files)]
        matched = total = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            if "split" not in idx:
                return 1.0
            ci = idx["split"]
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(ci)
                n = md.row_group(rg).num_rows
                total += n
                st = col.statistics
                if st is None or not st.has_min_max:
                    matched += n // 2  # unknown: assume half
                elif st.min == st.max:
                    matched += n if st.min == split else 0
                else:
                    matched += n // 2  # boundary row group
        if total == 0:
            return 1.0
        return max(matched / total, 0.0)
    except Exception:
        return 1.0


def _default_num_blocks(path: str, block_mib: int | None = None,
                        selectivity: float = 1.0) -> int | None:
    """Size-based block count, independent of the CPU count (the same job
    must produce the same block layout at any cluster size): target ~2 MiB
    of compressed parquet per block (~40k turn rows), floored at 16 for
    parallelism.  Measured sweep on the sf0.1 report pipeline (32 CPUs,
    scoring seconds): 12 MiB → 86 s (split-filtered blocks come out 0-or-
    250k rows, so the last task wave is ragged), 4 MiB → 49 s, **2 MiB →
    44 s**, 1 MiB → 78 s (per-task dispatch dominates).  The 8-CPU leg
    improves the same way (178 → 128 s), so this is wave-evenness, not a
    CPU-count fit.  Inputs over ~4 GiB keep Ray's default 128 MiB block
    sizing — at that scale task count ≫ CPU count and waves even out on
    their own (pass ``num_blocks=0`` to force the default explicitly)."""
    try:
        import os

        if os.path.isdir(path):
            size = sum(
                os.path.getsize(os.path.join(path, f))
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
        elif os.path.isfile(path):
            size = os.path.getsize(path)
        else:
            return None
        if size > 4 << 30:
            return None
        env = os.environ.get("GRAFT_BLOCK_MIB")
        if env is not None:
            # explicit user override beats per-phase defaults (callers pass
            # block_mib=ERRORS_BLOCK_MIB etc.; the env knob must still work)
            block_mib = int(env)
        elif block_mib is None:
            block_mib = 2
        # selectivity-adjusted: target block_mib of POST-filter bytes per
        # block (see _split_selectivity).  Adjustment capped at 8x so a
        # highly-selective filter cannot explode the task count; the extra
        # tasks on the non-matching section are ~1 ms no-ops.
        adj = min(8.0, 1.0 / max(selectivity, 1e-9))
        return max(16, int(size * adj) // (block_mib << 20))
    except Exception:
        return None


def read_turns(path: str, *, split: str | None = None, columns=None, num_blocks=None,
               block_mib: int | None = None):
    """Read a turns table; ``split`` filters on the generator's split column
    at the parquet scan (row-group pushdown).  ``block_mib`` overrides the
    per-phase read-block target (see ``_default_num_blocks``)."""
    cols = list(columns or TURN_COLUMNS)
    if num_blocks is None:
        import os as _os

        sel = 1.0
        if split is not None and _os.environ.get("GRAFT_SEL_ADJUST") == "1":
            sel = _split_selectivity(path, split)
        num_blocks = _default_num_blocks(path, block_mib=block_mib,
                                         selectivity=sel)
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
    return (
        read_turns(path, split="baseline", columns=ENGINE_COLUMNS),
        read_turns(path, split="target", columns=ENGINE_COLUMNS),
    )


def explode_lines_batch(batch, *, text_col: str = "text", delimiter: str = "\n",
                        max_line_bytes: int | None = None):
    """Split each row's text on ``delimiter`` into one output row per line
    (BytesLines/LinesIterator analog, iterator.rs:100-170: a record with
    embedded newlines is N lines to the reference, each independently
    byte-capped).  Vectorized: one Arrow ``split_pattern`` + ``list_flatten``
    and a ``take`` by parent index — no per-row Python.  Adds ``line_idx``
    (0-based position within the source row); single-line rows pass through
    with ``line_idx`` 0."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks() if col.num_chunks else pa.array([], pa.string())
    lists = pc.split_pattern(pc.fill_null(col, ""), pattern=delimiter)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    parents = pc.list_parent_indices(lists)
    flat = pc.list_flatten(lists)
    offsets = np.asarray(lists.offsets)
    lengths = np.diff(offsets)
    line_idx = np.arange(int(offsets[-1]) if len(offsets) else 0, dtype=np.int64)
    line_idx -= np.repeat(offsets[:-1], lengths)
    out = batch.drop_columns([text_col]).take(parents)
    out = out.append_column(text_col, flat).append_column(
        "line_idx", pa.array(line_idx, pa.int32())
    )
    if max_line_bytes:
        from ..stages.tokenize import truncate_text_column

        out = truncate_text_column(out, max_line_bytes, column=text_col)
    return out


def explode_lines(ds, *, text_col: str = "text", delimiter: str = "\n",
                  max_line_bytes: int | None = None):
    """Dataset-level line explode (see :func:`explode_lines_batch`)."""
    return ds.map_batches(
        explode_lines_batch,
        batch_format="pyarrow",
        fn_kwargs={
            "text_col": text_col,
            "delimiter": delimiter,
            "max_line_bytes": max_line_bytes,
        },
    )


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
