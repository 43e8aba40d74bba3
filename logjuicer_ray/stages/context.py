"""Per-conversation map_groups stages: anomaly-context assembly and errors
extraction.

These wrap the pure scan kernels (logjuicer_ray.chunk) for
``groupby("conv_id").map_groups(..., batch_format="pyarrow")`` — shuffle #2
keyed on ``conv_id``, rows sorted by ``turn_idx`` inside the group (the
sequential-context semantics of process.rs:126-436 / errors.rs:65-194 demand
ordered processing).

The stage emits a single mixed table per conversation with ``row_type``:

- ``anomaly``: one row per anomaly context;
- ``counts``:  one row per conversation (line/byte counters — LineCounters
  parity, model.rs:451-470);
- ``unknown``: one row per (conversation, group) whose group has no baseline
  index (unknown_files routing, model.rs:665-673).

Emitting all three from the one shuffle avoids re-executing the
tokenize+score stages once per sink.

Hot-path note: the overwhelmingly common conversation contains ZERO anomaly
candidates, so both scans first run a vectorized candidate check (Arrow/numpy
masks over the whole conversation); only conversations that might emit an
anomaly (or contain the job-output cut marker) pay the sequential Python
scan.  Counters for the rest come from Arrow reductions — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..chunk import JOB_OUTPUT_MARKER, THRESHOLD, scan_conversation, scan_errors
from ..errors_parser import _ERROR_LINE_RE, _GO_PANIC, _PY_TB  # noqa: F401
from ..filtering import is_ansible_conv

__all__ = ["SCAN_SCHEMA", "ConversationScan", "ErrorsScan", "empty_scan_table"]

SCAN_SCHEMA = pa.schema(
    [
        ("row_type", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("tool", pa.string()),
        ("group_key", pa.string()),
        ("distance", pa.float32()),
        ("ts", pa.timestamp("ms")),
        ("text", pa.string()),
        ("before", pa.list_(pa.string())),
        ("after", pa.list_(pa.string())),
        ("dedup_key", pa.string()),
        ("line_count", pa.int64()),
        ("byte_count", pa.int64()),
        # carried only on row_type="fragment" rows (sorted-input mode)
        ("has_index", pa.bool_()),
    ]
)


def empty_scan_table() -> pa.Table:
    return SCAN_SCHEMA.empty_table()


def _rows_to_table(rows: list[dict]) -> pa.Table:
    if not rows:
        return empty_scan_table()
    cols = {name: [] for name in SCAN_SCHEMA.names}
    for r in rows:
        for name in SCAN_SCHEMA.names:
            cols[name].append(r.get(name))
    return pa.table(
        {n: pa.array(cols[n], SCAN_SCHEMA.field(n).type) for n in SCAN_SCHEMA.names}
    )


def _counts_table(conv_id, role, tool, gk, line_count, byte_count) -> pa.Table:
    return _rows_to_table(
        [
            {
                "row_type": "counts",
                "conv_id": conv_id,
                "role": role,
                "tool": tool,
                "group_key": gk,
                "line_count": int(line_count),
                "byte_count": int(byte_count),
            }
        ]
    )


def _np(col) -> np.ndarray:
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return a.to_numpy(zero_copy_only=False)


def _order_group(group: pa.Table, presorted: bool) -> pa.Table:
    """Canonical in-conversation ordering.  Plain mode: sort by turn_idx.
    Split-multiline mode (a ``line_idx`` column is present): sort by
    (turn_idx, line_idx), then renumber ``turn_idx`` to the line ordinal —
    the reference's per-source line_number (iterator.rs:100-170) — and drop
    ``line_idx`` so every downstream consumer sees the plain schema."""
    if "line_idx" not in group.schema.names:
        return group if presorted else group.sort_by("turn_idx")
    if not presorted:
        group = group.sort_by(
            [("turn_idx", "ascending"), ("line_idx", "ascending")]
        )
    idx = group.schema.get_field_index("turn_idx")
    group = group.set_column(
        idx, "turn_idx", pa.array(np.arange(group.num_rows, dtype=np.int32))
    )
    return group.drop_columns(["line_idx"])


def _role_tool_at(group: pa.Table, idx: int = 0) -> tuple[str, str, str]:
    role = group.column("role")[idx].as_py()
    tool = group.column("tool")[idx].as_py()
    gk = group.column("group_key")[idx].as_py()
    return role, tool, gk


class ConversationScan:
    """Context assembly for scored conversations (ChunkProcessor analog)."""

    def __init__(self, config=None, gl_date: int | None = None):
        from ..config import PipelineConfig

        self.config = config or PipelineConfig()
        self.gl_date = gl_date
        self._cfg_cache: dict[str, tuple] = {}

    def _resolve(self, conv_id: str):
        """Per-conversation config (matchers analog, config.rs:224-249);
        compiled ignore regexes cached per effective config."""
        if not self.config.matchers:
            key = ""
        else:
            key = conv_id
        hit = self._cfg_cache.get(key)
        if hit is None:
            cfg = self.config.for_conv(conv_id)
            hit = (cfg, cfg.ignored_fn())
            if len(self._cfg_cache) > 4096:
                self._cfg_cache.clear()
            self._cfg_cache[key] = hit
        return hit

    def _count_mask_np(self, batch: pa.Table) -> np.ndarray:
        """Rows counted by the fast-path counters: indexed, non-empty text
        (known_mask of ``__call__``)."""
        text = pc.fill_null(batch.column("text"), "")
        valid = pc.not_equal(text, "")
        has_index = pc.fill_null(batch.column("has_index"), False)
        return _np(pc.and_(has_index, valid))

    def _slow_mask_np(self, batch, codes, starts, ends):
        """Boolean row mask: rows that force their conversation through the
        exact per-conversation scan (a SUPERSET is safe — flagged rows only
        cost the slow path, never change output).  ``None`` = no block-level
        fast path possible (per-conversation config varies or ignore
        patterns are active)."""
        if self.config.matchers or self.config.ignore_patterns:
            return None
        text = pc.fill_null(batch.column("text"), "")
        valid = pc.not_equal(text, "")
        has_index = pc.fill_null(batch.column("has_index"), False)
        # unknown routing needed
        slow = pc.and_(pc.invert(has_index), valid)
        # anomaly candidate
        slow = pc.or_(
            slow,
            pc.and_(
                pc.and_(has_index, valid),
                pc.greater(
                    pc.fill_null(batch.column("distance"), 0.0),
                    pa.scalar(THRESHOLD, pa.float32()),
                ),
            ),
        )
        # job-output cut marker (superset: flagged even for non-job convs)
        slow = pc.or_(slow, pc.match_substring(text, JOB_OUTPUT_MARKER))
        return _np(slow)

    def __call__(self, group: pa.Table, presorted: bool = False) -> pa.Table:
        group = _order_group(group, presorted)
        conv_id = group.column("conv_id")[0].as_py()
        cfg, ignored = self._resolve(conv_id)
        is_job = is_ansible_conv(conv_id)

        text = pc.fill_null(group.column("text"), "")
        valid = pc.not_equal(text, "")
        has_index = pc.fill_null(group.column("has_index"), False)
        role0, tool0, gk0 = _role_tool_at(group)

        out_tables: list[pa.Table] = []
        # unknown routing: groups with no baseline index are not scanned
        # (model.rs:665-673) — one row per (conv, group) with the row count
        unk_mask = pc.and_(pc.invert(has_index), valid)
        if pc.any(unk_mask).as_py():
            unk = group.filter(unk_mask)
            codes = _np(unk.column("group_key").dictionary_encode())
            _, first_idx = np.unique(codes, return_index=True)
            nbytes = _np(pc.cast(pc.binary_length(unk.column("text")), pa.int64()))
            rows = []
            for fi in first_idx:
                c = codes[fi]
                sel = codes == c
                rows.append(
                    {
                        "row_type": "unknown",
                        "conv_id": conv_id,
                        "role": unk.column("role")[fi].as_py(),
                        "tool": unk.column("tool")[fi].as_py(),
                        "group_key": unk.column("group_key")[fi].as_py(),
                        "line_count": int(sel.sum()),
                        "byte_count": int(nbytes[sel].sum()),
                    }
                )
            rows.sort(key=lambda r: r["group_key"])
            out_tables.append(_rows_to_table(rows))

        known_mask = pc.and_(has_index, valid)
        # vectorized fast path: a conversation with no row over the anomaly
        # threshold (and no job-output cut) emits only its counts row
        if not cfg.ignore_patterns:
            cand = pc.and_(
                known_mask,
                pc.greater(
                    pc.fill_null(group.column("distance"), 0.0),
                    pa.scalar(THRESHOLD, pa.float32()),
                ),
            )
            cut = is_job and pc.any(pc.match_substring(text, JOB_OUTPUT_MARKER)).as_py()
            if not cut and not pc.any(cand).as_py():
                n_lines = pc.sum(pc.cast(known_mask, pa.int64())).as_py() or 0
                nb = (
                    pc.sum(
                        pc.if_else(
                            known_mask, pc.binary_length(text), pa.scalar(0, pa.int32())
                        )
                    ).as_py()
                    or 0
                )
                out_tables.append(
                    _counts_table(conv_id, role0, tool0, gk0, n_lines, nb)
                )
                return (
                    pa.concat_tables(out_tables)
                    if len(out_tables) > 1
                    else out_tables[0]
                )

        known = group.filter(known_mask)
        known_rows = list(
            zip(
                known.column("turn_idx").to_pylist(),
                known.column("text").to_pylist(),
                known.column("dedup_key").to_pylist(),
                known.column("distance").to_pylist(),
            )
        )
        anomalies, line_count, byte_count = scan_conversation(
            known_rows,
            skip_duplicates=cfg.skip_duplicate,
            is_job_output=is_job,
            gl_date=self.gl_date,
            ignored=ignored,
        )
        out: list[dict] = []
        if anomalies:
            # per-anomaly attribution: each anomaly carries ITS turn's
            # role/tool/group_key (mixed-role conversations are the norm in
            # real transcripts; the conversation's first row would be wrong)
            turn_np = _np(pc.cast(known.column("turn_idx"), pa.int64()))
            roles = known.column("role")
            tools = known.column("tool")
            gks = known.column("group_key")
            for a in anomalies:
                i = int(np.searchsorted(turn_np, a["turn_idx"]))
                out.append(
                    {
                        "row_type": "anomaly",
                        "conv_id": conv_id,
                        "turn_idx": a["turn_idx"],
                        "role": roles[i].as_py(),
                        "tool": tools[i].as_py(),
                        "group_key": gks[i].as_py(),
                        "distance": a["distance"],
                        "ts": a["ts"],
                        "text": a["text"],
                        "before": a["before"],
                        "after": a["after"],
                        "dedup_key": a["dedup_key"],
                    }
                )
        out.append(
            {
                "row_type": "counts",
                "conv_id": conv_id,
                "role": role0,
                "tool": tool0,
                "group_key": gk0,
                "line_count": line_count,
                "byte_count": byte_count,
            }
        )
        out_tables.append(_rows_to_table(out))
        return pa.concat_tables(out_tables) if len(out_tables) > 1 else out_tables[0]


class BlockScan:
    """Sorted-input fast path: scan complete conversations inside each block;
    conversations touching a block edge are re-emitted as ``fragment`` rows
    for a tiny repair shuffle (pipelines/report.py).

    Contract: the input dataset is globally sorted by (conv_id, turn_idx) so
    each conversation occupies one contiguous run of rows; blocks are
    contiguous slices.  The first and last conv_id of a block may continue
    in neighboring blocks → fragments; every interior conversation is
    complete and scans in place with zero data movement.

    Block-level pre-check: the inner scan exposes ``block_masks`` marking
    the rows that could make a conversation emit an anomaly (or need
    unknown routing).  Conversations with zero such rows — the
    overwhelming majority — get their counts row from ONE segmented
    reduction over the whole block; only the rest pay the per-conversation
    slice + Python scan.  (Per-conversation Arrow slicing costs ~3 ms × ~1k
    conversations per 250k-row block, half the stage's wall time.)
    """

    FRAGMENT_COLUMNS = [
        "conv_id", "turn_idx", "role", "tool", "group_key", "text",
        "dedup_key", "distance", "has_index",
    ]

    def __init__(self, inner):
        self.inner = inner  # ConversationScan or ErrorsScan

    def _fast_counts(self, batch, codes, starts, ends, conv_mask) -> pa.Table:
        """One counts row per fast-path conversation, all from segmented
        numpy reductions — no per-conversation Arrow work."""
        count_mask = self.inner._count_mask_np(batch)
        text = pc.fill_null(batch.column("text"), "")
        nbytes = _np(pc.cast(pc.binary_length(text), pa.int64()))
        nbytes = np.where(count_mask, nbytes, 0)
        seg_lines = np.add.reduceat(count_mask.astype(np.int64), starts)
        seg_bytes = np.add.reduceat(nbytes, starts)
        sel = np.flatnonzero(conv_mask)
        first_idx = pa.array(starts[sel], pa.int64())
        n_out = len(sel)
        return pa.table(
            {
                "row_type": pa.array(["counts"] * n_out, pa.string()),
                "conv_id": batch.column("conv_id").take(first_idx),
                "turn_idx": pa.nulls(n_out, pa.int32()),
                "role": batch.column("role").take(first_idx),
                "tool": batch.column("tool").take(first_idx),
                "group_key": batch.column("group_key").take(first_idx),
                "distance": pa.nulls(n_out, pa.float32()),
                "ts": pa.nulls(n_out, pa.timestamp("ms")),
                "text": pa.nulls(n_out, pa.string()),
                "before": pa.nulls(n_out, pa.list_(pa.string())),
                "after": pa.nulls(n_out, pa.list_(pa.string())),
                "dedup_key": pa.nulls(n_out, pa.string()),
                "line_count": pa.array(seg_lines[sel], pa.int64()),
                "byte_count": pa.array(seg_bytes[sel], pa.int64()),
                "has_index": pa.nulls(n_out, pa.bool_()),
            }
        )

    @staticmethod
    def _codes(batch: pa.Table) -> np.ndarray:
        col = batch.column("conv_id")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks() if col.num_chunks else pa.array([], pa.string())
        enc = col.dictionary_encode()
        return enc.indices.to_numpy(zero_copy_only=False)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty_scan_table()
        # int32 dictionary codes, not decoded strings: boundary detection and
        # fragment checks are integer compares, no per-row Python strings
        codes = self._codes(batch)
        n = len(codes)
        bnd = codes[1:] != codes[:-1]
        # the declared contract is (conv_id, turn_idx)-sorted input; verify
        # cheaply (each conv one contiguous run + turn_idx ascending within)
        # instead of unconditionally re-sorting — sort_by copies the whole
        # block including the text column, the scan stage's measured top cost
        turn = _np(pc.cast(batch.column("turn_idx"), pa.int64()))
        grouped = int(bnd.sum()) + 1 == int(codes.max()) + 1
        ordered = bool(np.all(bnd | (turn[1:] >= turn[:-1]))) if n > 1 else True
        if not (grouped and ordered):
            batch = batch.sort_by(
                [("conv_id", "ascending"), ("turn_idx", "ascending")]
            )
            codes = self._codes(batch)
            bnd = codes[1:] != codes[:-1]
        starts = np.flatnonzero(np.r_[True, bnd])
        ends = np.r_[starts[1:], n]
        out: list[pa.Table] = []
        fragments: list[pa.Table] = []
        first_code, last_code = codes[0], codes[-1]

        slow_rows = self.inner._slow_mask_np(batch, codes, starts, ends)
        is_frag = (codes[starts] == first_code) | (codes[starts] == last_code)
        if slow_rows is None:
            conv_slow = np.ones(len(starts), dtype=bool)
        else:
            conv_slow = np.add.reduceat(slow_rows.astype(np.int64), starts) > 0
        fast_convs = ~conv_slow & ~is_frag
        if fast_convs.any():
            out.append(self._fast_counts(batch, codes, starts, ends, fast_convs))
        for ci in np.flatnonzero(is_frag | conv_slow):
            s, e = starts[ci], ends[ci]
            part = batch.slice(s, e - s)
            if is_frag[ci]:
                fragments.append(part)
            else:
                out.append(self.inner(part, presorted=True))
        if fragments:
            frag = pa.concat_tables(fragments)
            cols = {}
            for name in SCAN_SCHEMA.names:
                typ = SCAN_SCHEMA.field(name).type
                if name == "row_type":
                    cols[name] = pa.array(["fragment"] * frag.num_rows, typ)
                elif name in frag.schema.names:
                    cols[name] = frag.column(name).cast(typ)
                else:
                    cols[name] = pa.nulls(frag.num_rows, typ)
            out.append(pa.table(cols))
        if not out:
            return empty_scan_table()
        # combine: the per-conversation mini-tables would otherwise leave
        # hundreds of chunks per block, which makes every downstream
        # serialize/iterate pass O(chunks)
        return pa.concat_tables([t.cast(SCAN_SCHEMA) for t in out]).combine_chunks()


# conservative superset of lines that can start/complete an error anomaly:
# the standalone-error regex, the Python-traceback marker and the Go panic
# marker (errors_parser.rs:46-198).  A conversation with zero such lines can
# not emit an anomaly, so it takes the vectorized counts-only path.
_ERROR_TRIGGER_RE = f"(?:{_ERROR_LINE_RE.pattern})"


class ErrorsScan:
    """Errors-mode scan (ErrorsProcessor analog, errors.rs:116-194) — no
    baseline model required; per-source dedup skipped for ansible/job-output
    conversations (errors.rs:289-293)."""

    def __init__(self, config=None):
        from ..config import PipelineConfig

        self.config = config or PipelineConfig()
        self._resolve = ConversationScan._resolve.__get__(self)
        self._cfg_cache: dict[str, tuple] = {}

    def _count_mask_np(self, batch: pa.Table) -> np.ndarray:
        text = pc.fill_null(batch.column("text"), "")
        return _np(pc.not_equal(text, ""))

    def _slow_mask_np(self, batch, codes, starts, ends):
        """Rows that can start/complete an error anomaly (see
        ``_ERROR_TRIGGER_RE``); superset-safe, ``None`` when per-conv config
        varies or ignore patterns are active."""
        if self.config.matchers or self.config.ignore_patterns:
            return None
        text = pc.fill_null(batch.column("text"), "")
        valid = pc.not_equal(text, "")
        trig = pc.or_(
            pc.match_substring_regex(text, _ERROR_TRIGGER_RE),
            pc.or_(
                pc.match_substring(text, _PY_TB),
                pc.match_substring(text, _GO_PANIC),
            ),
        )
        return _np(pc.and_(trig, valid))

    def __call__(self, group: pa.Table, presorted: bool = False) -> pa.Table:
        group = _order_group(group, presorted)
        conv_id = group.column("conv_id")[0].as_py()
        cfg, ignored = self._resolve(conv_id)
        role0, tool0, gk0 = _role_tool_at(group)
        text = pc.fill_null(group.column("text"), "")
        valid = pc.not_equal(text, "")

        # vectorized trigger check (superset): no error-regex hit, no
        # traceback/panic marker → counts row only, zero per-row Python
        if not cfg.ignore_patterns:
            trig = pc.or_(
                pc.match_substring_regex(text, _ERROR_TRIGGER_RE),
                pc.or_(
                    pc.match_substring(text, _PY_TB),
                    pc.match_substring(text, _GO_PANIC),
                ),
            )
            if not pc.any(pc.and_(trig, valid)).as_py():
                n_lines = pc.sum(pc.cast(valid, pa.int64())).as_py() or 0
                nb = pc.sum(
                    pc.if_else(valid, pc.binary_length(text), pa.scalar(0, pa.int32()))
                ).as_py() or 0
                return _counts_table(conv_id, role0, tool0, gk0, n_lines, nb)

        turn_list = group.column("turn_idx").to_pylist()
        rows = list(zip(turn_list, group.column("text").to_pylist()))
        anomalies, line_count, byte_count = scan_errors(
            rows, is_ansible=is_ansible_conv(conv_id), ignored=ignored
        )
        out: list[dict] = []
        if anomalies:
            turn_np = np.asarray(turn_list, dtype=np.int64)
            roles = group.column("role")
            tools = group.column("tool")
            gks = group.column("group_key")
            for a in anomalies:
                i = int(np.searchsorted(turn_np, a["turn_idx"]))
                out.append(
                    {
                        "row_type": "anomaly",
                        "conv_id": conv_id,
                        "turn_idx": a["turn_idx"],
                        "role": roles[i].as_py(),
                        "tool": tools[i].as_py(),
                        "group_key": gks[i].as_py(),
                        "distance": a["distance"],
                        "ts": a["ts"],
                        "text": a["text"],
                        "before": a["before"],
                        "after": a["after"],
                        "dedup_key": a["dedup_key"],
                    }
                )
        out.append(
            {
                "row_type": "counts",
                "conv_id": conv_id,
                "role": role0,
                "tool": tool0,
                "group_key": gk0,
                "line_count": line_count,
                "byte_count": byte_count,
            }
        )
        return _rows_to_table(out)
