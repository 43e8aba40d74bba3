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
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..chunk import scan_conversation, scan_errors
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


def _sorted_group(group: pa.Table) -> pa.Table:
    return group.sort_by("turn_idx")


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

    def __call__(self, group: pa.Table) -> pa.Table:
        group = _sorted_group(group)
        conv_id = group.column("conv_id")[0].as_py()
        cfg, ignored = self._resolve(conv_id)
        is_job = is_ansible_conv(conv_id)
        turn_idx = group.column("turn_idx").to_pylist()
        text = group.column("text").to_pylist()
        dedup_keys = group.column("dedup_key").to_pylist()
        distance = group.column("distance").to_pylist()
        has_index = group.column("has_index").to_pylist()
        group_keys = group.column("group_key").to_pylist()
        roles = group.column("role").to_pylist()
        tools = group.column("tool").to_pylist()

        out: list[dict] = []
        # unknown routing: groups with no baseline index are not scanned
        # (model.rs:665-673) — one row per (conv, group) with the row count
        unknown_sel = [i for i, h in enumerate(has_index) if not h and text[i]]
        if unknown_sel:
            per_group: dict[str, int] = {}
            for i in unknown_sel:
                per_group[group_keys[i]] = per_group.get(group_keys[i], 0) + 1
            for gk, cnt in sorted(per_group.items()):
                i = next(j for j in unknown_sel if group_keys[j] == gk)
                out.append(
                    {
                        "row_type": "unknown",
                        "conv_id": conv_id,
                        "role": roles[i],
                        "tool": tools[i],
                        "group_key": gk,
                        "line_count": cnt,
                        "byte_count": sum(
                            len(text[j].encode()) for j in unknown_sel if group_keys[j] == gk
                        ),
                    }
                )

        known_rows = [
            (turn_idx[i], text[i], dedup_keys[i], distance[i])
            for i in range(len(turn_idx))
            if has_index[i]
        ]
        anomalies, line_count, byte_count = scan_conversation(
            known_rows,
            skip_duplicates=cfg.skip_duplicate,
            is_job_output=is_job,
            gl_date=self.gl_date,
            ignored=ignored,
        )
        role0, tool0, gk0 = _role_tool_at(group)
        for a in anomalies:
            out.append(
                {
                    "row_type": "anomaly",
                    "conv_id": conv_id,
                    "turn_idx": a["turn_idx"],
                    "role": role0,
                    "tool": tool0,
                    "group_key": gk0,
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


class BlockScan:
    """Sorted-input fast path: scan complete conversations inside each block;
    conversations touching a block edge are re-emitted as ``fragment`` rows
    for a tiny repair shuffle (pipelines/report.py).

    Contract: the input dataset is globally sorted by (conv_id, turn_idx) so
    each conversation occupies one contiguous run of rows; blocks are
    contiguous slices.  The first and last conv_id of a block may continue
    in neighboring blocks → fragments; every interior conversation is
    complete and scans in place with zero data movement.
    """

    FRAGMENT_COLUMNS = [
        "conv_id", "turn_idx", "role", "tool", "group_key", "text",
        "dedup_key", "distance", "has_index",
    ]

    def __init__(self, inner):
        self.inner = inner  # ConversationScan or ErrorsScan

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty_scan_table()
        batch = batch.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        convs = batch.column("conv_id").to_pylist()
        first, last = convs[0], convs[-1]
        out: list[pa.Table] = []
        fragments: list[pa.Table] = []
        i = 0
        n = len(convs)
        while i < n:
            j = i
            while j < n and convs[j] == convs[i]:
                j += 1
            part = batch.slice(i, j - i)
            if convs[i] == first or convs[i] == last:
                fragments.append(part)
            else:
                out.append(self.inner(part))
            i = j
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


class ErrorsScan:
    """Errors-mode scan (ErrorsProcessor analog, errors.rs:116-194) — no
    baseline model required; per-source dedup skipped for ansible/job-output
    conversations (errors.rs:289-293)."""

    def __init__(self, config=None):
        from ..config import PipelineConfig

        self.config = config or PipelineConfig()
        self._resolve = ConversationScan._resolve.__get__(self)
        self._cfg_cache: dict[str, tuple] = {}

    def __call__(self, group: pa.Table) -> pa.Table:
        group = _sorted_group(group)
        conv_id = group.column("conv_id")[0].as_py()
        _, ignored = self._resolve(conv_id)
        rows = list(
            zip(group.column("turn_idx").to_pylist(), group.column("text").to_pylist())
        )
        anomalies, line_count, byte_count = scan_errors(
            rows, is_ansible=is_ansible_conv(conv_id), ignored=ignored
        )
        role0, tool0, gk0 = _role_tool_at(group)
        out = [
            {
                "row_type": "anomaly",
                "conv_id": conv_id,
                "turn_idx": a["turn_idx"],
                "role": role0,
                "tool": tool0,
                "group_key": gk0,
                "distance": a["distance"],
                "ts": a["ts"],
                "text": a["text"],
                "before": a["before"],
                "after": a["after"],
                "dedup_key": a["dedup_key"],
            }
            for a in anomalies
        ]
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
