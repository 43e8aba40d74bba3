"""Sequential single-process reference implementation of the report pipeline.

Built from the same pure kernels (tokenizer/vectorize/chunk) but with none of
the Ray plumbing — no batches, no shuffles, no salting, no actor pools.  The
e2e tests assert the distributed pipeline reproduces this oracle bit-for-bit
(per-sink counts, routed rows, per-turn text equality under (conv_id,
turn_idx) order), which is the north-rule parity check.
"""

from collections import defaultdict

import numpy as np
import pyarrow as pa

from logjuicer_ray.chunk import scan_conversation, scan_errors
from logjuicer_ray.filtering import is_ansible_conv
from logjuicer_ray.index_name import group_key
from logjuicer_ray.tokenizer import process as tokenize
from logjuicer_ray.tokenizer import unordered_key
from logjuicer_ray.vectorize import build_index, distances


def _cap(text: str, max_bytes: int = 6000) -> str:
    """Byte-based line cap matching the engine's ingest truncation
    (iterator.rs:155-157; a dangling partial UTF-8 char at the cut drops)."""
    b = text.encode("utf-8", "surrogatepass")
    if len(b) <= max_bytes:
        return text
    return b[:max_bytes].decode("utf-8", "ignore")


def _rows(table: pa.Table):
    cols = [table.column(n).to_pylist() for n in ("conv_id", "turn_idx", "role", "text", "tool")]
    return sorted(zip(*cols), key=lambda r: (r[0], r[1]))


def oracle_train(baseline: pa.Table):
    groups = defaultdict(list)
    for conv, turn, role, text, tool in _rows(baseline):
        if not text:
            continue
        groups[group_key(role, tool)].append(_cap(text))
    indexes = {}
    for gk, lines in groups.items():
        seen, toks = set(), []
        for line in lines:
            t = tokenize(line)
            k = unordered_key(t)
            if k not in seen:
                seen.add(k)
                toks.append(t)
        indexes[gk] = build_index(toks)
    return indexes


def oracle_report(baseline: pa.Table, target: pa.Table, *, skip_duplicate=True):
    indexes = oracle_train(baseline)
    single = next(iter(indexes.values())) if len(indexes) == 1 else None

    per_conv = defaultdict(list)
    for conv, turn, role, text, tool in _rows(target):
        per_conv[conv].append((turn, role, text, tool))

    anomalies = []
    counts = {}
    unknown = defaultdict(lambda: [0, 0])
    for conv in sorted(per_conv):
        rows = per_conv[conv]
        pending = []  # (turn, text, toks, index) for batched scoring
        for turn, role, text, tool in rows:
            gk = group_key(role, tool)
            index = indexes.get(gk, single)
            if index is None:
                if text:
                    unknown[(conv, gk)][0] += 1
                    unknown[(conv, gk)][1] += len(text.encode())
                continue
            text = _cap(text) if text else text
            toks = tokenize(text) if text else ""
            pending.append((turn, text, toks, index))
        # batch the distance computation per (conv, index)
        known = []
        by_index: dict[int, list[int]] = defaultdict(list)
        for i, (_, _, _, idx) in enumerate(pending):
            by_index[id(idx)].append(i)
        dists = [1.0] * len(pending)
        for sel in by_index.values():
            idx = pending[sel[0]][3]
            d = distances(idx, build_index([pending[i][2] for i in sel]))
            for j, i in enumerate(sel):
                dists[i] = float(d[j])
        for (turn, text, toks, _), d in zip(pending, dists):
            known.append((turn, text, unordered_key(toks), d))
        found, line_count, byte_count = scan_conversation(
            known, skip_duplicates=skip_duplicate, is_job_output=is_ansible_conv(conv)
        )
        counts[conv] = (line_count, byte_count)
        for a in found:
            anomalies.append({**a, "conv_id": conv})

    if skip_duplicate:
        best = {}
        for a in anomalies:
            k = a["dedup_key"]
            if k not in best or (a["conv_id"], a["turn_idx"]) < (
                best[k]["conv_id"],
                best[k]["turn_idx"],
            ):
                best[k] = a
        anomalies = sorted(best.values(), key=lambda a: (a["conv_id"], a["turn_idx"]))
    else:
        anomalies.sort(key=lambda a: (a["conv_id"], a["turn_idx"]))

    reports = {}
    for a in anomalies:
        c = a["conv_id"]
        r = reports.setdefault(c, [0, 0.0])
        r[0] += 1
        r[1] += a["distance"]
    report_rows = []
    for c, (n, sd) in reports.items():
        mean = np.float32(sd) / np.float32(n)
        pin = is_ansible_conv(c) and c.rsplit("/", 1)[-1].startswith("job-output")
        report_rows.append(
            {
                "conv_id": c,
                "anomaly_count": n,
                "line_count": counts[c][0],
                "byte_count": counts[c][1],
                "mean_distance": float(mean),
                "sort_key": 42.0 if pin else float(mean),
            }
        )
    report_rows.sort(key=lambda r: -r["sort_key"])
    unknown_rows = [
        {"conv_id": c, "group_key": gk, "line_count": n, "byte_count": b}
        for (c, gk), (n, b) in sorted(unknown.items(), key=lambda kv: (kv[0][1], kv[0][0]))
    ]
    return anomalies, report_rows, unknown_rows


def oracle_errors(target: pa.Table, *, skip_duplicate=True):
    per_conv = defaultdict(list)
    for conv, turn, role, text, tool in _rows(target):
        per_conv[conv].append((turn, _cap(text) if text else text))
    anomalies = []
    for conv in sorted(per_conv):
        found, _, _ = scan_errors(per_conv[conv], is_ansible=is_ansible_conv(conv))
        for a in found:
            anomalies.append({**a, "conv_id": conv})
    if skip_duplicate:
        best = {}
        for a in anomalies:
            k = a["dedup_key"]
            if k not in best or (a["conv_id"], a["turn_idx"]) < (
                best[k]["conv_id"],
                best[k]["turn_idx"],
            ):
                best[k] = a
        anomalies = sorted(best.values(), key=lambda a: (a["conv_id"], a["turn_idx"]))
    else:
        anomalies.sort(key=lambda a: (a["conv_id"], a["turn_idx"]))
    return anomalies
