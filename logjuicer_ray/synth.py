"""Deterministic synthetic transcript generator.

The engine's input table (BASELINE.json input_hint) is a Parquet table of
multi-turn conversation / agent transcripts:

    conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
    ts:timestamp[ms]  (+ a ``split`` column: "baseline" | "target")

This module mirrors the role of the reference's seeded generator
(crates/generate/src/generate.rs:13-52): fully deterministic, parameterized
by scale factor.  Every conversation draws from its own
``default_rng((SEED, conv_index))`` stream, so generation parallelizes over
conversations (plain Ray tasks when a Ray session is up) while producing a
byte-identical table regardless of partitioning — rows are emitted in
(conv_id, turn_idx) order.

Planted fixture features (FIXTURES.md §F1):

- target turns drawn from the same template pool as the baseline (tokenize
  equal → distance ~0) with fresh random material (uuids, hex, ips, tmp
  paths) per row;
- planted anomaly turns (~1% of target turns) incl. error-pattern lines and
  multi-turn Python tracebacks (exercising the errors state machine);
- duplicate turns within conversations (dedup semantics);
- a ``job-output`` conversation with a ``TASK [run-logjuicer`` cut marker;
- a hot conversation (~20× median turns) and a hot (role, tool) group
  (~50% of rows) — the skew/salting path;
- NULL ``ts`` rows and turns whose text embeds full timestamps (timestamp
  backfill / set_date rollover).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["generate_turns", "ensure_turns", "synth_path", "sf_from_dir", "GROUPS"]

SEED = 42
ROWS_PER_SF = 200_000_000  # sf0.001 → 200k rows, sf0.1 → 20M rows
AVG_TURNS = 200
BASE_EPOCH_MS = 1_706_745_600_000  # 2024-02-01T00:00:00Z

# (role, tool) groups; the first is the hot group
GROUPS = [
    ("assistant", "bash"),
    ("assistant", "editor"),
    ("assistant", "search"),
    ("tool", "bash"),
    ("tool", "browser"),
    ("user", ""),
    ("system", ""),
]
_GROUP_WEIGHTS = np.array([0.50, 0.12, 0.10, 0.10, 0.08, 0.06, 0.04])

# Normal templates — each tokenizes to a stable token string regardless of
# the random material filled in ({hex}, {uuid}, {ip}, {num}).
_TEMPLATES = [
    "2024-02-1{d} 0{h}:1{m}:2{s},140 INFO worker {hex} processed request req-{uuid} in {num}ms",
    "starting service unit {hex} with config /etc/service/conf.yaml retries={num}",
    "connection established toward https://{ip}/identity/v3/auth/tokens status {num}",
    "writing output chunk {num} into /tmp/tmp{hex} staging area done",
    "cache lookup finished entries={num} misses={num} backend redis://{ip}:6379",
    "scheduler assigned task {uuid} onto node compute-{hex} within quota",
    "periodic health probe succeeded latency {num}ms endpoint {ip}:8080",
    "applying configuration snapshot {hex} revision {num} onto cluster member",
    "downloaded artifact sha256:{hex}{hex} size {num} bytes from mirror",
    "1{h}:2{m}:3{s}.812 DEBUG reconcile loop iteration {num} drift corrected",
    "session token refreshed AUTH_{hex} expires within {num} seconds",
    "queue depth currently {num} consumer lag {num}ms partition {num}",
    "volume attachment completed device /dev/vd{d} instance {uuid}",
    "metrics exporter flushed {num} samples toward collector {ip}:4317",
    "ansible task completed changed={num} unreachable=0 rc=0 host node-{hex}",
    "image prefetch finished layer {hex}{hex} registry mirror {ip}:5000",
    "leader election renewed lease holder compute-{hex} term {num}",
    # numeric secret id: folds to one token string (unbounded-vocabulary
    # templates make the baseline index grow linearly with data — the real
    # tokenizer's %-folding exists precisely to prevent that)
    "rotating credential secret_{num} next rotation within {num} hours",
    "tempest.lib.common.rest_client [req-{uuid} ] Request (main): 201 POST https://{ip}/identity/v3/auth/tokens",
    "garbage collector reclaimed {num} objects heap now {num}MB",
]

# Anomaly templates — never appear in baseline conversations.  A few match
# the errors-mode regexes too (errors_parser.rs:148-198).
_ANOMALY_TEMPLATES = [
    "ERROR 5032 (HY000): cannot connect to upstream server on '{ip}' ({num})",
    "unexpected disconnect from peer {ip} during replication stream",
    "kernel oops detected at address 0x{hex} while handling interrupt",
    "corrupted checkpoint manifest {hex} found during recovery scan",
    "watchdog timeout expired after {num}ms forcing emergency restart",
    "[Zuul] Job complete, result: FAILURE",
    "assertion mismatch expected {num} observed {num} in invariant check",
    "fatal: unable to resolve dependency graph cycle at package {hex}",
]

# A multi-turn Python traceback planted as consecutive turns
_TRACEBACK_TURNS = [
    "Traceback (most recent call last):",
    '  File "/opt/agent/executor.py", line {num}, in run_step',
    "    result = handler.invoke(payload)",
    '  File "/opt/agent/handler.py", line {num}, in invoke',
    "    raise RuntimeError('tool invocation failed')",
    "RuntimeError: tool invocation failed",
]

_FIELD_RE = re.compile(r"\{(hex|uuid|ip|num|d|h|m|s)\}")
_HEXCHARS = np.array(list("0123456789abcdef"))


def _fill(template: str, rng) -> str:
    def sub(m):
        kind = m.group(1)
        if kind == "hex":
            return "".join(_HEXCHARS[rng.integers(0, 16, size=12)])
        if kind == "uuid":
            h = "".join(_HEXCHARS[rng.integers(0, 16, size=32)])
            return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"
        if kind == "ip":
            return "10.%d.%d.%d" % tuple(rng.integers(0, 255, size=3))
        if kind == "num":
            return str(int(rng.integers(1, 99999)))
        return str(int(rng.integers(0, 10)))  # d/h/m/s single digits

    return _FIELD_RE.sub(sub, template)


def sf_from_dir(sf_dir: str) -> float:
    """Extract the scale factor from a testdata-style dir name (…/sf0.01)."""
    name = os.path.basename(os.path.normpath(sf_dir))
    if name.startswith("sf"):
        try:
            return float(name[2:])
        except ValueError:
            pass
    return 0.01


def synth_path(sf: float, base_dir: str = "/tmp/logjuicer_synth") -> str:
    return os.path.join(base_dir, f"sf{sf:g}", "turns.parquet")


def _conv_plan(sf: float, seed: int, rows_per_sf: int, avg_turns: int):
    """Deterministic conversation descriptors for a scale factor."""
    rng = np.random.default_rng(seed)
    total_rows = max(2_000, int(rows_per_sf * sf))
    n_convs = max(10, total_rows // avg_turns)
    n_baseline = max(3, int(n_convs * 0.4))
    group_choices = rng.choice(len(GROUPS), size=n_convs, p=_GROUP_WEIGHTS)
    turn_counts = np.maximum(
        8, (avg_turns * np.exp(rng.normal(0, 0.6, size=n_convs))).astype(np.int64)
    )
    hot_conv = n_baseline  # first target conversation is the hot one
    turn_counts[hot_conv] = avg_turns * 20
    plan = []
    for c in range(n_convs):
        split = "baseline" if c < n_baseline else "target"
        if c == n_baseline + 1:
            cid, is_job = f"job-output-{c:05d}", True
        else:
            cid, is_job = f"conv-{split[0]}{c:05d}", False
        plan.append(
            {
                "conv_index": c,
                "conv_id": cid,
                "group": int(group_choices[c]),
                "n_turns": int(turn_counts[c]),
                "split": split,
                "is_job_output": is_job,
                "seed": seed,
            }
        )
    return plan


def _gen_conv(desc: dict) -> pa.Table:
    """Generate one conversation (own RNG stream → order-independent)."""
    rng = np.random.default_rng((desc["seed"], desc["conv_index"]))
    cid = desc["conv_id"]
    role, tool = GROUPS[desc["group"]]
    split = desc["split"]
    n = desc["n_turns"]
    t0 = BASE_EPOCH_MS + int(rng.integers(0, 86_400_000))
    n_templates = len(_TEMPLATES)
    template_ids = rng.integers(0, n_templates, size=n)
    anomaly_mask = (rng.random(n) < 0.01) if split == "target" else np.zeros(n, bool)
    dup_mask = rng.random(n) < 0.05
    null_ts_mask = rng.random(n) < 0.05
    ts_step = rng.integers(100, 4000, size=n)

    texts: list[str] = []
    ts_col: list[int | None] = []
    turn_idx = 0
    prev_text = None
    ts = t0
    i = 0
    while i < n:
        ts += int(ts_step[i % n])
        if anomaly_mask[i] and rng.random() < 0.2:
            for tline in _TRACEBACK_TURNS:
                texts.append(_fill(tline, rng))
                ts_col.append(ts)
                i += 1
                if i >= n:
                    break
            continue
        if anomaly_mask[i]:
            texts.append(
                _fill(_ANOMALY_TEMPLATES[int(rng.integers(0, len(_ANOMALY_TEMPLATES)))], rng)
            )
        elif dup_mask[i] and prev_text is not None:
            texts.append(prev_text)
        else:
            texts.append(_fill(_TEMPLATES[int(template_ids[i])], rng))
        prev_text = texts[-1]
        ts_col.append(None if null_ts_mask[i] else ts)
        i += 1
    if desc["is_job_output"]:
        texts.append("TASK [run-logjuicer : collect logs]")
        ts_col.append(ts)
        texts.append("ERROR 9999 (PLANTED): after-marker line must not be reported")
        ts_col.append(ts)
    m = len(texts)
    return pa.table(
        {
            "conv_id": pa.array([cid] * m, pa.string()),
            "turn_idx": pa.array(np.arange(1, m + 1, dtype=np.int32), pa.int32()),
            "role": pa.array([role] * m, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array([tool] * m, pa.string()),
            "ts": pa.array(ts_col, pa.timestamp("ms")),
            "split": pa.array([split] * m, pa.string()),
        }
    )


def generate_turns(
    sf: float = 0.01,
    *,
    seed: int = SEED,
    rows_per_sf: int = ROWS_PER_SF,
    avg_turns: int = AVG_TURNS,
    parallel: bool | None = None,
) -> pa.Table:
    """Generate the transcript table for a scale factor (deterministic;
    parallelized over conversations when a Ray session is available)."""
    plan = _conv_plan(sf, seed, rows_per_sf, avg_turns)
    if parallel is None:
        try:
            import ray

            parallel = ray.is_initialized() and len(plan) > 64
        except Exception:
            parallel = False
    if parallel:
        import ray

        @ray.remote
        def gen_chunk(descs):
            return pa.concat_tables([_gen_conv(d) for d in descs])

        chunk = max(1, len(plan) // 256)
        futures = [
            gen_chunk.remote(plan[i : i + chunk]) for i in range(0, len(plan), chunk)
        ]
        tables = ray.get(futures)
    else:
        tables = [_gen_conv(d) for d in plan]
    table = pa.concat_tables(tables)
    # canonical order regardless of generation layout
    return table.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def ensure_turns(sf: float, base_dir: str = "/tmp/logjuicer_synth") -> str:
    """Write (once) and return the path of the turns table for ``sf``.

    The table is a DIRECTORY of ~500k-row part files: Ray's parquet reader
    issues one read task per file, so a single big file makes the scan a
    serial bottleneck that an N-core pipeline hides but a 4N-core one
    exposes."""
    path = synth_path(sf, base_dir)
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        table = generate_turns(sf)
        tmp = path + f".tmp{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        rows_per_file = 150_000
        nfiles = max(1, (table.num_rows + rows_per_file - 1) // rows_per_file)
        for i in range(nfiles):
            part = table.slice(i * rows_per_file, rows_per_file)
            pq.write_table(
                part, os.path.join(tmp, f"part-{i:05d}.parquet"),
                row_group_size=65_536,
            )
        os.replace(tmp, path)
    return path
