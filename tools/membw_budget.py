"""Bytes-per-turn budget for the flagship pipeline + box streaming-bandwidth
probe — the quantitative basis for BASELINE.md's cross-node scaling argument.

Two measurements, no Ray session required (run while the box is quiet,
never concurrently with a bench):

1. ``--stream``: per-process-count streaming bandwidth (numpy triad-style
   a[:] = b + c over arrays far larger than LLC), at 1/2/8/32 processes.
   Shows where the single box's memory subsystem saturates — the reason a
   single-box 8->32 pair understates multi-node scaling (each real node
   brings its own memory system).

2. ``--budget``: measured bytes PER TARGET TURN touched by each flagship
   stage at sf0.1, derived from the actual parquet file + Arrow decode:
     - parquet_read: compressed file bytes / turns  (disk/page-cache read)
     - arrow_decode: in-memory Arrow buffer bytes of the columns the
       pipeline reads / turns                        (decode write + read)
     - fold+dict:    text-column bytes (digit fold reads+writes text once,
                     dictionary encode reads it once)
     - tokenize:     unique-line fraction x mean line bytes (process() only
                     touches unique lines; memoized across batches)
     - score:        CSR rows x nnz x 8 bytes (indices+data) per unique
                     line + dense output k x 4
     - scan:         anomaly-adjacent rows only (counters are O(1)/group)

   The table multiplies by a design-point per-node bandwidth to give a
   turns/s/node ceiling, compared with the measured per-8-CPU-slice
   throughput.

Usage:  python tools/membw_budget.py --stream --budget [--sf-dir DIR]
Prints one JSON line; a markdown table is written to stdout with --md.
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

ARR_MB = 256  # per-process working set, far above LLC


def _stream_worker(seconds: float, q) -> None:
    n = ARR_MB * 1024 * 1024 // 8
    b = np.random.default_rng(0).random(n)
    c = np.random.default_rng(1).random(n)
    a = np.empty_like(b)
    # touch every page of a (and warm the kernel) before the clock starts —
    # this box's first-touch fault path is pathologically slow (hypervisor),
    # and measuring it would report fault cost, not streaming bandwidth
    np.add(b, c, out=a)
    np.add(b, c, out=a)
    t0 = time.monotonic()
    it = 0
    while time.monotonic() - t0 < seconds:
        np.add(b, c, out=a)
        it += 1
    dt = time.monotonic() - t0
    # triad traffic: read b, read c, write a = 3 arrays per iteration
    q.put(3 * ARR_MB * 1024 * 1024 * it / dt)


def stream_bandwidth(procs: int, seconds: float = 3.0) -> float:
    """Aggregate streaming GB/s with ``procs`` concurrent processes."""
    q = mp.Queue()
    ps = [mp.Process(target=_stream_worker, args=(seconds, q)) for _ in range(procs)]
    for p in ps:
        p.start()
    vals = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(vals) / 1e9


def pipeline_budget(sf_dir: str) -> dict:
    """Measured bytes/turn per flagship stage from the real sf parquet."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "turns.parquet")
    if not os.path.exists(path):
        # bench synthesises into /tmp; fall back to the bench location
        from logjuicer_ray.synth import ensure_turns

        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
        path = ensure_turns(sf)
    parts = sorted(glob.glob(os.path.join(path, "part-*.parquet"))) or [path]
    file_bytes = sum(os.path.getsize(p) for p in parts)
    n_rows = sum(pq.ParquetFile(p).metadata.num_rows for p in parts)

    cols = ["conv_id", "turn_idx", "role", "tool", "text", "ts", "split"]
    # decode stats from a sample of parts (a Ray worker sees one block at a
    # time; per-part unique fraction models the per-worker memo hit rate)
    sample_parts = parts[:: max(1, len(parts) // 4)][:4]
    tbl = pa.concat_tables(pq.read_table(p, columns=cols) for p in sample_parts)
    n_rows_sample = tbl.num_rows

    def col_bytes(name: str) -> int:
        return tbl.column(name).nbytes

    decode_bytes = sum(col_bytes(c) for c in cols)
    text_bytes = col_bytes("text")

    # unique-line fraction: tokenize/score touch only unique (role,tool,text)
    import pyarrow.compute as pc

    uniq = pc.count_distinct(tbl.column("text")).as_py()
    uniq_frac = uniq / n_rows_sample
    mean_line = text_bytes / n_rows_sample

    # score: hashed CSR per unique line — measured nnz/line from the engine
    try:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from logjuicer_ray.tokenizer import process
        from logjuicer_ray.vectorize import word_hash

        sample = tbl.column("text").slice(0, 2000).to_pylist()
        nnzs = []
        for s in sample[:500]:
            toks = process(s)
            if toks:
                nnzs.append(len({word_hash(w) for w in toks.split()}))
        nnz = float(np.mean(nnzs)) if nnzs else 12.0
    except Exception:
        nnz = 12.0

    per_turn = {
        # every stage that touches a byte of DRAM per target turn, r/w summed
        "parquet_read": file_bytes / n_rows,
        "arrow_decode_rw": 2 * decode_bytes / n_rows_sample,  # write on decode + read downstream
        "fold_dict_rw": 3 * text_bytes / n_rows_sample,  # fold read+write, dict-encode read
        "tokenize_unique": uniq_frac * 2 * mean_line,  # process() reads+writes unique lines
        "score_csr": uniq_frac * nnz * 12,  # (i32 idx + f64 val) per nnz, unique lines only
        "scan_counters": 16.0,  # O(1) counter updates per row
    }
    total = sum(per_turn.values())
    return {
        "sf_path": path,
        "rows": n_rows,
        "file_mb": round(file_bytes / 2**20, 1),
        "unique_line_frac": round(uniq_frac, 4),
        "mean_line_bytes": round(mean_line, 1),
        "nnz_per_unique_line": round(nnz, 1),
        "bytes_per_turn": {k: round(v, 1) for k, v in per_turn.items()},
        "bytes_per_turn_total": round(total, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stream", action="store_true")
    ap.add_argument("--budget", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--levels", default="1,2,8,32")
    args = ap.parse_args()

    out: dict = {}
    if args.stream:
        out["stream_gbps"] = {
            str(p): round(stream_bandwidth(p), 1) for p in
            (int(x) for x in args.levels.split(","))
        }
    if args.budget:
        out["budget"] = pipeline_budget(args.sf_dir)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
