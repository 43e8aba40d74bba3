#!/usr/bin/env python
"""Per-operator throughput benchmark over the SYNTH TURNS table.

The flagship ``bench.py`` measures the end-to-end report pipeline; this
tool measures the LLM-data-curation operators on the SAME multi-million-row
text corpus (the turns table at ``$GRAFT_SF_DIR``'s scale factor — 2.4M
rows/sf0.01, 24M rows/sf0.1), so operator cost is quoted at a meaningful
scale rather than over the 5k-row ``documents`` fixture.

Prints ONE JSON line:
  {"metric": "ops_bench", "sf": .., "num_cpus": N, "rows": N,
   "ops": {"<op>": {"sec": s, "rows_per_sec": r, "out_rows": n}, ...}}

Each operator streams: the timed consume is a count()/small-aggregate,
never a driver materialization of the corpus.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _with_uid(ds):
    """Deterministic per-row int64 uid (splitmix64 of (crc32(conv_id),
    turn_idx)) — dedup operators need an orderable unique id; collision
    odds at 24M rows are ~1e-5 and harmless for a benchmark."""
    import numpy as np
    import pyarrow as pa

    def f(batch: pa.Table) -> pa.Table:
        from zlib import crc32

        from logjuicer_ray.functions.hashing import splitmix64

        conv = np.array(
            [crc32(c.encode()) for c in batch.column("conv_id").to_pylist()],
            dtype=np.uint64,
        )
        ti = batch.column("turn_idx").to_numpy(zero_copy_only=False).astype(np.uint64)
        uid = splitmix64((conv << np.uint64(32)) | ti).astype(np.int64)
        return batch.append_column("uid", pa.array(uid, pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow")


def main() -> None:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        log_to_driver=False,
    )
    from logjuicer_ray.tuning import configure_data_context

    configure_data_context(num_cpus)

    import ray.data as rd

    from logjuicer_ray.synth import ensure_turns, sf_from_dir

    sf = sf_from_dir(sf_dir)
    path = ensure_turns(sf)

    def read_text():
        return rd.read_parquet(path, columns=["conv_id", "turn_idx", "text"])

    n_rows = read_text().count()

    ops: dict[str, dict] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out_rows = fn()
        sec = time.monotonic() - t0
        ops[name] = {
            "sec": round(sec, 3),
            "rows_per_sec": int(n_rows / sec) if sec > 0 else None,
            "out_rows": int(out_rows),
        }

    # --- stateless curation signal passes (map_batches throughput) ---
    from logjuicer_ray.functions.text import (
        add_char_entropy,
        add_fingerprints,
        add_lang_id,
        add_quality,
        add_token_counts,
    )

    timed("token_counts", lambda: add_token_counts(read_text()).count())
    timed(
        "quality_lang_entropy",
        lambda: add_char_entropy(
            add_lang_id(add_quality(_with_uid(read_text()))), id_col="uid"
        ).count(),
    )
    timed("fingerprints", lambda: add_fingerprints(read_text()).count())

    # --- dedup family over the full corpus ---
    from logjuicer_ray.functions.dedup import (
        exact_dedup,
        minhash_lsh_dedup,
        simhash_candidate_pairs,
    )

    timed(
        "exact_dedup",
        lambda: exact_dedup(_with_uid(read_text()), id_col="uid").count(),
    )
    timed(
        "minhash_lsh",
        lambda: minhash_lsh_dedup(
            _with_uid(read_text()), id_col="uid", portable=False
        ).count(),
    )
    timed(
        "simhash_pairs",
        lambda: simhash_candidate_pairs(
            _with_uid(read_text()), id_col="uid"
        ).count(),
    )

    # --- CCNet line-level dedup: explode -> global line winners -> rebuild
    from logjuicer_ray.functions.dedup import line_level_dedup
    from logjuicer_ray.sources.transcripts import explode_lines

    timed(
        "line_dedup",
        lambda: line_level_dedup(explode_lines(read_text())).count(),
    )

    # --- classifier: train on a 1/16 hash sample, score the full corpus ---
    from logjuicer_ray.functions.classify import (
        score_naive_bayes,
        train_naive_bayes,
    )

    def nb():
        import pyarrow.compute as pc

        def lab(batch):
            # synthetic label: conversation-id parity (the benchmark is
            # operator COST; label semantics are irrelevant here)
            import pyarrow as pa
            from zlib import crc32

            par = [
                "a" if crc32(c.encode()) % 2 else "b"
                for c in batch.column("conv_id").to_pylist()
            ]
            return batch.append_column("lab", pa.array(par, pa.string()))

        def sample(batch):
            return batch.filter(
                pc.equal(pc.bit_wise_and(batch.column("uid"), 15), 0)
            )

        train_ds = (
            _with_uid(read_text())
            .map_batches(sample, batch_format="pyarrow")
            .map_batches(lab, batch_format="pyarrow")
        )
        model = train_naive_bayes(
            train_ds, text_col="text", label_col="lab", min_count=2
        )
        return score_naive_bayes(
            _with_uid(read_text()), model, text_col="text", id_col="uid"
        ).count()

    timed("nb_train_score", nb)

    print(
        json.dumps(
            {
                "metric": "ops_bench",
                "sf": sf,
                "num_cpus": num_cpus,
                "rows": int(n_rows),
                "ops": ops,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
