"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init(...)`` itself BEFORE importing this module:
nothing here (nor in the library) calls ``ray.init`` / ``ray.shutdown``.

- ``entry()``      — flagship anomaly-report pipeline on sf0.001.
- ``queries()``    — one callable per implemented operator/pipeline
                     (SURVEY.md §2 + the training-data operators).
- ``oracle_sql()`` — DuckDB-equivalent SQL for the SQL-expressible ones
                     (same column names; the driver hash-compares values).

The transcript pipelines run over the deterministic synthetic turns table
(logjuicer_ray.synth, seed 42) written once under /tmp/logjuicer_synth —
SQL oracles reference it via read_parquet('<path>').
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def _sf(sf_dir: str) -> float:
    from logjuicer_ray.synth import sf_from_dir

    return sf_from_dir(sf_dir)


def _turns_path(sf_dir: str) -> str:
    from logjuicer_ray.synth import ensure_turns

    return ensure_turns(_sf(sf_dir))


_REPORT_CACHE: dict[str, Any] = {}


def _report_outputs(sf_dir: str):
    out = _REPORT_CACHE.get(sf_dir)
    if out is not None:
        return out
    from logjuicer_ray.config import PipelineConfig
    from logjuicer_ray.pipelines.report import run_report
    from logjuicer_ray.pipelines.train import train
    from logjuicer_ray.sources.transcripts import baseline_and_target

    path = _turns_path(sf_dir)
    base, target = baseline_and_target(path)
    cfg = PipelineConfig(sorted_input=True)
    model = train(base, cfg)
    out = run_report(target, model, cfg)
    _REPORT_CACHE[sf_dir] = out
    return out


def entry() -> Any:
    """Flagship pipeline (train → score → context → dedup → report) at
    sf0.001; returns the anomalies Dataset."""
    out = _report_outputs("/root/testdata/sf0.001")
    return out["anomalies"].select_columns(
        ["conv_id", "turn_idx", "role", "tool", "distance", "text"]
    )


# ---------------------------------------------------------------------------
# queries / oracles
# ---------------------------------------------------------------------------

def _q_anomalies(sf_dir: str):
    out = _report_outputs(sf_dir)
    return out["anomalies"].select_columns(
        ["conv_id", "turn_idx", "role", "tool", "distance", "text"]
    )


def _q_reports(sf_dir: str):
    out = _report_outputs(sf_dir)
    return out["reports"]


def _q_unknown(sf_dir: str):
    out = _report_outputs(sf_dir)
    return out["unknown"]


def _q_errors(sf_dir: str):
    from logjuicer_ray.config import PipelineConfig
    from logjuicer_ray.pipelines.report import run_errors_report
    from logjuicer_ray.sources.transcripts import read_turns

    target = read_turns(_turns_path(sf_dir), split="target")
    out = run_errors_report(target, PipelineConfig(sorted_input=True))
    return out["anomalies"].select_columns(
        ["conv_id", "turn_idx", "role", "tool", "distance", "text"]
    )


def _q_tokenize(sf_dir: str):
    """Tokenizer over the documents table (rows-only check: the token
    grammar is not SQL-expressible)."""
    import ray.data as rd

    from logjuicer_ray.stages.tokenize import tokenize_batch

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def add_cols(batch):
        import pyarrow as pa

        b = batch.append_column("role", pa.array(["doc"] * batch.num_rows)).append_column(
            "tool", pa.array([""] * batch.num_rows)
        )
        return tokenize_batch(b).select(["doc_id", "tokens", "dedup_key"])

    return docs.map_batches(add_cols, batch_format="pyarrow")


def _q_turn_counts(sf_dir: str):
    """Per-conversation turn counts over the synthetic turns table
    (SQL-checkable groupby over the transcript input)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max

    path = _turns_path(sf_dir)
    ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "split"])
    return (
        ds.groupby("conv_id")
        .aggregate(Count(alias_name="n_turns"), Max("turn_idx", alias_name="max_turn"))
        .sort("conv_id")
    )


def _q_group_volume(sf_dir: str):
    """Line/byte volume per (role, tool) group per split — the group_sources
    fan-in analog (model.rs:431-449), with in-batch pre-aggregation."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    path = _turns_path(sf_dir)
    ds = rd.read_parquet(path, columns=["role", "tool", "text", "split"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys = {}
        roles = batch.column("role").to_pylist()
        tools = batch.column("tool").to_pylist()
        splits = batch.column("split").to_pylist()
        texts = batch.column("text").to_pylist()
        for r, t, s, x in zip(roles, tools, splits, texts):
            cur = keys.setdefault((r, t, s), [0, 0])
            cur[0] += 1
            cur[1] += len(x.encode())
        return pa.table(
            {
                "role": pa.array([k[0] for k in keys], pa.string()),
                "tool": pa.array([k[1] for k in keys], pa.string()),
                "split": pa.array([k[2] for k in keys], pa.string()),
                "n_lines": pa.array([v[0] for v in keys.values()], pa.int64()),
                "n_bytes": pa.array([v[1] for v in keys.values()], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["role", "tool", "split"])
        .aggregate(Sum("n_lines", alias_name="n_lines"), Sum("n_bytes", alias_name="n_bytes"))
        .sort(["role", "tool", "split"])
    )


def _q_exact_dedup(sf_dir: str):
    import ray.data as rd

    from logjuicer_ray.functions.dedup import exact_dedup

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return exact_dedup(docs).select_columns(["doc_id", "text"]).sort("doc_id")


def _q_minhash_dedup(sf_dir: str):
    import ray.data as rd

    from logjuicer_ray.functions.dedup import minhash_lsh_dedup

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return minhash_lsh_dedup(docs).sort("doc_id")


def _q_simhash_dedup(sf_dir: str):
    import ray.data as rd

    from logjuicer_ray.functions.dedup import simhash_dedup

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_dedup(docs).sort("doc_id")


def _q_token_counts(sf_dir: str):
    import ray.data as rd

    from logjuicer_ray.functions.text import add_token_counts

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return add_token_counts(docs).select_columns(["doc_id", "ws_tokens"]).sort("doc_id")


def _q_text_features(sf_dir: str):
    import ray.data as rd

    from logjuicer_ray.functions.text import add_fingerprints, add_lang_id, add_quality

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = add_fingerprints(add_lang_id(add_quality(docs)))
    return out.select_columns(
        ["doc_id", "quality", "lang_id", "fingerprint", "winnow_fp"]
    ).sort("doc_id")


def _q_knn(sf_dir: str):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from logjuicer_ray.functions.knn import knn_brute_force

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qrows = emb.sort("vec_id").limit(3).to_pandas()
    queries_m = np.asarray(list(qrows["embedding"]), dtype=np.float32)
    out = knn_brute_force(emb, queries_m, k=5).to_pandas()
    qids = list(qrows["vec_id"])
    out["query_vec_id"] = out["query_id"].map(lambda i: qids[i])
    out["cosine"] = out["cosine"].round(4)
    return pa.table(
        {
            "query_vec_id": pa.array(out["query_vec_id"], pa.int64()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "cosine": pa.array(out["cosine"], pa.float64()),
        }
    )


def _q_knn_ivf(sf_dir: str):
    import numpy as np
    import ray.data as rd

    from logjuicer_ray.functions.knn import knn_ivf

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qrows = emb.sort("vec_id").limit(3).to_pandas()
    queries_m = np.asarray(list(qrows["embedding"]), dtype=np.float32)
    return knn_ivf(emb, queries_m, k=5)


def _q_events_window(sf_dir: str):
    """Tumbling 1-hour window count per event_type (pre-aggregated inside
    map_batches, then a small groupby — the windowed-aggregate pattern)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min, Sum

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "event_type"])

    def add_window(batch: pa.Table) -> pa.Table:
        wnd = pc.floor_temporal(batch.column("ts"), unit="hour")
        return batch.append_column("window_start", wnd)

    return (
        events.map_batches(add_window, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(
            Count(alias_name="n_events"),
            Min("event_id", alias_name="min_event_id"),
            Max("event_id", alias_name="max_event_id"),
        )
        .sort(["event_type", "window_start"])
    )


def _q_orders_enriched(sf_dir: str):
    """Broadcast map-side join: customer (small) shipped once via ray.put,
    looked up per batch — never a shuffle join (SURVEY.md §2.4)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    lookup = dict(zip(cust.column("c_custkey").to_pylist(), cust.column("c_mktsegment").to_pylist()))
    lookup_ref = ray.put(lookup)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])

    def enrich(batch: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        seg = [lk.get(c, "UNKNOWN") for c in batch.column("o_custkey").to_pylist()]
        return batch.append_column("c_mktsegment", pa.array(seg, pa.string()))

    return (
        orders.map_batches(enrich, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_orders"), Sum("o_orderkey", alias_name="sum_orderkey"))
        .sort("c_mktsegment")
    )


def _q_events_routed(sf_dir: str):
    """parse → enrich → route over the events stream: vectorized regex
    extraction of the JSON ``props.k`` field (grok-parse analog), derived
    bucket enrichment, then per-route aggregates — the north-rule pipeline
    shape over the driver's events table."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min, Sum

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "props"]
    )

    def parse(batch: pa.Table) -> pa.Table:
        # pc.extract_regex returns a struct column of named groups
        ex = pc.extract_regex(batch.column("props"), r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(ex, "k"), pa.int64())
        k = pc.fill_null(k, -1)
        bucket = pc.bit_wise_and(k, 7)  # cheap enrichment: k % 8 on non-negatives
        return (
            batch.drop_columns(["props"])
            .append_column("k", k)
            .append_column("k_bucket", bucket)
        )

    return (
        events.map_batches(parse, batch_format="pyarrow")
        .groupby(["event_type", "k_bucket"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("k", alias_name="sum_k"),
            Min("event_id", alias_name="min_event_id"),
            Max("event_id", alias_name="max_event_id"),
        )
        .sort(["event_type", "k_bucket"])
    )


def _q_lineitem_agg(sf_dir: str):
    """TPC-H Q1-style wide aggregate with in-batch pre-aggregation before the
    tiny groupby (the partial/combiner pattern, SURVEY.md §2.5)."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        agg: dict[tuple, list] = {}
        rf = batch.column("l_returnflag").to_pylist()
        ls = batch.column("l_linestatus").to_pylist()
        qty = batch.column("l_quantity").to_pylist()
        price = batch.column("l_extendedprice").to_pylist()
        for i in range(len(rf)):
            cur = agg.setdefault((rf[i], ls[i]), [0.0, 0.0, 0])
            cur[0] += qty[i]
            cur[1] += price[i]
            cur[2] += 1
        return pa.table(
            {
                "l_returnflag": pa.array([k[0] for k in agg], pa.string()),
                "l_linestatus": pa.array([k[1] for k in agg], pa.string()),
                "sum_qty": pa.array([v[0] for v in agg.values()], pa.float64()),
                "sum_price": pa.array([v[1] for v in agg.values()], pa.float64()),
                "n_rows": pa.array([v[2] for v in agg.values()], pa.int64()),
            }
        )

    out = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_price", alias_name="sum_price"),
            Sum("n_rows", alias_name="n_rows"),
        )
        .sort(["l_returnflag", "l_linestatus"])
    )

    def to_ints(batch: pa.Table) -> pa.Table:
        # integer-valued outputs so float LSBs can't break value hashing
        import pyarrow.compute as pc

        qty = pc.cast(pc.round(batch.column("sum_qty")), pa.int64())
        cents = pc.cast(pc.round(pc.multiply(batch.column("sum_price"), 100.0)), pa.int64())
        return (
            batch.drop_columns(["sum_qty", "sum_price"])
            .append_column("sum_qty", qty)
            .append_column("sum_price_cents", cents)
        )

    return out.map_batches(to_ints, batch_format="pyarrow").select_columns(
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_price_cents", "n_rows"]
    )


def _q_similarity(sf_dir: str):
    """Similarity report across two target halves of the synthetic turns
    (cross-target anomaly co-occurrence, similarity.rs:16-129)."""
    from logjuicer_ray.config import PipelineConfig
    from logjuicer_ray.pipelines.report import run_report
    from logjuicer_ray.pipelines.similarity import create_similarity
    from logjuicer_ray.pipelines.train import train
    from logjuicer_ray.sources.transcripts import read_turns

    import pyarrow.compute as pc

    path = _turns_path(sf_dir)
    cfg = PipelineConfig(sorted_input=True)
    base = read_turns(path, split="baseline")
    target = read_turns(path, split="target")
    model = train(base, cfg)

    def _half(ds, parity):
        def f(batch):
            import pyarrow as pa
            from zlib import crc32

            keep = [crc32(c.encode()) % 2 == parity for c in batch.column("conv_id").to_pylist()]
            return batch.filter(pa.array(keep, pa.bool_()))

        return ds.map_batches(f, batch_format="pyarrow")

    outs = [
        run_report(_half(target, p), model, cfg)["anomalies"] for p in (0, 1)
    ]
    sim = create_similarity(outs)
    return sim.select_columns(
        ["group_key", "target_id", "conv_id", "turn_idx", "n_sources", "text"]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # flagship transcript pipelines (SURVEY.md §2 / §3)
        "report_anomalies": _q_anomalies,
        "report_reports": _q_reports,
        "report_unknown": _q_unknown,
        "errors_anomalies": _q_errors,
        "tokenize_documents": _q_tokenize,
        "turn_counts": _q_turn_counts,
        "group_volume": _q_group_volume,
        # training-data operators
        "exact_dedup_docs": _q_exact_dedup,
        "minhash_dedup_docs": _q_minhash_dedup,
        "simhash_dedup_docs": _q_simhash_dedup,
        "token_counts_docs": _q_token_counts,
        "text_features_docs": _q_text_features,
        "knn_bruteforce": _q_knn,
        "knn_ivf": _q_knn_ivf,
        "events_window": _q_events_window,
        "orders_enriched": _q_orders_enriched,
        "events_routed": _q_events_routed,
        "lineitem_agg": _q_lineitem_agg,
        "similarity_report": _q_similarity,
    }


def oracle_sql() -> dict[str, str]:
    # the synthetic turns table path for sf=0.01 (driver correctness scale);
    # queries() writes it deterministically before the oracle runs
    turns = "read_parquet('/tmp/logjuicer_synth/sf0.01/turns.parquet/*.parquet')"
    return {
        "turn_counts": (
            f"SELECT conv_id, COUNT(*) AS n_turns, MAX(turn_idx) AS max_turn "
            f"FROM {turns} GROUP BY conv_id ORDER BY conv_id"
        ),
        "group_volume": (
            f"SELECT role, tool, split, COUNT(*) AS n_lines, "
            f"CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS n_bytes "
            f"FROM {turns} GROUP BY role, tool, split ORDER BY role, tool, split"
        ),
        "exact_dedup_docs": (
            "SELECT d.doc_id, d.text FROM documents d "
            "JOIN (SELECT text, MIN(doc_id) AS m FROM documents GROUP BY text) g "
            "ON d.doc_id = g.m ORDER BY d.doc_id"
        ),
        "token_counts_docs": (
            "SELECT doc_id, CASE WHEN trim(text) = '' THEN 0 ELSE "
            "len(regexp_split_to_array(trim(text), '\\s+')) END AS ws_tokens "
            "FROM documents ORDER BY doc_id"
        ),
        "knn_bruteforce": (
            "WITH q AS (SELECT vec_id AS query_vec_id, embedding AS qe "
            "FROM embeddings ORDER BY vec_id LIMIT 3), "
            "sims AS (SELECT q.query_vec_id, e.vec_id, "
            "list_cosine_similarity(q.qe, e.embedding) AS cs "
            "FROM q CROSS JOIN embeddings e), "
            "ranked AS (SELECT query_vec_id, vec_id, cs, "
            "row_number() OVER (PARTITION BY query_vec_id ORDER BY cs DESC, vec_id) AS rn "
            "FROM sims) "
            "SELECT query_vec_id, vec_id, ROUND(cs, 4) AS cosine "
            "FROM ranked WHERE rn <= 5 ORDER BY query_vec_id, cosine DESC, vec_id"
        ),
        "events_window": (
            "SELECT event_type, date_trunc('hour', ts) AS window_start, "
            "COUNT(*) AS n_events, MIN(event_id) AS min_event_id, "
            "MAX(event_id) AS max_event_id "
            "FROM events GROUP BY event_type, date_trunc('hour', ts) "
            "ORDER BY event_type, window_start"
        ),
        "orders_enriched": (
            "SELECT COALESCE(c.c_mktsegment, 'UNKNOWN') AS c_mktsegment, "
            "COUNT(*) AS n_orders, CAST(SUM(o.o_orderkey) AS BIGINT) AS sum_orderkey "
            "FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey "
            "GROUP BY 1 ORDER BY 1"
        ),
        "events_routed": (
            "WITH parsed AS (SELECT event_id, event_type, "
            "COALESCE(CAST(regexp_extract(props, '\"k\": (\\d+)', 1) AS BIGINT), -1) AS k "
            "FROM events) "
            "SELECT event_type, k & 7 AS k_bucket, COUNT(*) AS n_events, "
            "CAST(SUM(k) AS BIGINT) AS sum_k, MIN(event_id) AS min_event_id, "
            "MAX(event_id) AS max_event_id "
            "FROM parsed GROUP BY event_type, k & 7 ORDER BY event_type, k_bucket"
        ),
        "lineitem_agg": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(ROUND(SUM(l_quantity)) AS BIGINT) AS sum_qty, "
            "CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT) AS sum_price_cents, "
            "COUNT(*) AS n_rows "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus "
            "ORDER BY l_returnflag, l_linestatus"
        ),
    }
