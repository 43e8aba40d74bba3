"""Similarity report: cross-target anomaly co-occurrence.

Port of ``create_similarity_report`` (crates/model/src/similarity.rs:16-129):
given the anomaly sets of several report runs ("targets"), group anomalies by
their (group_key, token string); each unique token keeps its first occurrence
(by target order, then conv/turn) and records every (target, conv) whose
anomaly set contains the same token.  Output is sorted by descending source
count (similarity.rs:42-44).

Ray shape: union the per-target anomaly datasets with a ``target_id``
column, tokenize, one ``groupby(group_key, tokens)`` shuffle collecting the
source list per token.
"""

from __future__ import annotations

import pyarrow as pa

from ..tokenizer import process as tokenize

__all__ = ["create_similarity", "tag_anomalies", "similarity_from_tokenized"]

SIMILARITY_SCHEMA = pa.schema(
    [
        ("group_key", pa.string()),
        ("tokens", pa.string()),
        ("target_id", pa.int32()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("distance", pa.float32()),
        ("text", pa.string()),
        ("n_sources", pa.int32()),
        ("sources", pa.list_(pa.string())),
    ]
)


def _tokenize_anomalies(batch: pa.Table) -> pa.Table:
    toks = [tokenize(t) for t in batch.column("text").to_pylist()]
    return batch.append_column("tokens", pa.array(toks, pa.string()))


def _merge_token_group(group: pa.Table) -> pa.Table:
    tid = group.column("target_id").to_pylist()
    conv = group.column("conv_id").to_pylist()
    turn = group.column("turn_idx").to_pylist()
    order = sorted(range(len(tid)), key=lambda i: (tid[i], conv[i], turn[i]))
    first = order[0]
    sources = sorted({f"{tid[i]}:{conv[i]}" for i in range(len(tid))})
    return pa.table(
        {
            "group_key": group.column("group_key").slice(first, 1),
            "tokens": group.column("tokens").slice(first, 1),
            "target_id": group.column("target_id").slice(first, 1),
            "conv_id": group.column("conv_id").slice(first, 1),
            "turn_idx": group.column("turn_idx").slice(first, 1),
            "distance": group.column("distance").slice(first, 1),
            "text": group.column("text").slice(first, 1),
            "n_sources": pa.array([len(sources)], pa.int32()),
            "sources": pa.array([sources], pa.list_(pa.string())),
        }
    )


def tag_anomalies(anomalies_list):
    """Union the per-target anomaly Datasets with a ``target_id`` column and
    a ``tokens`` column (tokenizer re-run over the anomaly text) — the
    similarity report's input rows, also the persisted "saved report"
    analog (similarity.rs computes over previously saved reports)."""
    import ray.data  # noqa: F401  (Dataset methods)

    tagged = None
    for idx, ds in enumerate(anomalies_list):

        def tag(batch: pa.Table, _idx=idx) -> pa.Table:
            col = pa.array([_idx] * batch.num_rows, pa.int32())
            out = batch.append_column("target_id", col)
            if "group_key" not in out.schema.names:
                import pyarrow.compute as pc

                out = out.append_column(
                    "group_key",
                    pc.binary_join_element_wise(out.column("role"), out.column("tool"), "/"),
                )
            return out.select(
                ["group_key", "target_id", "conv_id", "turn_idx", "distance", "text"]
            )

        part = ds.map_batches(tag, batch_format="pyarrow")
        tagged = part if tagged is None else tagged.union(part)
    return tagged.map_batches(_tokenize_anomalies, batch_format="pyarrow")


def similarity_from_tokenized(tokenized):
    """The co-occurrence GROUP BY over tagged+tokenized anomaly rows:
    per (group_key, tokens) keep the first occurrence by
    (target_id, conv_id, turn_idx) and collect the distinct
    ``target:conv`` source list.  SQL-expressible (ROW_NUMBER window +
    COUNT(DISTINCT)) — the ``similarity_report`` driver oracle re-derives
    this from the same persisted rows."""
    merged = tokenized.groupby(["group_key", "tokens"]).map_groups(
        _merge_token_group, batch_format="pyarrow"
    )
    return merged.sort(["n_sources", "group_key", "tokens"], descending=[True, False, False])


def create_similarity(anomalies_list):
    """``anomalies_list``: one anomalies Dataset per target (the ``anomalies``
    output of :func:`..pipelines.report.run_report`).  Returns a Dataset of
    unique anomaly tokens with their co-occurring sources, sorted by
    descending ``n_sources``."""
    return similarity_from_tokenized(tag_anomalies(anomalies_list))
