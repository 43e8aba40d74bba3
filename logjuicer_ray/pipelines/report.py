"""Report pipeline: score target turns, assemble contexts, dedup globally,
aggregate per-conversation reports, fan out to sinks.

Distributed restatement of ``Model::report`` (model.rs:601-751):

    target turns ─ map_batches(tokenize) ─ map_batches(ScorerStage pool)
        ─ groupby(conv_id).map_groups(ConversationScan)     # shuffle #1
        ─ [materialize small scan output]
        ├─ anomalies ─ groupby(dedup_key) keep-min          # shuffle #2 (global dedup)
        ├─ reports   = per-conv aggregate of anomalies ∪ counts rows
        └─ unknown   = groups with no baseline index

Determinism vs the reference (documented deviations, SURVEY.md §4/§2.7):

- global dedup keeps the min (conv_id, turn_idx) occurrence instead of the
  reference's rayon-race winner, and runs *after* context assembly, so two
  runs (and two cluster sizes) produce identical bytes;
- the reference's gl_date (first-anomaly timestamp seeding time-only lines,
  model.rs:644-648) is per-conversation here unless an explicit ``gl_date``
  is passed.

The scan output (anomalies + one counts row per conversation + unknown
groups) is orders of magnitude smaller than the input, so materializing it
once is bounded; everything upstream streams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..config import PipelineConfig
from ..filtering import is_ansible_conv
from ..stages.context import SCAN_SCHEMA, BlockScan, ConversationScan, ErrorsScan
from ..stages.score import ScorerStage, score_batch
from ..stages.tokenize import tokenize_batch
from ..state.model import Model

__all__ = ["score_dataset", "run_report", "global_dedup", "build_reports",
           "run_errors_report", "load_report"]

ANOMALY_COLUMNS = [
    "conv_id",
    "turn_idx",
    "role",
    "tool",
    "distance",
    "ts",
    "text",
    "before",
    "after",
    "dedup_key",
]


def score_dataset(ds, model: Model, config: PipelineConfig | None = None):
    """turns → tokenized + scored rows (adds tokens/group_key/distance/
    has_index).  The model ships to the actor pool via one ``ray.put``."""
    config = config or PipelineConfig()
    if config.split_multiline_turns:
        if config.sorted_input:
            raise ValueError(
                "split_multiline_turns requires sorted_input=False: the "
                "block-scan fragment schema does not carry line_idx"
            )
        from ..sources.transcripts import explode_lines

        ds = explode_lines(ds, max_line_bytes=config.max_line_bytes)
    model_ref = ray.put(model)
    # sorted-input mode keeps whole blocks intact (batch_size=None) so the
    # downstream per-block scan sees few boundary conversations
    tok_bs = None if config.sorted_input else config.tokenize_batch_size
    tokenized = ds.map_batches(
        tokenize_batch,
        batch_format="pyarrow",
        batch_size=tok_bs,
        fn_kwargs={"max_line_bytes": config.max_line_bytes},
    )
    if config.score_concurrency is not None:
        # explicit actor pool (the right shape when per-worker model setup is
        # expensive relative to batch work — huge models, remote fetch); must
        # stay below the CPU count or the pool starves the read stage and
        # deadlocks the streaming executor
        return tokenized.map_batches(
            ScorerStage,
            fn_constructor_kwargs={"model_ref": model_ref},
            batch_format="pyarrow",
            batch_size=config.score_batch_size,
            concurrency=config.score_concurrency,
        )
    # default: stateless tasks + broadcast model (ray.put once, plasma-local
    # zero-copy ray.get per worker) — reuses warm task workers instead of
    # paying an actor-pool process spawn per execution
    return tokenized.map_batches(
        score_batch,
        fn_kwargs={"model_ref": model_ref},
        batch_format="pyarrow",
        batch_size=None if config.sorted_input else config.score_batch_size,
    )


def _keep_min_turn(group: pa.Table) -> pa.Table:
    """Winner rule for the global dedup: min (conv_id, turn_idx)
    (deterministic replacement of gl_skip_lines, process.rs:359-363)."""
    conv = group.column("conv_id").to_pylist()
    turn = group.column("turn_idx").to_pylist()
    best = min(range(len(conv)), key=lambda i: (conv[i], turn[i]))
    return group.slice(best, 1)


def global_dedup(anomalies_ds):
    """Cross-conversation dedup on the unordered-token key — an anomaly is
    reported once per report run."""
    return anomalies_ds.groupby("dedup_key").map_groups(
        _keep_min_turn, batch_format="pyarrow"
    )


def _report_partials(batch: pa.Table) -> pa.Table:
    """anomaly/counts rows → per-conv partial sums (pre-aggregation before
    the small groupby)."""
    conv = batch.column("conv_id").to_pylist()
    row_type = batch.column("row_type").to_pylist()
    distance = batch.column("distance").to_pylist()
    line_count = batch.column("line_count").to_pylist()
    byte_count = batch.column("byte_count").to_pylist()
    agg: dict[str, list] = {}
    for i, c in enumerate(conv):
        cur = agg.setdefault(c, [0, 0.0, 0, 0])
        if row_type[i] == "anomaly":
            cur[0] += 1
            cur[1] += distance[i]
        else:
            cur[2] += line_count[i] or 0
            cur[3] += byte_count[i] or 0
    return pa.table(
        {
            "conv_id": pa.array(list(agg.keys()), pa.string()),
            "anomaly_count": pa.array([v[0] for v in agg.values()], pa.int64()),
            "sum_distance": pa.array([v[1] for v in agg.values()], pa.float64()),
            "line_count": pa.array([v[2] for v in agg.values()], pa.int64()),
            "byte_count": pa.array([v[3] for v in agg.values()], pa.int64()),
        }
    )


def _finalize_reports(batch: pa.Table) -> pa.Table:
    conv = batch.column("conv_id").to_pylist()
    n = batch.column("anomaly_count").to_pylist()
    sd = batch.column("sum_distance").to_pylist()
    mean = [
        np.float32(s) / np.float32(c) if c else np.float32(0.0)
        for s, c in zip(sd, n)
    ]
    # job-output conversations pin to the top with sentinel 42.0
    # (LogReport::sorted, report.rs:611-627)
    sort_key = [
        np.float32(42.0) if is_ansible_conv(c) and c.rsplit("/", 1)[-1].startswith("job-output")
        else m
        for c, m in zip(conv, mean)
    ]
    return batch.append_column(
        "mean_distance", pa.array([float(m) for m in mean], pa.float32())
    ).append_column("sort_key", pa.array([float(s) for s in sort_key], pa.float32()))


def build_reports(scan_ds, anomalies_ds):
    """Per-conversation report rows: anomaly count/mean over the *deduped*
    anomalies + line/byte counters from the scan's counts rows.  One small
    groupby over pre-aggregated partials; only conversations with anomalies
    are reported (model.rs:578-588)."""
    counts = scan_ds.filter(expr="row_type == 'counts'")
    anom_part = anomalies_ds.map_batches(
        lambda b: _report_partials(
            b.append_column("row_type", pa.array(["anomaly"] * b.num_rows, pa.string()))
            .append_column("line_count", pa.array([0] * b.num_rows, pa.int64()))
            .append_column("byte_count", pa.array([0] * b.num_rows, pa.int64()))
        ),
        batch_format="pyarrow",
    )
    cnt_part = counts.map_batches(_report_partials, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    merged = (
        anom_part.union(cnt_part)
        .groupby("conv_id")
        .aggregate(
            Sum("anomaly_count", alias_name="anomaly_count"),
            Sum("sum_distance", alias_name="sum_distance"),
            Sum("line_count", alias_name="line_count"),
            Sum("byte_count", alias_name="byte_count"),
        )
    )
    reports = merged.filter(expr="anomaly_count > 0").map_batches(
        _finalize_reports, batch_format="pyarrow"
    )
    return reports.sort("sort_key", descending=True)


def _run_scan(rows_ds, scan_udf, config: PipelineConfig):
    """Dispatch the per-conversation scan; returns a MATERIALIZED dataset.

    Default: ``groupby(conv_id).map_groups`` — one all-to-all shuffle of
    every row.  With ``config.sorted_input`` (the canonical (conv_id,
    turn_idx)-sorted Parquet layout): scan complete conversations inside
    each block and emit only boundary fragments for repair — ~n_blocks
    conversations instead of the whole dataset (the decisive shuffle
    reduction at 10^12-turn scale).  Fragment repair happens in the caller
    (driver-side on the fast path, as a small groupby otherwise)."""
    if not config.sorted_input:

        def conversation_scan(group):
            return scan_udf(group)

        return rows_ds.groupby("conv_id").map_groups(
            conversation_scan, batch_format="pyarrow"
        ).materialize()
    block_udf = BlockScan(scan_udf)

    def block_scan(batch):
        return block_udf(batch)

    raw = rows_ds.map_batches(block_scan, batch_format="pyarrow", batch_size=None)
    # small: interior scan results + boundary fragments
    return raw.materialize()


def _repair_fragments_table(table: pa.Table, scan_udf) -> pa.Table:
    """Driver-side fragment repair: group fragment rows by conversation and
    run the scan on each (the fragments are ~n_blocks conversations)."""
    import pyarrow.compute as pc

    mask = pc.equal(table.column("row_type"), "fragment")
    if not pc.any(mask).as_py():
        return table
    interior = table.filter(pc.invert(mask))
    frag = table.filter(mask).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    convs = frag.column("conv_id").to_pylist()
    parts: list[pa.Table] = [interior]
    i, n = 0, len(convs)
    while i < n:
        j = i
        while j < n and convs[j] == convs[i]:
            j += 1
        parts.append(scan_udf(frag.slice(i, j - i)).cast(SCAN_SCHEMA))
        i = j
    return pa.concat_tables(parts)


def _repair_fragments_distributed(scan_ds, scan_udf):
    """Distributed fragment repair for the big-output path."""

    def fragment_scan(group):
        return scan_udf(group)

    repaired = (
        scan_ds.filter(expr="row_type == 'fragment'")
        .groupby("conv_id")
        .map_groups(fragment_scan, batch_format="pyarrow")
    )
    return scan_ds.filter(expr="row_type != 'fragment'").union(repaired)


def _scan_partitions(n_rows: int) -> int:
    """Size-based partition count for the post-scan distributed path: ~250k
    scan rows per block (anomaly rows carry context lists), floored at 8 for
    parallelism — a fixed count would serialize the downstream filter/sort
    at 100× scale, the same reasoning as sources/transcripts.py
    ``_default_num_blocks``."""
    return max(8, n_rows // 250_000)


def _collect_scan(scan) -> pa.Table:
    """Materialized scan Dataset → one Arrow table, normalizing per-block
    schema drift (list field names differ after shuffles)."""
    tables = [
        t.select(SCAN_SCHEMA.names).cast(SCAN_SCHEMA)
        for t in ray.get(scan.to_arrow_refs())
        if t.num_rows  # empty filler blocks may carry a degenerate schema
    ]
    if not tables:
        return SCAN_SCHEMA.empty_table()
    return pa.concat_tables(tables).combine_chunks()


def make_errors_model_filter(model: Model):
    """Row filter for errors-mode anomalies against a baseline model
    (Model::report_errors + filter_anomalies, model.rs:755-790,
    filter.rs:34-70): an anomaly is kept when its line (or, for ansible
    conversations, any before-context line) scores above THRESHOLD against
    its group's index; groups without an index keep everything."""
    from ..filtering import filter_anomalies

    def keep(rows: list[dict]) -> list[dict]:
        out = []
        by_conv: dict[tuple, list[dict]] = {}
        for r in rows:
            by_conv.setdefault((r["conv_id"], r["group_key"]), []).append(r)
        for (conv, gk), group_rows in sorted(by_conv.items()):
            index = model.lookup(gk)
            if index is None:
                out.extend(group_rows)
                continue
            out.extend(
                filter_anomalies(index, group_rows, check_before=is_ansible_conv(conv))
            )
        out.sort(key=lambda r: (r["conv_id"], r["turn_idx"]))
        return out

    return keep


def _driver_finish(scan_table: pa.Table, *, skip_duplicate: bool, anomaly_filter=None) -> dict:
    """Small-output fast path: global dedup, (conv_id, turn_idx) ordering,
    per-conversation report aggregation and unknown routing in one
    driver-side pass over the materialized scan rows.  Semantically
    identical to the distributed path (same winner rules, same f32 mean).
    Vectorized: only the narrow key columns are pulled into Python; the wide
    anomaly rows (contexts) move via Arrow ``take``."""
    import ray.data as rd

    row_type = scan_table.column("row_type")
    anom_tbl = scan_table.filter(pc.equal(row_type, "anomaly"))
    counts_tbl = scan_table.filter(pc.equal(row_type, "counts"))
    unk_tbl = scan_table.filter(pc.equal(row_type, "unknown"))

    conv = anom_tbl.column("conv_id").to_pylist()
    turn = anom_tbl.column("turn_idx").to_pylist()
    if skip_duplicate:
        dkeys = anom_tbl.column("dedup_key").to_pylist()
        best: dict[str, int] = {}
        for i, k in enumerate(dkeys):
            j = best.get(k)
            if j is None or (conv[i], turn[i]) < (conv[j], turn[j]):
                best[k] = i
        keep = sorted(best.values(), key=lambda i: (conv[i], turn[i]))
    else:
        keep = sorted(range(len(conv)), key=lambda i: (conv[i], turn[i]))
    anom_tbl = anom_tbl.take(pa.array(keep, pa.int64()))
    conv = [conv[i] for i in keep]
    turn = [turn[i] for i in keep]

    if anomaly_filter is not None:
        # errors-with-model path: needs full rows; anomaly sets are small here
        rows = anom_tbl.to_pylist()
        rows = anomaly_filter(rows)
        anom_schema = pa.schema([SCAN_SCHEMA.field(n) for n in ANOMALY_COLUMNS])
        anom_tbl = pa.table(
            {n: pa.array([r[n] for r in rows], anom_schema.field(n).type)
             for n in anom_schema.names}
        )
        conv = [r["conv_id"] for r in rows]
        turn = [r["turn_idx"] for r in rows]
    anomalies_table = anom_tbl.select(ANOMALY_COLUMNS)

    # per-conversation report aggregation
    dist = anomalies_table.column("distance").to_pylist()
    per_conv: dict[str, list] = {}
    for c, d in zip(conv, dist):
        cur = per_conv.setdefault(c, [0, 0.0, 0, 0])
        cur[0] += 1
        cur[1] += d
    c_conv = counts_tbl.column("conv_id").to_pylist()
    c_lines = counts_tbl.column("line_count").to_pylist()
    c_bytes = counts_tbl.column("byte_count").to_pylist()
    for c, lc, bc in zip(c_conv, c_lines, c_bytes):
        cur = per_conv.get(c)
        if cur is not None:
            cur[2] += lc or 0
            cur[3] += bc or 0
    report_rows = []
    for c, (n, sd, lc, bc) in per_conv.items():
        mean = np.float32(sd) / np.float32(n) if n else np.float32(0.0)
        pin = is_ansible_conv(c) and c.rsplit("/", 1)[-1].startswith("job-output")
        report_rows.append((c, n, float(sd), lc, bc, float(mean), 42.0 if pin else float(mean)))
    report_rows.sort(key=lambda r: (-r[6], r[0]))
    reports_table = pa.table(
        {
            "conv_id": pa.array([r[0] for r in report_rows], pa.string()),
            "anomaly_count": pa.array([r[1] for r in report_rows], pa.int64()),
            "sum_distance": pa.array([r[2] for r in report_rows], pa.float64()),
            "line_count": pa.array([r[3] for r in report_rows], pa.int64()),
            "byte_count": pa.array([r[4] for r in report_rows], pa.int64()),
            "mean_distance": pa.array([r[5] for r in report_rows], pa.float32()),
            "sort_key": pa.array([r[6] for r in report_rows], pa.float32()),
        }
    )
    unk_tbl = unk_tbl.select(
        ["conv_id", "role", "tool", "group_key", "line_count", "byte_count"]
    ).sort_by([("group_key", "ascending"), ("conv_id", "ascending")])
    return {
        "anomalies": rd.from_arrow(anomalies_table),
        "reports": rd.from_arrow(reports_table),
        "unknown": rd.from_arrow(unk_tbl),
    }


def _record_scan_metrics(metrics, pipeline: str, table: pa.Table, *, wall_s: float) -> None:
    """One metrics row for the scan stage: counted lines/bytes in (from the
    scan's own counters — already computed, no re-execution), scan rows out."""
    rt = table.column("row_type")

    def _sum(col: str, row_type: str) -> int:
        m = pc.equal(rt, row_type)
        return int(
            pc.sum(pc.if_else(m, pc.fill_null(table.column(col), 0),
                              pa.scalar(0, pa.int64()))).as_py() or 0
        )

    lines_in = _sum("line_count", "counts") + _sum("line_count", "unknown")
    bytes_in = _sum("byte_count", "counts") + _sum("byte_count", "unknown")
    metrics.record(pipeline, "scan", rows_in=lines_in, rows_out=table.num_rows,
                   wall_s=wall_s, bytes_out=table.nbytes, counted_bytes_in=bytes_in,
                   path="block_scan+driver_repair")


def _first_timed_ts(anomalies_ds) -> int | None:
    """First non-null anomaly timestamp in (conv_id, turn_idx) order — the
    deterministic gl_date seed (``anomalies`` is already sorted; the stream
    stops at the first hit, so this reads at most one batch in the common
    case)."""
    for b in anomalies_ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        ts = b.column("ts").cast(pa.int64())  # epoch ms regardless of storage type
        for i in range(len(ts)):
            v = ts[i].as_py()
            if v is not None:
                return int(v)
    return None


def run_report(
    target_ds,
    model: Model,
    config: PipelineConfig | None = None,
    *,
    gl_date: int | None = None,
    metrics=None,
):
    """Full report: returns a dict of Datasets
    ``{"anomalies", "reports", "unknown", "scan"}`` plus totals.

    ``anomalies`` is ordered by (conv_id, turn_idx) — the north-rule stable
    ordering invariant.  ``metrics`` (a ``metrics.Metrics``) collects one
    row per stage (model.rs:451-470 counter analog).
    """
    import time as _time

    config = config or PipelineConfig()
    if config.global_date and gl_date is None:
        # two-pass gl_date seeding (model.rs:644-648 parity; deterministic
        # rule documented in config.py): pass 1 without a date anchor, then
        # re-scan with the first timed anomaly's timestamp
        from dataclasses import replace as _replace

        pass1_cfg = _replace(config, global_date=False)
        first = run_report(target_ds, model, pass1_cfg, metrics=metrics)
        seed = _first_timed_ts(first["anomalies"])
        if seed is None:
            return first
        return run_report(target_ds, model, pass1_cfg, gl_date=seed, metrics=metrics)
    _t_scan = _time.monotonic()
    scored = score_dataset(target_ds, model, config)
    # prune before the wide conv_id shuffle: the scan needs the dedup key,
    # not the token string, and not the raw ts column (anomaly timestamps are
    # parsed from text per reference semantics)
    scored = scored.select_columns(
        ["conv_id", "turn_idx", "role", "tool", "group_key", "text", "dedup_key",
         "distance", "has_index"]
        + (["line_idx"] if config.split_multiline_turns else [])
    )
    scan_udf = ConversationScan(config, gl_date=gl_date)
    scan = _run_scan(scored, scan_udf, config)
    if config.driver_finish_rows and scan.count() <= config.driver_finish_rows:
        # fast path: the scan output (anomalies + counters + boundary
        # fragments) is tiny — repair fragments and finish driver-side in
        # one pass instead of three more distributed executions
        import ray.data as rd

        table = _repair_fragments_table(_collect_scan(scan), scan_udf)
        if metrics is not None:
            _record_scan_metrics(metrics, "report", table,
                                 wall_s=_time.monotonic() - _t_scan)
        _t_fin = _time.monotonic()
        out = _driver_finish(table, skip_duplicate=config.skip_duplicate)
        out["scan"] = rd.from_arrow(table)
        if metrics is not None:
            metrics.record(
                "report", "dedup+reports",
                rows_in=int(pc.sum(pc.cast(pc.equal(table.column("row_type"), "anomaly"), pa.int64())).as_py() or 0),
                rows_out=out["anomalies"].count(),
                wall_s=_time.monotonic() - _t_fin,
                path="driver_finish",
            )
        return out
    if config.sorted_input:
        scan = _repair_fragments_distributed(scan, scan_udf)
    scan = scan.repartition(_scan_partitions(scan.count())).materialize()
    if metrics is not None:
        metrics.record("report", "scan", rows_out=scan.count(),
                       wall_s=_time.monotonic() - _t_scan, path="distributed")
    _t_fin = _time.monotonic()
    anomalies = scan.filter(expr="row_type == 'anomaly'").select_columns(ANOMALY_COLUMNS)
    if config.skip_duplicate:
        anomalies = global_dedup(anomalies)
    anomalies = anomalies.sort(["conv_id", "turn_idx"]).materialize()
    reports = build_reports(scan, anomalies).materialize()
    unknown = (
        scan.filter(expr="row_type == 'unknown'")
        .select_columns(["conv_id", "role", "tool", "group_key", "line_count", "byte_count"])
        .sort(["group_key", "conv_id"])
        .materialize()
    )
    if metrics is not None:
        metrics.record("report", "dedup+reports", rows_out=anomalies.count(),
                       wall_s=_time.monotonic() - _t_fin, path="distributed")
    return {
        "anomalies": anomalies,
        "reports": reports,
        "unknown": unknown,
        "scan": scan,
    }


def load_report(out_dir: str) -> dict:
    """Round-trip a persisted report (the ``Report`` load analog,
    report.rs:198-237): read the ``anomalies``/``reports``/``unknown``
    parquet sinks written by the CLI back into the ``run_report`` output
    shape, so downstream consumers (similarity, re-filtering, audits) can
    run from saved artifacts instead of recomputing the pipeline.

    Each sink is validated against its manifest row count; missing optional
    sinks (``unknown`` for errors-mode reports) are simply absent from the
    returned dict."""
    import os

    import ray.data as rd

    from ..sinks import read_manifest, sink_finished

    out: dict = {}
    for name in ("anomalies", "reports", "unknown"):
        path = os.path.join(out_dir, name)
        if not sink_finished(path):
            continue
        manifest = read_manifest(path)
        files = [os.path.join(path, p["file"]) for p in manifest.get("partitions", [])]
        if not files:
            continue
        ds = rd.read_parquet(files)
        if manifest["rows"] and ds.count() != manifest["rows"]:
            raise ValueError(
                f"sink {path} rows {ds.count()} != manifest {manifest['rows']}"
            )
        out[name] = ds
    if "anomalies" not in out:
        raise FileNotFoundError(f"no finished anomalies sink under {out_dir}")
    return out


def run_errors_report(target_ds, config: PipelineConfig | None = None, *,
                      model: Model | None = None, metrics=None):
    """Errors mode (errors_report, errors.rs:341-377): no baseline needed —
    the state-machine classifier runs per conversation; global dedup and the
    per-conversation report aggregation are shared with the main pipeline.
    With ``model`` given, error anomalies already present in the baseline
    indexes are filtered out (Model::report_errors, model.rs:755-790)."""
    config = config or PipelineConfig()
    if config.split_multiline_turns:
        if config.sorted_input:
            raise ValueError(
                "split_multiline_turns requires sorted_input=False: the "
                "block-scan fragment schema does not carry line_idx"
            )
        from ..sources.transcripts import explode_lines

        target_ds = explode_lines(target_ds, max_line_bytes=config.max_line_bytes)
    with_groups = target_ds.map_batches(
        _add_group_key,
        batch_format="pyarrow",
        fn_kwargs={"max_line_bytes": config.max_line_bytes},
    )
    import time as _time

    _t_scan = _time.monotonic()
    errors_udf = ErrorsScan(config)
    scan = _run_scan(with_groups, errors_udf, config)
    anomaly_filter = make_errors_model_filter(model) if model is not None else None
    if config.driver_finish_rows and scan.count() <= config.driver_finish_rows:
        import ray.data as rd

        table = _repair_fragments_table(_collect_scan(scan), errors_udf)
        if metrics is not None:
            _record_scan_metrics(metrics, "errors", table,
                                 wall_s=_time.monotonic() - _t_scan)
        _t_fin = _time.monotonic()
        out = _driver_finish(
            table,
            skip_duplicate=config.skip_duplicate,
            anomaly_filter=anomaly_filter,
        )
        if metrics is not None:
            metrics.record(
                "errors", "dedup+reports",
                rows_in=int(pc.sum(pc.cast(pc.equal(table.column("row_type"), "anomaly"), pa.int64())).as_py() or 0),
                rows_out=out["anomalies"].count(),
                wall_s=_time.monotonic() - _t_fin,
                path="driver_finish",
            )
        return {"anomalies": out["anomalies"], "reports": out["reports"],
                "scan": rd.from_arrow(table)}
    if config.sorted_input:
        scan = _repair_fragments_distributed(scan, errors_udf)
    scan = scan.repartition(_scan_partitions(scan.count())).materialize()
    anomalies = scan.filter(expr="row_type == 'anomaly'").select_columns(
        ANOMALY_COLUMNS + ["group_key"]
    )
    if config.skip_duplicate:
        anomalies = global_dedup(anomalies)
    if anomaly_filter is not None:
        def filter_batch(batch: pa.Table) -> pa.Table:
            rows = anomaly_filter(batch.to_pylist())
            if not rows:
                return batch.slice(0, 0)
            return pa.table(
                {n: pa.array([r[n] for r in rows], batch.schema.field(n).type)
                 for n in batch.schema.names}
            )
        anomalies = anomalies.map_batches(filter_batch, batch_format="pyarrow")
    anomalies = anomalies.select_columns(ANOMALY_COLUMNS)
    anomalies = anomalies.sort(["conv_id", "turn_idx"]).materialize()
    reports = build_reports(scan, anomalies).materialize()
    return {"anomalies": anomalies, "reports": reports, "scan": scan}


def _add_group_key(batch: pa.Table, *, max_line_bytes: int = 6000) -> pa.Table:
    from ..stages.tokenize import truncate_text_column

    batch = truncate_text_column(batch, max_line_bytes)
    group = pc.binary_join_element_wise(batch.column("role"), batch.column("tool"), "/")
    return batch.append_column("group_key", group)
