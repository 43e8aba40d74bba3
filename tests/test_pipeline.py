"""End-to-end parity: the Ray pipeline must reproduce the sequential oracle
bit-for-bit — per-sink counts, routed rows, per-turn text equality under
stable (conv_id, turn_idx) ordering (north rule / BASELINE.md)."""

import pytest

from logjuicer_ray.config import PipelineConfig
from logjuicer_ray.synth import ensure_turns, generate_turns

from _oracle import oracle_errors, oracle_report


def _split(table):
    import pyarrow.compute as pc

    return (
        table.filter(pc.equal(table.column("split"), "baseline")),
        table.filter(pc.equal(table.column("split"), "target")),
    )


@pytest.fixture(scope="module")
def ray_outputs(ray_session):
    from logjuicer_ray.pipelines.report import run_errors_report, run_report
    from logjuicer_ray.pipelines.train import train
    from logjuicer_ray.sources.transcripts import baseline_and_target

    path = ensure_turns(0.0003)
    base, target = baseline_and_target(path)
    cfg = PipelineConfig()
    model = train(base, cfg)
    out = run_report(target, model, cfg)
    errors_out = run_errors_report(target, cfg)
    return {
        "model": model,
        "anomalies": out["anomalies"].to_pandas(),
        "reports": out["reports"].to_pandas(),
        "unknown": out["unknown"].to_pandas(),
        "errors": errors_out["anomalies"].to_pandas(),
    }


@pytest.fixture(scope="module")
def oracle_outputs():
    table = generate_turns(0.0003)
    baseline, target = _split(table)
    anomalies, reports, unknown = oracle_report(baseline, target)
    errors = oracle_errors(target)
    return {
        "anomalies": anomalies,
        "reports": reports,
        "unknown": unknown,
        "errors": errors,
    }


def test_anomaly_rows_match(ray_outputs, oracle_outputs):
    got = ray_outputs["anomalies"]
    want = oracle_outputs["anomalies"]
    assert len(got) == len(want), (len(got), len(want))
    for i, w in enumerate(want):
        row = got.iloc[i]
        assert row["conv_id"] == w["conv_id"]
        assert row["turn_idx"] == w["turn_idx"]
        assert row["text"] == w["text"]  # per-turn text equality
        assert row["distance"] == pytest.approx(w["distance"], abs=1e-6)
        assert list(row["before"]) == w["before"]
        assert list(row["after"]) == w["after"]


def test_report_rows_match(ray_outputs, oracle_outputs):
    got = ray_outputs["reports"].sort_values(
        ["sort_key", "conv_id"], ascending=[False, True]
    )
    want = sorted(oracle_outputs["reports"], key=lambda r: (-r["sort_key"], r["conv_id"]))
    assert len(got) == len(want)
    for (_, row), w in zip(got.iterrows(), want):
        assert row["conv_id"] == w["conv_id"]
        assert row["anomaly_count"] == w["anomaly_count"]
        assert row["line_count"] == w["line_count"]
        assert row["byte_count"] == w["byte_count"]
        assert row["mean_distance"] == pytest.approx(w["mean_distance"], abs=1e-6)
        assert row["sort_key"] == pytest.approx(w["sort_key"], abs=1e-6)


def test_unknown_rows_match(ray_outputs, oracle_outputs):
    got = ray_outputs["unknown"]
    want = oracle_outputs["unknown"]
    assert len(got) == len(want)
    if not want:
        return
    got = got.sort_values(["group_key", "conv_id"])
    for (_, row), w in zip(got.iterrows(), want):
        assert row["conv_id"] == w["conv_id"]
        assert row["group_key"] == w["group_key"]
        assert row["line_count"] == w["line_count"]
        assert row["byte_count"] == w["byte_count"]


def test_errors_rows_match(ray_outputs, oracle_outputs):
    got = ray_outputs["errors"]
    want = oracle_outputs["errors"]
    assert len(got) == len(want)
    for i, w in enumerate(want):
        row = got.iloc[i]
        assert (row["conv_id"], row["turn_idx"], row["text"]) == (
            w["conv_id"],
            w["turn_idx"],
            w["text"],
        )
        assert list(row["before"]) == w["before"]
        assert list(row["after"]) == w["after"]


def test_unknown_routing_and_single_index_fallback(ray_session):
    """Groups without a baseline index route to unknown (model.rs:665-673);
    with exactly one index, every group uses it (lookup_or_single,
    model.rs:857-869)."""
    import pyarrow as pa
    import ray.data as rd

    from logjuicer_ray.pipelines.report import run_report
    from logjuicer_ray.pipelines.train import train

    def tbl(rows):
        return pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows]),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "role": pa.array([r[2] for r in rows]),
                "text": pa.array([r[3] for r in rows]),
                "tool": pa.array([r[4] for r in rows]),
                "ts": pa.array([None] * len(rows), pa.timestamp("ms")),
            }
        )

    base = rd.from_arrow(
        tbl(
            [
                ("b1", 1, "assistant", "regular log line alpha", "bash"),
                ("b2", 1, "tool", "regular tool output beta", "web"),
            ]
        )
    )
    target = rd.from_arrow(
        tbl(
            [
                ("t1", 1, "assistant", "regular log line alpha", "bash"),
                ("t1", 2, "assistant", "Traceback anomaly gamma", "bash"),
                ("t2", 1, "user", "no index for this group", ""),
            ]
        )
    )
    cfg = PipelineConfig()
    model = train(base, cfg)
    assert len(model.indexes) == 2
    out = run_report(target, model, cfg)
    unknown = out["unknown"].to_pandas()
    assert list(unknown["conv_id"]) == ["t2"]
    assert list(unknown["group_key"]) == ["user/"]
    an = out["anomalies"].to_pandas()
    assert list(an["text"]) == ["Traceback anomaly gamma"]

    # single-index fallback: with one group trained, the t2 group scores
    # against it instead of routing to unknown
    base_one = rd.from_arrow(tbl([("b1", 1, "assistant", "regular log line alpha", "bash")]))
    model_one = train(base_one, cfg)
    out_one = run_report(target, model_one, cfg)
    assert len(out_one["unknown"].to_pandas()) == 0


def test_distributed_finish_parity(ray_session):
    """The fully distributed post-scan path (driver_finish_rows=0: shuffle
    dedup + distributed report aggregate) produces the same rows as the
    driver-side fast path."""
    from logjuicer_ray.pipelines.report import run_report
    from logjuicer_ray.pipelines.train import train
    from logjuicer_ray.sources.transcripts import baseline_and_target

    path = ensure_turns(0.0003)
    base, target = baseline_and_target(path)
    model = train(base, PipelineConfig())
    fast = run_report(target, model, PipelineConfig())
    dist = run_report(target, model, PipelineConfig(driver_finish_rows=0))
    a, b = fast["anomalies"].to_pandas(), dist["anomalies"].to_pandas()
    assert len(a) == len(b)
    assert (a["conv_id"].values == b["conv_id"].values).all()
    assert (a["turn_idx"].values == b["turn_idx"].values).all()
    assert (a["text"].values == b["text"].values).all()
    ra = fast["reports"].to_pandas().sort_values("conv_id").reset_index(drop=True)
    rb = dist["reports"].to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert (ra["conv_id"] == rb["conv_id"]).all()
    assert (ra["anomaly_count"].values == rb["anomaly_count"].values).all()
    assert (ra["line_count"].values == rb["line_count"].values).all()
    assert np.allclose(ra["mean_distance"], rb["mean_distance"], atol=1e-6)


import numpy as np


def test_model_roundtrip(ray_outputs, tmp_path):
    from logjuicer_ray.state.model import Model

    model = ray_outputs["model"]
    model.save(str(tmp_path / "model"))
    loaded = Model.load(str(tmp_path / "model"))
    assert set(loaded.indexes) == set(model.indexes)
    for k in model.indexes:
        assert loaded.indexes[k].index.nrows == model.indexes[k].index.nrows
        assert loaded.indexes[k].line_count == model.indexes[k].line_count


def test_ray_run_deterministic(ray_session):
    """Two executions over differently-partitioned input produce identical
    sink rows (cluster-size independence stand-in)."""
    from logjuicer_ray.pipelines.report import run_report
    from logjuicer_ray.pipelines.train import train
    from logjuicer_ray.sources.transcripts import baseline_and_target

    path = ensure_turns(0.0003)
    cfg = PipelineConfig()
    outs = []
    for nparts in (2, 13):
        base, target = baseline_and_target(path)
        base = base.repartition(nparts)
        target = target.repartition(nparts)
        model = train(base, cfg)
        out = run_report(target, model, cfg)
        outs.append(out["anomalies"].to_pandas())
    a, b = outs
    assert len(a) == len(b)
    assert (a["conv_id"].values == b["conv_id"].values).all()
    assert (a["turn_idx"].values == b["turn_idx"].values).all()
    assert (a["text"].values == b["text"].values).all()
    assert (a["distance"].values == b["distance"].values).all()


def test_config_matchers(ray_session):
    """Per-conversation config overrides (match_job analog,
    config.rs:224-249): ignore patterns applied only to matching convs."""
    import pyarrow as pa
    import ray.data as rd

    from logjuicer_ray.pipelines.report import run_report
    from logjuicer_ray.pipelines.train import train

    def tbl(rows):
        return pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows]),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "role": pa.array(["assistant"] * len(rows)),
                "text": pa.array([r[2] for r in rows]),
                "tool": pa.array(["bash"] * len(rows)),
                "ts": pa.array([None] * len(rows), pa.timestamp("ms")),
            }
        )

    base = rd.from_arrow(tbl([("b1", 1, "regular log line alpha")]))
    target = rd.from_arrow(
        tbl(
            [
                ("noisy-conv", 1, "special Traceback noise"),
                ("quiet-conv", 1, "special Traceback noise"),
            ]
        )
    )
    cfg = PipelineConfig(
        skip_duplicate=False,
        matchers=[("^noisy-", {"ignore_patterns": ["special .* noise"]})],
    )
    model = train(base, cfg)
    out = run_report(target, model, cfg)
    an = out["anomalies"].to_pandas()
    # the matcher suppresses the line only in noisy-conv
    assert list(an["conv_id"]) == ["quiet-conv"]


def test_sorted_input_scan_parity(ray_session):
    """The sorted-input block-scan fast path (boundary-fragment repair
    instead of a full shuffle) matches the groupby path row for row."""
    from logjuicer_ray.pipelines.report import run_errors_report, run_report
    from logjuicer_ray.pipelines.train import train
    from logjuicer_ray.sources.transcripts import baseline_and_target, read_turns

    path = ensure_turns(0.0003)
    base, target = baseline_and_target(path)
    model = train(base, PipelineConfig())
    slow = run_report(target, model, PipelineConfig())
    base2, target2 = baseline_and_target(path)
    fast = run_report(target2, model, PipelineConfig(sorted_input=True))
    a, b = slow["anomalies"].to_pandas(), fast["anomalies"].to_pandas()
    assert len(a) == len(b)
    for col in ("conv_id", "turn_idx", "text", "distance"):
        assert (a[col].values == b[col].values).all(), col
    assert [list(x) for x in a["before"]] == [list(x) for x in b["before"]]
    ra = slow["reports"].to_pandas().sort_values("conv_id").reset_index(drop=True)
    rb = fast["reports"].to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert (ra["line_count"].values == rb["line_count"].values).all()
    assert (ra["anomaly_count"].values == rb["anomaly_count"].values).all()

    es = run_errors_report(read_turns(path, split="target"), PipelineConfig())
    ef = run_errors_report(
        read_turns(path, split="target"), PipelineConfig(sorted_input=True)
    )
    ea, eb = es["anomalies"].to_pandas(), ef["anomalies"].to_pandas()
    assert len(ea) == len(eb)
    for col in ("conv_id", "turn_idx", "text"):
        assert (ea[col].values == eb[col].values).all(), col
