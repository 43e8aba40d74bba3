"""CLI, sinks (resume), similarity report, and errors-with-model tests."""

import json
import os

import pytest

from logjuicer_ray.config import PipelineConfig
from logjuicer_ray.synth import ensure_turns


def test_cli_report_writes_sinks(ray_session, tmp_path):
    from logjuicer_ray.cli import main

    path = ensure_turns(0.0003)
    out = tmp_path / "out"
    rc = main(
        ["report", "--input", path, "--out", str(out), "--quiet",
         "--model", str(tmp_path / "model")]
    )
    assert rc == 0
    summary = json.loads((out / "summary.json").read_text())
    assert summary["sinks"]["anomalies"] > 0
    assert summary["total_line_count"] > 0
    for sink in ("anomalies", "reports"):
        assert (out / sink / "manifest.json").exists()
    # resume: rerun skips finished sinks (manifest mtime unchanged)
    m = (out / "anomalies" / "manifest.json").stat().st_mtime
    rc = main(["report", "--input", path, "--out", str(out), "--quiet",
               "--model", str(tmp_path / "model")])
    assert rc == 0
    assert (out / "anomalies" / "manifest.json").stat().st_mtime == m


def test_errors_with_model_filter(ray_session):
    path = ensure_turns(0.0003)
    from logjuicer_ray.pipelines.report import run_errors_report
    from logjuicer_ray.pipelines.train import train
    from logjuicer_ray.sources.transcripts import baseline_and_target

    base, target = baseline_and_target(path)
    cfg = PipelineConfig()
    plain = run_errors_report(target, cfg)["anomalies"].to_pandas()
    model = train(base, cfg)
    filtered = run_errors_report(target, cfg, model=model)["anomalies"].to_pandas()
    # filtering can only remove anomalies
    assert len(filtered) <= len(plain)
    assert set(zip(filtered["conv_id"], filtered["turn_idx"])) <= set(
        zip(plain["conv_id"], plain["turn_idx"])
    )


def test_similarity_report(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from logjuicer_ray.pipelines.similarity import create_similarity

    def anomalies_table(rows):
        return pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows]),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "role": pa.array(["assistant"] * len(rows)),
                "tool": pa.array(["bash"] * len(rows)),
                "distance": pa.array([r[2] for r in rows], pa.float32()),
                "text": pa.array([r[3] for r in rows]),
            }
        )

    t0 = rd.from_arrow(
        anomalies_table(
            [("c1", 1, 1.0, "shared failure alpha"), ("c1", 5, 0.9, "only in target zero")]
        )
    )
    t1 = rd.from_arrow(anomalies_table([("c9", 2, 1.0, "shared failure alpha")]))
    out = create_similarity([t0, t1]).to_pandas()
    assert len(out) == 2
    top = out.iloc[0]
    assert top["text"] == "shared failure alpha"
    assert top["n_sources"] == 2
    assert list(top["sources"]) == ["0:c1", "1:c9"]
    # first occurrence wins (target 0)
    assert top["target_id"] == 0 and top["conv_id"] == "c1"
    assert out.iloc[1]["n_sources"] == 1
