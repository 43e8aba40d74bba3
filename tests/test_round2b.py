"""Round-2 additions: sorted-input distributed-path parity, report
round-trip (load_report), similarity-from-saved-reports, model staleness."""

import os
import time

import numpy as np
import pytest

from logjuicer_ray.config import PipelineConfig
from logjuicer_ray.synth import ensure_turns


@pytest.fixture(scope="module")
def small_reports(ray_session, tmp_path_factory):
    """Two half-target report runs written to sinks + their live outputs."""
    from logjuicer_ray.pipelines.report import run_report
    from logjuicer_ray.pipelines.train import train
    from logjuicer_ray.sinks import write_sink
    from logjuicer_ray.sources.transcripts import read_turns

    path = ensure_turns(0.0003)
    cfg = PipelineConfig(sorted_input=True)
    base = read_turns(path, split="baseline")
    target = read_turns(path, split="target")
    model = train(base, cfg)

    def half(ds, parity):
        def f(batch):
            import pyarrow as pa
            from zlib import crc32

            keep = [
                crc32(c.encode()) % 2 == parity
                for c in batch.column("conv_id").to_pylist()
            ]
            return batch.filter(pa.array(keep, pa.bool_()))

        return ds.map_batches(f, batch_format="pyarrow")

    outs, dirs = [], []
    root = tmp_path_factory.mktemp("saved_reports")
    for p in (0, 1):
        out = run_report(half(target, p), model, cfg)
        d = str(root / f"report_{p}")
        for name in ("anomalies", "reports", "unknown"):
            write_sink(out[name], os.path.join(d, name), inputs=[path])
        outs.append(out)
        dirs.append(d)
    return {"outs": outs, "dirs": dirs, "model": model, "path": path}


def test_sorted_input_distributed_parity(ray_session):
    """driver_finish_rows=0 + sorted_input (the 100-TB shipping path:
    block scan, distributed fragment repair, size-based repartition) must
    produce byte-identical sink rows vs the driver fast path."""
    from logjuicer_ray.pipelines.report import run_report
    from logjuicer_ray.pipelines.train import train
    from logjuicer_ray.sources.transcripts import baseline_and_target

    path = ensure_turns(0.0003)
    base, target = baseline_and_target(path)
    model = train(base, PipelineConfig())
    fast = run_report(target, model, PipelineConfig(sorted_input=True))
    dist = run_report(
        target, model, PipelineConfig(sorted_input=True, driver_finish_rows=0)
    )
    a = fast["anomalies"].to_pandas()
    b = dist["anomalies"].to_pandas()
    assert len(a) == len(b)
    for col in ("conv_id", "turn_idx", "role", "tool", "text", "dedup_key"):
        assert (a[col].values == b[col].values).all(), col
    assert np.array_equal(a["distance"].values, b["distance"].values)
    ua = fast["unknown"].to_pandas()
    ub = dist["unknown"].to_pandas()
    assert ua.equals(ub)


def test_load_report_roundtrip(ray_session, small_reports):
    from logjuicer_ray.pipelines.report import load_report

    live = small_reports["outs"][0]["anomalies"].to_pandas()
    loaded = load_report(small_reports["dirs"][0])
    got = loaded["anomalies"].to_pandas()
    assert len(got) == len(live)
    got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    live = live.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    for col in ("conv_id", "turn_idx", "text", "dedup_key"):
        assert (got[col].values == live[col].values).all(), col
    assert "reports" in loaded


def test_load_report_missing(tmp_path):
    from logjuicer_ray.pipelines.report import load_report

    with pytest.raises(FileNotFoundError):
        load_report(str(tmp_path / "nope"))


def test_similarity_from_saved_reports(ray_session, small_reports):
    """similarity over load_report() outputs equals similarity over the
    live anomaly datasets (report.rs:198-237 round-trip consumer)."""
    from logjuicer_ray.pipelines.report import load_report
    from logjuicer_ray.pipelines.similarity import create_similarity

    live = create_similarity([o["anomalies"] for o in small_reports["outs"]]).to_pandas()
    saved = create_similarity(
        [load_report(d)["anomalies"] for d in small_reports["dirs"]]
    ).to_pandas()
    assert len(live) == len(saved)
    for col in ("group_key", "tokens", "target_id", "conv_id", "turn_idx", "n_sources"):
        assert (live[col].values == saved[col].values).all(), col


def test_model_staleness(ray_session, small_reports, tmp_path):
    from logjuicer_ray.state.model import Model

    model = small_reports["model"]
    d = str(tmp_path / "model")
    model.save(d)
    inp = small_reports["path"]
    loaded = Model.load(d)
    # model trained after the input was written → fresh
    assert loaded.is_stale([inp]) is False
    assert Model.load_if_fresh(d, [inp]) is not None
    # touch the input newer than the model → stale
    probe = str(tmp_path / "newer_input.txt")
    with open(probe, "w") as f:
        f.write("x")
    os.utime(probe, (time.time() + 5, time.time() + 5))
    assert loaded.is_stale([probe]) is True
    assert Model.load_if_fresh(d, [probe]) is None
    # max-age expiry
    assert loaded.is_stale([], max_age_s=0.0) is True
    # missing model dir → None, not an exception
    assert Model.load_if_fresh(str(tmp_path / "absent"), [inp]) is None
