"""E2E resume for the sink layout (VERDICT r3 ask #8): a run that dies
mid-write leaves (a) finished sinks with manifests and (b) a half-written
``.inprogress`` directory with real part files but NO manifest.  A rerun
must skip the finished sinks untouched, clean and rewrite the unfinished
one, and produce output identical to a never-crashed run.

The crash is simulated by reproducing the exact on-disk state a SIGKILL
inside ``write_sink`` leaves behind (part files written into the tmp dir,
manifest absent): process death adds nothing beyond this state, and doing
it in-process keeps the test deterministic (no kill/poll race).
"""

import json
import os

import pyarrow.compute as pc


def _report_out(sf=0.0003):
    from logjuicer_ray.config import PipelineConfig
    from logjuicer_ray.pipelines.report import run_report
    from logjuicer_ray.pipelines.train import train
    from logjuicer_ray.sources.transcripts import baseline_and_target
    from logjuicer_ray.synth import ensure_turns

    path = ensure_turns(sf)
    base, target = baseline_and_target(path)
    cfg = PipelineConfig(sorted_input=True)
    model = train(base, cfg)
    return run_report(target, model, cfg)


def _sink_table(path):
    import pyarrow.parquet as pq

    from logjuicer_ray.sinks import read_manifest

    manifest = read_manifest(path)
    import pyarrow as pa

    tables = [
        pq.read_table(os.path.join(path, p["file"]))
        for p in manifest["partitions"]
    ]
    t = pa.concat_tables(tables) if tables else None
    return manifest, t


def test_sink_resume_e2e(ray_session, tmp_path):
    from logjuicer_ray.cli import _write_outputs
    from logjuicer_ray.sinks import write_sink

    out = _report_out()
    inputs = ["synth-sf0.0003"]

    # 1) clean run
    clean = str(tmp_path / "clean")
    os.makedirs(clean)
    _write_outputs(out, clean, inputs=inputs)

    # 2) crashed run: anomalies sink finished, reports sink killed
    #    mid-write (part files in .inprogress, no manifest), unknown never
    #    started
    crashed = str(tmp_path / "resumed")
    os.makedirs(crashed)
    write_sink(out["anomalies"], os.path.join(crashed, "anomalies"), inputs=inputs)
    tmp_reports = os.path.join(crashed, "reports.inprogress")
    os.makedirs(tmp_reports)
    out["reports"].write_parquet(tmp_reports)  # manifest intentionally absent
    assert any(f.endswith(".parquet") for f in os.listdir(tmp_reports))

    manifest_path = os.path.join(crashed, "anomalies", "manifest.json")
    stat_before = os.stat(manifest_path)

    # 3) resumed run over the same outputs
    summary = _write_outputs(out, crashed, inputs=inputs)

    # finished sink skipped untouched (not rewritten: same inode + mtime)
    stat_after = os.stat(manifest_path)
    assert stat_after.st_mtime_ns == stat_before.st_mtime_ns
    assert stat_after.st_ino == stat_before.st_ino
    # half-written state cleaned up, sink finalized with a manifest
    assert not os.path.exists(tmp_reports)
    assert os.path.exists(os.path.join(crashed, "reports", "manifest.json"))

    # 4) resumed outputs identical to the clean run: per-sink manifests
    #    (rows, schema, per-partition rows) and full content match
    for name in ("anomalies", "reports", "unknown"):
        m_clean, t_clean = _sink_table(os.path.join(clean, name))
        m_res, t_res = _sink_table(os.path.join(crashed, name))
        assert m_res["rows"] == m_clean["rows"], name
        assert m_res["schema"] == m_clean["schema"], name
        assert [p["rows"] for p in m_res["partitions"]] == [
            p["rows"] for p in m_clean["partitions"]
        ], name
        if t_clean is None:
            assert t_res is None
            continue
        # order-independent content compare: sort both by all columns
        cols = sorted(t_clean.schema.names)
        da = t_clean.select(cols).to_pandas().astype(str)
        db = t_res.select(cols).to_pandas().astype(str)
        da = da.sort_values(cols).reset_index(drop=True)
        db = db.sort_values(cols).reset_index(drop=True)
        assert da.equals(db), name
    # summary counts come from the resumed manifests
    assert summary["sinks"]["anomalies"] == json.load(
        open(os.path.join(clean, "anomalies", "manifest.json"))
    )["rows"]
