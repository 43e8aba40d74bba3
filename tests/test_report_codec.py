"""Single-file report bundle codec (report_codec.py) — the Cap'n Proto
codec analog (codec.rs:33-331, report.rs:198-237): roundtrip fidelity,
.gz parity, lazy section reads, magic/version/truncation rejection, and
the CLI integration (report --bundle → read-report FILE)."""

import gzip
import json
import os
import shutil
import struct
import subprocess
import sys

import pyarrow as pa
import pytest

from logjuicer_ray.report_codec import (
    MAGIC,
    BundleError,
    read_report_bundle,
    write_report_bundle,
)

ROOT = "/tmp/logjuicer_test_bundle"


@pytest.fixture()
def work():
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(ROOT)
    yield ROOT
    shutil.rmtree(ROOT, ignore_errors=True)


def _tables():
    return {
        "anomalies": pa.table({
            "conv_id": pa.array(["c1", "c2"], pa.string()),
            "turn_idx": pa.array([3, 7], pa.int32()),
            "distance": pa.array([0.41, 0.93], pa.float32()),
            "before": pa.array([["a", "b"], []], pa.list_(pa.string())),
            "text": pa.array(["oops failed", "traceback x"], pa.string()),
        }),
        "reports": pa.table({
            "conv_id": pa.array(["c1", "c2"], pa.string()),
            "anomaly_count": pa.array([1, 1], pa.int64()),
        }),
    }


def test_roundtrip_plain_and_gz(work):
    meta = {"summary": {"total_line_count": 42}}
    for name in ("rep.bundle", "rep.bundle.gz"):
        path = os.path.join(work, name)
        footer = write_report_bundle(path, _tables(), meta=meta)
        assert [s["name"] for s in footer["sections"]] == ["anomalies", "reports"]
        tables, got_footer = read_report_bundle(path)
        assert got_footer["meta"] == meta
        assert got_footer["kind"] == "report"
        for k, t in _tables().items():
            assert tables[k].schema == t.schema
            assert tables[k].equals(t)


def test_gz_smaller_than_plain_is_not_required_but_both_valid(work):
    # the .gz flag is reference parity (report.rs:200-205); both decode
    p1, p2 = os.path.join(work, "a.bundle"), os.path.join(work, "a.bundle.gz")
    write_report_bundle(p1, _tables())
    write_report_bundle(p2, _tables())
    assert read_report_bundle(p1)[0]["reports"].equals(
        read_report_bundle(p2)[0]["reports"])


def test_lazy_single_section(work):
    path = os.path.join(work, "rep.bundle")
    write_report_bundle(path, _tables())
    tables, footer = read_report_bundle(path, sections=["reports"])
    assert set(tables) == {"reports"}
    assert tables["reports"].equals(_tables()["reports"])
    with pytest.raises(BundleError, match="no section"):
        read_report_bundle(path, sections=["nope"])


def test_bad_magic_rejected(work):
    path = os.path.join(work, "rep.bundle")
    write_report_bundle(path, _tables())
    data = bytearray(open(path, "rb").read())
    data[:4] = b"XXXX"
    open(path, "wb").write(bytes(data))
    with pytest.raises(BundleError, match="magic"):
        read_report_bundle(path)


def test_truncation_rejected(work):
    path = os.path.join(work, "rep.bundle")
    write_report_bundle(path, _tables())
    data = open(path, "rb").read()
    open(path, "wb").write(data[:-5])  # lose part of the trailer
    with pytest.raises(BundleError):
        read_report_bundle(path)


def test_version_mismatch_rejected(work):
    path = os.path.join(work, "rep.bundle")
    write_report_bundle(path, _tables())
    data = open(path, "rb").read()
    # rewrite the footer with a bumped version, keeping framing valid
    flen = struct.unpack("<Q", data[-len(MAGIC) - 8: -len(MAGIC)])[0]
    start = len(data) - len(MAGIC) - 8 - flen
    footer = json.loads(data[start: start + flen])
    footer["version"] = 99
    fb = json.dumps(footer, sort_keys=True).encode()
    open(path, "wb").write(
        data[:start] + fb + struct.pack("<Q", len(fb)) + MAGIC)
    with pytest.raises(BundleError, match="version"):
        read_report_bundle(path)


def test_deterministic_bytes(work):
    p1, p2 = os.path.join(work, "a.gz"), os.path.join(work, "b.gz")
    write_report_bundle(p1, _tables())
    write_report_bundle(p2, _tables())
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_save_load_dataset_shapes(ray_session, work):
    import ray.data as rd

    from logjuicer_ray.report_codec import (
        load_report_bundle,
        save_report_bundle,
    )

    report = {
        "anomalies": rd.from_arrow(_tables()["anomalies"]),
        "reports": rd.from_arrow(_tables()["reports"]),
        "scan": rd.from_arrow(pa.table({"x": pa.array([1, 2, 3])})),
    }
    path = os.path.join(work, "rep.bundle")
    save_report_bundle(report, path, meta={"k": "v"})
    back = load_report_bundle(path)
    assert set(back) == {"anomalies", "reports", "_meta"}  # scan excluded
    assert back["_meta"]["meta"] == {"k": "v"}
    got = back["anomalies"].sort("conv_id").to_pandas()
    want = _tables()["anomalies"].to_pandas()
    assert got["text"].tolist() == want["text"].tolist()
    assert got["turn_idx"].tolist() == want["turn_idx"].tolist()


def test_cli_bundle_and_read_report(work):
    """report --bundle writes the single artifact; read-report consumes
    the FILE form and prints the same counts as the sink-dir form."""
    synth = "/tmp/logjuicer_synth/sf0.0003/turns.parquet"
    if not os.path.exists(synth):
        from logjuicer_ray.synth import ensure_turns

        synth = ensure_turns(0.0003)
    out = os.path.join(work, "out")
    bundle = os.path.join(work, "report.bundle.gz")
    env = dict(os.environ, RAY_GRAFT_CPUS="4")
    r = subprocess.run(
        [sys.executable, "-m", "logjuicer_ray", "report",
         "--input", synth, "--out", out, "--bundle", bundle,
         "--num-cpus", "4", "--quiet"],
        capture_output=True, text=True, env=env, timeout=480)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(bundle)

    r2 = subprocess.run(
        [sys.executable, "-m", "logjuicer_ray", "read-report", bundle,
         "--num-cpus", "4"],
        capture_output=True, text=True, env=env, timeout=480)
    assert r2.returncode == 0, r2.stderr[-2000:]
    counts = json.loads(r2.stdout.strip().splitlines()[-1])
    # bundle counts must equal the sink-dir summary counts
    summary = json.load(open(os.path.join(out, "summary.json")))
    for name in ("anomalies", "reports", "unknown"):
        if name in summary["sinks"]:
            assert counts[name] == summary["sinks"][name]


def test_similarity_bundle_roundtrip(ray_session, tmp_path):
    """similarity --from-reports <bundle> --bundle: consumes a report
    bundle as input AND saves the merged matrix as its own bundle
    (SimilarityReport::save analog)."""
    from logjuicer_ray.cli import main
    from logjuicer_ray.report_codec import load_report_bundle
    from logjuicer_ray.synth import ensure_turns

    path = ensure_turns(0.0003)
    out = tmp_path / "rep"
    rep_bundle = str(tmp_path / "rep.bundle")
    rc = main(["report", "--input", path, "--out", str(out),
               "--bundle", rep_bundle, "--quiet"])
    assert rc == 0

    sim_out = tmp_path / "sim"
    sim_bundle = str(tmp_path / "sim.bundle.gz")
    rc = main(["similarity", "--from-reports", rep_bundle, str(out),
               "--out", str(sim_out), "--bundle", sim_bundle, "--quiet"])
    assert rc == 0

    back = load_report_bundle(sim_bundle)
    assert back["_meta"]["kind"] == "similarity"
    import ray.data as rd

    sink_files = [
        os.path.join(sim_out, "similarity", f)
        for f in sorted(os.listdir(sim_out / "similarity"))
        if f.endswith(".parquet")
    ]
    sink_rows = rd.read_parquet(sink_files).count()
    assert back["similarity"].count() == sink_rows
    assert back["_meta"]["meta"]["similarity_rows"] == sink_rows
