"""JSONL sink/source tests (sinks.write_jsonl_sink + sources/jsonl.py).

The lossless-roundtrip hard oracle runs in the auto-discovered parity
sweep (``docs_jsonl_roundtrip``); here we test the sink protocol itself:
manifest lineage, resume skip, atomicity of rewrite, and the reader's
projection path.
"""

import json
import os
import shutil

import pyarrow as pa
import pytest

from logjuicer_ray.sinks import read_manifest, sink_finished, write_jsonl_sink
from logjuicer_ray.sources.jsonl import read_jsonl

ROOT = "/tmp/logjuicer_test_jsonl"


def _table(n=40, offset=0):
    return pa.table({
        "id": pa.array(range(offset, offset + n), pa.int64()),
        "text": pa.array([f"doc {i} with  double  spaces\tand tabs"
                          for i in range(offset, offset + n)], pa.string()),
    })


@pytest.fixture()
def sink_dir():
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(ROOT)
    yield os.path.join(ROOT, "sink")
    shutil.rmtree(ROOT, ignore_errors=True)


def test_roundtrip_and_manifest(ray_session, sink_dir):
    import ray.data as rd

    ds = rd.from_arrow(_table()).repartition(4)
    m = write_jsonl_sink(ds, sink_dir, inputs=["synthetic"])
    assert sink_finished(sink_dir)
    assert m["rows"] == 40
    assert m["format"] == "jsonl"
    assert sorted(m["schema"]) == ["id", "text"]
    # per-partition lineage sums to the total
    assert sum(p["rows"] for p in m["partitions"]) == 40
    assert all(p["bytes"] > 0 for p in m["partitions"])
    back = read_jsonl(sink_dir).sort("id").to_pandas()
    want = _table().to_pandas()
    assert back.equals(want)


def test_resume_skips_finished_sink(ray_session, sink_dir):
    import ray.data as rd

    write_jsonl_sink(rd.from_arrow(_table(10)), sink_dir)
    before = read_manifest(sink_dir)
    # a resumed write with DIFFERENT data must be skipped entirely
    m = write_jsonl_sink(rd.from_arrow(_table(99, offset=500)), sink_dir)
    assert m == before
    assert read_jsonl(sink_dir).count() == 10
    # resume=False rewrites atomically
    m2 = write_jsonl_sink(rd.from_arrow(_table(99, offset=500)), sink_dir,
                          resume=False)
    assert m2["rows"] == 99
    assert read_jsonl(sink_dir).sort("id").take(1)[0]["id"] == 500


def test_reader_projection_and_single_file(ray_session, sink_dir):
    import ray.data as rd

    write_jsonl_sink(rd.from_arrow(_table(12)), sink_dir)
    only_ids = read_jsonl(sink_dir, columns=["id"])
    assert only_ids.schema().names == ["id"]
    assert only_ids.count() == 12
    # a single data file (not the manifest) reads standalone
    files = [f for f in os.listdir(sink_dir)
             if f.endswith(".json") and f != "manifest.json"]
    one = read_jsonl(os.path.join(sink_dir, files[0]))
    assert one.count() >= 1


def test_manifest_not_read_as_data(ray_session, sink_dir):
    import ray.data as rd

    write_jsonl_sink(rd.from_arrow(_table(7)), sink_dir)
    assert read_jsonl(sink_dir).count() == 7  # 7 rows, not 7 + manifest
    with open(os.path.join(sink_dir, "manifest.json")) as f:
        assert json.load(f)["rows"] == 7


def test_missing_dir_raises():
    with pytest.raises(FileNotFoundError):
        read_jsonl(ROOT + "/definitely-missing-empty")
