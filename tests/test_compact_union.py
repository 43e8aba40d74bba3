"""compact_sink (sinks.py) and read_parquet_union (sources/parquet_union.py).

The union reader's hard oracle runs in the auto-discovered parity sweep
(``docs_union_by_name``); here we test compaction invariants (data
identity, file-count reduction, lineage) and the union reader's alignment,
pruning, and type-conflict detection.
"""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from logjuicer_ray.sinks import compact_sink, read_manifest, write_sink
from logjuicer_ray.sources.parquet_union import read_parquet_union

ROOT = "/tmp/logjuicer_test_compact"


@pytest.fixture()
def work():
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(ROOT)
    yield ROOT
    shutil.rmtree(ROOT, ignore_errors=True)


def _table(n=600):
    return pa.table({
        "id": pa.array(range(n), pa.int64()),
        "text": pa.array([f"row {i} payload" for i in range(n)], pa.string()),
    })


def test_compact_reduces_files_preserves_data(ray_session, work):
    import ray.data as rd

    sink = os.path.join(work, "sink")
    write_sink(rd.from_arrow(_table()).repartition(16), sink)
    before = read_manifest(sink)
    assert len(before["partitions"]) == 16
    m = compact_sink(sink, target_mb=1024)  # everything fits one file
    assert len(m["partitions"]) == 1
    assert m["rows"] == before["rows"] == 600
    assert m["compacted_from"] == 16
    parts = [os.path.join(sink, f) for f in sorted(os.listdir(sink))
             if f.endswith(".parquet")]
    got = rd.read_parquet(parts).sort("id").to_pandas()
    assert got.equals(_table().to_pandas())


def test_compact_noop_when_already_compact(ray_session, work):
    import ray.data as rd

    sink = os.path.join(work, "sink")
    write_sink(rd.from_arrow(_table(50)).repartition(1), sink)
    m = compact_sink(sink, target_mb=1024)
    assert m == read_manifest(sink)  # untouched


def test_union_aligns_and_null_fills(ray_session, work):
    pq.write_table(pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "a": pa.array(["x", "y"], pa.string()),
    }), os.path.join(work, "s1.parquet"))
    pq.write_table(pa.table({
        "b": pa.array([10.5, 20.5], pa.float64()),   # different order too
        "id": pa.array([3, 4], pa.int64()),
    }), os.path.join(work, "s2.parquet"))
    out = read_parquet_union([work]).sort("id").to_pandas()
    assert list(out.columns) == ["id", "a", "b"]  # first-seen union order
    assert list(out["id"]) == [1, 2, 3, 4]
    assert out["a"].tolist()[:2] == ["x", "y"] and out["a"].isna().tolist()[2:] == [True, True]
    assert out["b"].isna().tolist()[:2] == [True, True]
    assert out["b"].tolist()[2:] == [10.5, 20.5]


def test_union_column_projection(ray_session, work):
    pq.write_table(pa.table({"id": pa.array([1], pa.int64()),
                             "a": pa.array(["x"], pa.string())}),
                   os.path.join(work, "s1.parquet"))
    pq.write_table(pa.table({"id": pa.array([2], pa.int64()),
                             "b": pa.array([1.0], pa.float64())}),
                   os.path.join(work, "s2.parquet"))
    out = read_parquet_union([work], columns=["id"])
    assert out.schema().names == ["id"]
    assert out.count() == 2


def test_union_type_conflict_raises(work):
    pq.write_table(pa.table({"id": pa.array([1], pa.int64())}),
                   os.path.join(work, "s1.parquet"))
    pq.write_table(pa.table({"id": pa.array(["1"], pa.string())}),
                   os.path.join(work, "s2.parquet"))
    with pytest.raises(TypeError, match="conflicting types"):
        read_parquet_union([work])


def test_union_missing_raises(work):
    with pytest.raises(FileNotFoundError):
        read_parquet_union([os.path.join(work, "empty-subdir-missing")])
