"""Per-stage metrics/lineage rows.

The reference keeps per-run counters on the model (line/byte counters and
timings, model.rs:451-470) and emits progress traces (cli/src/main.rs:433-447).
The distributed analog is a table: one row per pipeline stage with rows
in/out, wall seconds and output bytes, written alongside the sinks as
``metrics/part-0.parquet`` so an audited or resumed run can account for every
stage without re-executing anything.

Collection is driver-side and free: every recorded quantity is something the
pipelines already computed (scan counts, anomaly counts, materialized table
sizes) — no extra distributed executions.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import pyarrow as pa

__all__ = ["Metrics", "StageMetric"]


@dataclass
class StageMetric:
    pipeline: str
    stage: str
    rows_in: int | None = None
    rows_out: int | None = None
    wall_s: float | None = None
    bytes_out: int | None = None
    detail: dict = field(default_factory=dict)


class Metrics:
    """Accumulates stage rows across the pipelines of one run."""

    def __init__(self) -> None:
        self.stages: list[StageMetric] = []
        self._t0 = time.monotonic()

    def record(self, pipeline: str, stage: str, *, rows_in: int | None = None,
               rows_out: int | None = None, wall_s: float | None = None,
               bytes_out: int | None = None, **detail) -> None:
        self.stages.append(
            StageMetric(pipeline, stage, rows_in, rows_out,
                        None if wall_s is None else round(wall_s, 3),
                        bytes_out, detail)
        )

    def to_table(self) -> pa.Table:
        return pa.table(
            {
                "seq": pa.array(range(len(self.stages)), pa.int32()),
                "pipeline": pa.array([s.pipeline for s in self.stages], pa.string()),
                "stage": pa.array([s.stage for s in self.stages], pa.string()),
                "rows_in": pa.array([s.rows_in for s in self.stages], pa.int64()),
                "rows_out": pa.array([s.rows_out for s in self.stages], pa.int64()),
                "wall_s": pa.array([s.wall_s for s in self.stages], pa.float64()),
                "bytes_out": pa.array([s.bytes_out for s in self.stages], pa.int64()),
                "detail": pa.array(
                    [json.dumps(s.detail, sort_keys=True) for s in self.stages],
                    pa.string(),
                ),
            }
        )

    def write(self, out_dir: str) -> str:
        """Write ``metrics/part-0.parquet`` under ``out_dir``; returns the
        file path."""
        import pyarrow.parquet as pq

        d = os.path.join(out_dir, "metrics")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, "part-0.parquet")
        pq.write_table(self.to_table(), path)
        return path
