"""Per-source read-error reporting — the reference Report's
``read_errors: Vec<(Source, err)>`` analog (crates/report/src/report.rs:112,
collected during the scan in crates/model/src/model.rs:607-737).

The ingest scans SKIP corrupt sources (a truncated tarball must never
fail a 100-TB run), but the skip must be REPORTED, not silent.  The
reference records errors imperatively inside its parallel loop; the
Ray-Data analog is a shared mutable collector — exactly the "raw actor
where the Dataset API can't express it" case: a zero-CPU actor that load
tasks notify fire-and-forget ONLY when a source fails (zero overhead on
the happy path), drained by the driver after the pipeline finishes.
"""

from __future__ import annotations

__all__ = ["new_read_error_collector", "drain_read_errors"]


def _collector_cls():
    import ray

    @ray.remote(num_cpus=0)
    class _ReadErrorCollector:
        def __init__(self):
            self.items: list[tuple[str, str]] = []

        def add(self, source: str, err: str) -> None:
            self.items.append((str(source), str(err)))

        def get(self) -> list[tuple[str, str]]:
            # deterministic output order regardless of task scheduling
            return sorted(set(self.items))

    return _ReadErrorCollector


def new_read_error_collector():
    """A fresh collector actor handle; pass as ``error_collector=`` to
    ``read_file_lines`` / ``read_url_lines``."""
    return _collector_cls().remote()


def drain_read_errors(collector) -> list[tuple[str, str]]:
    """Collected ``(source, error)`` pairs, sorted; call AFTER the
    pipeline consuming the source has executed."""
    import ray

    if collector is None:
        return []
    return ray.get(collector.get.remote())


def report_read_error(collector, source: str, err: Exception | str) -> None:
    """Record one failed source (no-op without a collector).  The ack is
    AWAITED: the scan task must not complete before the record lands,
    else the driver's post-pipeline drain can race past it.  Failures
    are the rare path, so the per-failed-source round-trip costs
    nothing on healthy data."""
    if collector is not None:
        import ray

        ray.get(collector.add.remote(
            str(source),
            f"{type(err).__name__}: {err}" if isinstance(err, Exception)
            else str(err),
        ))
