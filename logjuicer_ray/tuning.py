"""Ray Data execution-context tuning.

One measured, documented knob: Ray Data's per-operator resource reservation
(``ReservationOpResourceAllocator``, ray/data/_internal/execution/
resource_manager.py) divides ``reservation_ratio × cluster_CPUs`` evenly
across the eligible operators of the DAG.  Our pipelines are
``read → map (tokenize+combine) → sort → map → sort → map``: 4+ eligible
operators.  On a small cluster that floor starves the hot fused map
operator — measured on the sf0.1 train pipeline:

=========  ==================  =====================
num_cpus   reservation on      reservation off
=========  ==================  =====================
8          326–461 s           **47 s**  (7–10×)
32         **25–36 s**         66–108 s  (2–3×)
=========  ==================  =====================

With reservation ON at 8 CPUs the fused tokenize+prepare operator runs its
~11 s tasks nearly sequentially (its CPU budget rounds to ~1–2 slots while
the not-yet-runnable sort stages hold their reservations); with reservation
OFF at 32 CPUs the greedy read floods the object store and starves the map.
So: disable reservation only below ``_SMALL_CLUSTER_CPUS``.  At the real
design point (hundreds of workers) the per-op reservation is ample and the
default allocator is correct.
"""

from __future__ import annotations

import logging

__all__ = ["configure_data_context", "SMALL_CLUSTER_CPUS"]

SMALL_CLUSTER_CPUS = 12


def configure_data_context(num_cpus: float | None = None, *, quiet: bool = True) -> None:
    """Apply engine DataContext defaults.  ``num_cpus`` defaults to the
    live cluster's CPU count (requires an initialized Ray)."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    if quiet:
        ctx.enable_progress_bars = False
        logging.getLogger("ray.data").setLevel(logging.ERROR)
    if num_cpus is None:
        try:
            import ray

            if ray.is_initialized():
                num_cpus = ray.cluster_resources().get("CPU", 0)
        except Exception:
            num_cpus = None
    if num_cpus and num_cpus <= SMALL_CLUSTER_CPUS:
        ctx.op_resource_reservation_enabled = False
