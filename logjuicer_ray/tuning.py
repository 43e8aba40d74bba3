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
import os

__all__ = ["configure_data_context", "retain_worker_memory", "SMALL_CLUSTER_CPUS"]

SMALL_CLUSTER_CPUS = 12

_retained = False


def retain_worker_memory() -> None:
    """Keep freed heap pages inside the process instead of returning them to
    the OS.  Measured on this box (and typical of ballooned/overcommitted
    VMs): the FIRST touch of a freshly-mmapped page costs ~0.7 ms (5-50 MB/s
    effective), while touching an already-faulted page streams at >100 GB/s —
    a ~1000× penalty, paid again on every batch when the allocator
    munmap()s freed buffers.  With 32 worker processes all churning
    per-batch Arrow/numpy buffers the page-fault path also serializes in the
    kernel, which is the measured cause of per-row CPU-seconds inflating
    2.5× from 8 to 32 procs (the 8→32 scaling ceiling, BASELINE.md).

    Two allocators matter:

    - **jemalloc** (pyarrow's pool): disable decay so purged dirty pages are
      never returned (``jemalloc_set_decay_ms(-1)``).
    - **glibc malloc** (numpy, CPython): raise the mmap and trim thresholds
      via ``mallopt`` so large buffers live on the retained heap
      (M_TRIM_THRESHOLD=-1, M_MMAP_THRESHOLD=-3, glibc malloc.h).

    Each long-lived worker then pays the fault cost once per high-water
    mark.  **Measured outcome — OFF by default**: in single-process
    microbenchmarks retention turns a 35 MB/s alloc-churn loop into a
    >100 GB/s one, but in the real 32-worker pipeline it made scoring
    SLOWER (A/B at sf0.1, 32 CPUs: scoring 152/244/132 s with retention vs
    101/91 s without).  The workers' hot data lives in the plasma object
    store (shared mmap, unaffected by heap allocators), and forcing large
    buffers onto the glibc main arena adds lock contention across Ray's
    many worker threads.  Kept as an opt-in (``GRAFT_MEM_RETAIN=1``) for
    allocation-heavy deployments on VMs with slow first-touch.
    """
    global _retained
    if _retained or os.environ.get("GRAFT_MEM_RETAIN") != "1":
        return
    _retained = True
    try:
        import pyarrow as pa

        if pa.default_memory_pool().backend_name == "jemalloc":
            pa.jemalloc_set_decay_ms(-1)
    except Exception:
        pass
    try:
        import ctypes

        libc = ctypes.CDLL(None)
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD: never trim back to OS
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD: big allocs on the heap
    except Exception:
        pass


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
