"""logjuicer_ray: Ray-Data-native anomaly-extraction engine.

Import-time hook: with ``GRAFT_MEM_RETAIN=1`` every process that loads the
engine — driver or Ray worker deserializing a map_batches callable —
switches its allocators to retain freed pages (see
``tuning.retain_worker_memory`` for why this is opt-in: it wins in
microbenchmarks but measured slower in the 32-worker pipeline).
"""

from .tuning import retain_worker_memory as _retain

_retain()
