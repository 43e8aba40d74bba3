"""Scoring stage: batched cosine distance against per-group baseline indexes.

The stateful actor-pool stage (reference scorer: IndexReader::distance,
index.rs:68-102 + ChunkProcessor batching, process.rs:283-287).  The model is
put in the object store once (``ray.put``) and fetched per actor in
``__init__`` — never re-shipped per batch.  Per batch the stage:

1. groups rows by ``group_key`` (one baseline index per group);
2. dedups token strings within the (batch, group) — duplicates share one
   matmul row, mirroring the reference's unique-line scoring;
3. runs the chunked sparse matmul and scatters distances back.

Rows whose group has no index (and the model holds more than one index) get
``has_index = False`` and a distance of 1.0 — they are routed to the
``unknown`` sink downstream (model.rs:665-673 anti-join semantics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.model import Model
from ..vectorize import build_index, distances

__all__ = ["ScorerStage", "score_table"]


from ..arrow_util import dict_codes as _dict_encode


def score_table(batch: pa.Table, model: Model) -> pa.Table:
    n = batch.num_rows
    dist = np.ones(n, dtype=np.float32)
    has_index = np.zeros(n, dtype=bool)
    if n:
        # dictionary-encode in Arrow C++ so Python only ever touches UNIQUE
        # token strings (the reference scores unique lines once, process.rs);
        # int32 code comparisons replace object-array string compares — the
        # measured allocator hot spot at high worker counts
        tok_codes, tok_dict = _dict_encode(batch.column("tokens"))
        grp_codes, grp_dict = _dict_encode(batch.column("group_key"))
        for gi, key in enumerate(grp_dict.to_pylist()):
            index = model.lookup(key)
            sel = np.flatnonzero(grp_codes == gi)
            if index is None:
                continue
            has_index[sel] = True
            uniq, inverse = np.unique(tok_codes[sel], return_inverse=True)
            uniq_tokens = tok_dict.take(pa.array(uniq, pa.int64())).to_pylist()
            d = distances(index, build_index(uniq_tokens))
            dist[sel] = d[inverse]
    return batch.append_column("distance", pa.array(dist, pa.float32())).append_column(
        "has_index", pa.array(has_index, pa.bool_())
    )


class ScorerStage:
    """Callable class for ``map_batches(..., concurrency=N)``: the model is
    resolved once per actor (zero-copy numpy views out of the object store
    where possible)."""

    def __init__(self, model_ref):
        import ray

        self.model = ray.get(model_ref) if not isinstance(model_ref, Model) else model_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        return score_table(batch, self.model)


# worker-process-level model cache for the stateless-task path: the object
# is plasma-local after the first fetch, but caching also skips re-unpickling
# the Model wrapper per batch
_MODEL_CACHE: dict[str, Model] = {}


def score_batch(batch: pa.Table, *, model_ref=None) -> pa.Table:
    """Stateless-task variant of the scorer.

    On a warm cluster this reuses the existing task workers instead of
    spawning an actor pool per pipeline execution (actor creation is a
    process fork + import per actor); the model is broadcast once via
    ``ray.put`` and each worker resolves it zero-copy from its local object
    store on first use."""
    if isinstance(model_ref, Model):
        return score_table(batch, model_ref)
    import ray

    key = model_ref.hex()
    model = _MODEL_CACHE.get(key)
    if model is None:
        model = ray.get(model_ref)
        _MODEL_CACHE.clear()
        _MODEL_CACHE[key] = model
    return score_table(batch, model)
