"""Pipeline configuration.

Analog of the reference's user config (crates/model/src/config.rs:160-310):
ignore patterns, dedup toggle, and the engine's scale knobs (batch sizes,
actor-pool sizing, salting).  The config is a small plain object broadcast to
every stage (shipped inside the map_batches callables).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, replace


@dataclass
class PipelineConfig:
    # --- reference-semantics knobs ---------------------------------------
    #: regexes; matching lines are counted but never trained/scored
    #: (config.rs:211-213, applied process.rs:71-73,260-262)
    ignore_patterns: list[str] = field(default_factory=list)
    #: per-source + global dedup of scored lines (config.rs:168-172,
    #: LOGJUICER_KEEP_DUPLICATE analog)
    skip_duplicate: bool = True
    #: anomaly threshold on cosine distance (process.rs:20)
    threshold: float = 0.3
    #: max raw line length in bytes; longer lines are truncated at ingest
    #: (the reference line iterator caps at 6000, iterator.rs:155-157)
    max_line_bytes: int = 6000
    #: treat each embedded newline in a turn's text as a record boundary
    #: (BytesLines/LinesIterator parity, iterator.rs:100-170: a record with
    #: embedded newlines is N lines, each independently byte-capped).  Turns
    #: are exploded at ingest and ``turn_idx`` in every output becomes the
    #: per-conversation LINE ordinal — the reference's line_number — instead
    #: of the record index.  Requires ``sorted_input=False`` (the exploded
    #: rows flow through the keyed conv_id shuffle, which carries the
    #: intra-turn line order explicitly).
    split_multiline_turns: bool = False

    # --- engine scale knobs ----------------------------------------------
    #: rows per scoring batch (reference chunk is 512 unique lines;
    #: a larger Arrow batch amortizes actor dispatch, the scorer still
    #: matmuls in 512-row slices)
    score_batch_size: int = 4096
    #: rows per tokenizer batch
    tokenize_batch_size: int = 2048
    #: actor-pool size for the scorer (min, max); None → stateless default
    score_concurrency: tuple[int, int] | None = None
    #: salt buckets for the train-side groupby — a hot (role, tool) group is
    #: split into this many partial index builds merged by the combiner
    #: (skew handling, SURVEY.md §4); salt = hash(dedup_key) % n so the
    #: per-salt dedup stays globally exact
    train_salt_buckets: int = 8
    #: declare that the input Parquet is globally sorted by (conv_id,
    #: turn_idx) — the engine's canonical layout.  The conversation scan then
    #: runs per block with a tiny boundary-fragment repair shuffle instead of
    #: an all-to-all sort of every row: only conversations straddling a block
    #: boundary (~n_blocks of them) are shuffled.  MUST be False for inputs
    #: whose conversations are not contiguous.
    sorted_input: bool = False
    #: when the scan output (anomalies + per-conv counters) has at most this
    #: many rows, the global dedup / report aggregation / final sorts run
    #: driver-side in one pass instead of as three more distributed
    #: executions (each execution costs seconds of orchestration).  Set to 0
    #: to force the fully distributed path (used at 10^12-turn scale where
    #: the anomaly set itself is dataset-sized, and by the parity tests).
    driver_finish_rows: int = 2_000_000

    #: two-pass global date seeding (model.rs:644-648 parity, opt-in): pass 1
    #: reports normally; the timestamp of the first timed anomaly in global
    #: (conv_id, turn_idx) order becomes ``gl_date`` for pass 2, so
    #: conversations whose lines carry only time-of-day stamps inherit that
    #: date.  Deterministic replacement of the reference's first-finished-
    #: source race (the Mutex in model.rs:644-648).  Costs a second scan of
    #: the target — only enable for sources with time-only timestamps.
    global_date: bool = False

    #: per-conversation config matchers, the ``match_job`` analog
    #: (config.rs:224-249): ``[(conv_id_regex, {field: override, ...}), ...]``
    #: — the first matching entry overrides fields of this config for that
    #: conversation (e.g. extra ignore_patterns, skip_duplicate=False)
    matchers: list = field(default_factory=list)

    def for_conv(self, conv_id: str) -> "PipelineConfig":
        """Resolve the effective config for one conversation
        (Config::get_target_config, config.rs:108-119)."""
        for pattern, overrides in self.matchers:
            if re.search(pattern, conv_id):
                return replace(self, matchers=[], **overrides)
        return self

    def compiled_ignores(self):
        if not self.ignore_patterns:
            return None
        return re.compile("|".join(f"(?:{p})" for p in self.ignore_patterns))

    def ignored_fn(self):
        rx = self.compiled_ignores()
        if rx is None:
            return lambda raw: False
        return lambda raw: rx.search(raw) is not None
