"""Per-conversation sequential scans: anomaly-context assembly and errors
extraction.

These are the order-sensitive parts of the reference pipeline.  The reference
streams each log file through ``ChunkProcessor`` (crates/model/src/process.rs
:126-436) / ``ErrorsProcessor`` (crates/model/src/errors.rs:65-194); in the
Ray engine a conversation ≙ a log file and these functions run inside
``groupby(conv_id).map_groups`` over rows sorted by ``turn_idx`` (the
input_hint's stable-turn-ordering invariant).

Chunking note: the reference buffers 512 unique lines per scoring matmul and
carries ≤12 ``left_overs`` lines across chunk boundaries purely as a memory
bound; processing the whole (already-scored) conversation in one pass yields
the same anomalies/contexts.  Scoring itself stays batched in the Ray scorer
stage.

Determinism note (SURVEY.md §4): the reference's *global* dedup and gl_date
are rayon-race-ordered; the Ray engine replaces them with deterministic rules
(global dedup = post-scan shuffle keeping min (conv_id, turn_idx); the
time-only date anchor is the first full timestamp seen in the conversation,
optionally overridden by an explicit ``gl_date``).
"""

from __future__ import annotations

from .timestamps import TS_FULL, TS_TIME, parse_timestamp, set_date
from .tokenizer import process as tokenize
from .tokenizer import unordered_key
from . import errors_parser

__all__ = ["scan_conversation", "scan_errors", "THRESHOLD", "CTX_LENGTH"]

THRESHOLD = 0.3  # process.rs:20
CTX_LENGTH = 3  # process.rs:22
BETWEEN_CTX_LENGTH = 12  # process.rs:24
JOB_OUTPUT_MARKER = "TASK [run-logjuicer"  # process.rs:256-258
NO_TS_AFTER = 42  # stop parsing timestamps if none seen by this pos (process.rs:369)
TS_LOOKBACK = 32  # backward timestamp scan limit (process.rs:226-244)


def scan_conversation(
    rows,
    *,
    skip_duplicates: bool = True,
    is_job_output: bool = False,
    gl_date: int | None = None,
    ignored=None,
):
    """Assemble anomaly contexts for one conversation.

    ``rows`` is an iterable of ``(turn_idx, text, dedup_key, distance)``
    sorted by ``turn_idx`` — ``dedup_key`` is the unordered token bag
    computed by the tokenize stage and distances come from the batched
    scorer stage (shipping the key instead of the token string keeps the
    conv_id shuffle lean).  Returns
    ``(anomalies, line_count, byte_count)`` where each anomaly is a dict with
    keys ``turn_idx, distance, ts, text, before, after, dedup_key``.

    Mirrors process.rs:246-436 with the chunk boundary removed; the
    before-context extends to 12 lines when it touches the previous
    anomaly's context (collect_before, process.rs:443-474) and the after
    context absorbs up to 3 following non-anomaly lines.
    """
    ignored = ignored or (lambda raw: False)
    buffer: list[tuple[int, str]] = []  # (turn_idx, raw) — non-ignored lines
    seen: set[str] | None = set() if skip_duplicates else None
    anomalies: list[dict] = []
    current: dict | None = None
    last_context_pos = 0
    line_count = 0
    byte_count = 0
    # LastTS state (process.rs:159-163): None ⇒ Missing, else (ts, pos)
    last_ts: tuple[int | None, int] | None = (None, 0)
    conv_date = gl_date  # deterministic date anchor for time-only stamps
    scored_flags: list[tuple[bool, float, str]] = []  # aligned with buffer

    for turn_idx, text, dedup_key, distance in rows:
        if not text:
            continue  # the reference line iterator never yields empty lines
        line_count += 1
        byte_count += len(text.encode("utf-8", "surrogatepass"))
        if is_job_output and JOB_OUTPUT_MARKER in text:
            break
        if ignored(text):
            continue
        if seen is not None:
            scored = dedup_key not in seen
            if scored:
                seen.add(dedup_key)
        else:
            scored = True
        buffer.append((turn_idx, text))
        scored_flags.append((scored, distance, dedup_key))

    def get_timestamp(raw: str, buf_idx: int):
        nonlocal conv_date
        if last_ts is None:  # Missing: source has no timestamps
            return None
        ts = parse_timestamp(raw)
        if ts is None:
            # scan backwards ≤32 buffer lines, stop at the last known ts pos
            # (process.rs:226-244)
            _, known_pos = last_ts
            for step, j in enumerate(range(buf_idx - 1, -1, -1)):
                if step >= TS_LOOKBACK:
                    break
                prev_pos, prev_raw = buffer[j]
                if prev_pos <= known_pos:
                    break
                ts = parse_timestamp(prev_raw)
                if ts is not None:
                    break
        if ts is None:
            return None
        kind, value = ts
        if kind == TS_FULL:
            if conv_date is None:
                conv_date = value
            return value
        assert kind == TS_TIME
        if conv_date is not None:
            return set_date(conv_date, value)
        return None

    def complete(anomaly: dict) -> None:
        anomalies.append(anomaly)

    for i, ((pos, raw), (scored, distance, dedup_key)) in enumerate(
        zip(buffer, scored_flags)
    ):
        is_anomaly = scored and distance is not None and distance > THRESHOLD
        if is_anomaly:
            if current is not None:
                complete(current)
                current = None
            ts = get_timestamp(raw, i)
            # LastTS update (process.rs:367-371)
            if last_ts is not None:
                if last_ts[0] is None and ts is None and pos > NO_TS_AFTER:
                    last_ts = None  # Missing
                else:
                    last_ts = (ts, pos)
            ctx = (
                BETWEEN_CTX_LENGTH
                if i - last_context_pos < BETWEEN_CTX_LENGTH
                else CTX_LENGTH
            )
            before_start = max(last_context_pos, i - ctx)
            current = {
                "turn_idx": pos,
                "distance": distance,
                "ts": ts,
                "text": raw,
                "before": [b for _, b in buffer[before_start:i]],
                "after": [],
                "dedup_key": dedup_key,
            }
            last_context_pos = i + 1
        else:
            if current is not None:
                current["after"].append(raw)
                last_context_pos = i + 1
                if len(current["after"]) >= CTX_LENGTH:
                    complete(current)
                    current = None
    if current is not None:
        complete(current)
    return anomalies, line_count, byte_count


def scan_errors(
    rows,
    *,
    is_ansible: bool = False,
    ignored=None,
):
    """Extract error anomalies for one conversation (ErrorsProcessor,
    errors.rs:116-194).

    ``rows``: iterable of ``(turn_idx, text)`` sorted by turn_idx.  Returns
    ``(anomalies, line_count, byte_count)``; anomalies carry
    ``distance = 0.5`` like the reference (errors.rs:197-213).  Ansible
    conversations skip the per-source dedup (errors.rs:289-293).
    """
    ignored = ignored or (lambda raw: False)
    parser = errors_parser.State()
    history: list[str] = []  # capped at 3 except while a traceback accumulates
    seen: set[str] | None = None if is_ansible else set()
    anomalies: list[dict] = []
    current: dict | None = None
    line_count = 0
    byte_count = 0

    def history_last_timestamp():
        # errors.rs:43-52: first parseable timestamp in the history window
        for h in history:
            ts = parse_timestamp(h)
            if ts is not None:
                return ts
        return None

    for turn_idx, text in rows:
        if not text:
            continue
        line_count += 1
        byte_count += len(text.encode("utf-8", "surrogatepass"))
        result = parser.parse(text)
        if result == errors_parser.NEED_MORE:
            # accumulate the traceback lines in the history (uncapped,
            # errors.rs:132-139)
            history.append(text)
            if current is not None:
                anomalies.append(current)
                current = None
            continue
        is_error = result in (errors_parser.ERROR, errors_parser.COMPLETED_TRACEBACK)
        if ignored(text):
            continue
        if is_error:
            if seen is not None:
                if unordered_key(tokenize(text)) in seen:
                    continue
                seen.add(unordered_key(tokenize(text)))
            ts = parse_timestamp(text) or history_last_timestamp()
            ts_ms = ts[1] if ts is not None and ts[0] == TS_FULL else None
            if current is not None:
                # return the pending anomaly; this error starts with an
                # empty before-context (errors.rs:163-172)
                anomalies.append(current)
                current = {
                    "turn_idx": turn_idx,
                    "distance": 0.5,
                    "ts": ts_ms,
                    "text": text,
                    "before": [],
                    "after": [],
                    "dedup_key": unordered_key(tokenize(text)),
                }
            else:
                current = {
                    "turn_idx": turn_idx,
                    "distance": 0.5,
                    "ts": ts_ms,
                    "text": text,
                    "before": list(history),
                    "after": [],
                    "dedup_key": unordered_key(tokenize(text)),
                }
                history.clear()
        elif current is not None:
            current["after"].append(text)
            if len(current["after"]) > 2:
                anomalies.append(current)
                current = None
        else:
            # capped history for the next before-context (errors.rs:30-36)
            if len(history) >= CTX_LENGTH:
                del history[: len(history) - CTX_LENGTH + 1]
            history.append(text)
    if current is not None:
        anomalies.append(current)
    return anomalies, line_count, byte_count
