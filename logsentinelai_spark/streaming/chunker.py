"""Stateful count/timeout chunking with load shedding — the reference's
realtime buffering semantics (SURVEY.md §2.9 T2/T3/T4) as a custom
stateful Structured Streaming operator (``applyInPandasWithState``).

Reference behavior being mirrored (`core/monitoring.py`):
  * T2 count window: buffer lines per source; emit a chunk whenever the
    buffer reaches ``chunk_size`` (`core/monitoring.py:412-427`).
  * T3 pending-timeout flush: a partial buffer older than
    ``pending_timeout`` is force-emitted (`:358-366, 429-438`).
  * T4 load shedding (keep-latest): if a trigger delivers more than
    ``sampling_threshold`` pending rows, keep only the LATEST
    ``chunk_size`` of them (`:344-356, 404-409`) — the reference sheds
    old rows, not new ones.

Spark has no built-in count-based window, so this is exactly the
"custom stateful operator" seam: state = the pending buffer per key,
timeouts = ProcessingTimeTimeout. Emitted chunks carry per-chunk
observability (n_rows, first/last event ids, flush reason) echoing the
reference's per-chunk @-metadata.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CHUNK_SCHEMA = (
    "source string, chunk_id long, n_rows int, first_event long, "
    "last_event long, reason string"
)
STATE_SCHEMA = "chunk_id long, pending_ids array<long>"


def chunking_fn(chunk_size: int, pending_timeout_ms: int, sampling_threshold: int):
    """Returns the applyInPandasWithState UDF implementing T2+T3+T4."""

    def _chunk(
        key: tuple[str],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        if state.hasTimedOut:
            # T3: force-flush the partial pending buffer. The chunk
            # counter must SURVIVE the flush — removing state here
            # would restart chunk_id at 0 on the next event and emit
            # duplicate (source, chunk_id) keys downstream.
            chunk_id, pending = state.get if state.exists else (0, [])
            pending = list(pending)
            if pending:
                state.update((chunk_id + 1, []))
                yield pd.DataFrame(
                    {
                        "source": [source], "chunk_id": [chunk_id],
                        "n_rows": [len(pending)], "first_event": [pending[0]],
                        "last_event": [pending[-1]], "reason": ["timeout"],
                    }
                )
            elif chunk_id == 0:
                state.remove()  # nothing ever emitted for this source: safe to GC
            else:
                state.update((chunk_id, []))
            return
        chunk_id, pending = state.get if state.exists else (0, [])
        pending = list(pending)
        new_ids: list[Any] = []
        for pdf in batches:
            new_ids.extend(int(x) for x in pdf["event_id"])
        new_ids.sort()  # deterministic arrival order within the trigger
        pending.extend(new_ids)
        shed = False
        if len(pending) > sampling_threshold:
            # T4 keep-latest shedding, as the reference does under overload
            pending = pending[-chunk_size:]
            shed = True
        out = []
        while len(pending) >= chunk_size:
            chunk, pending = pending[:chunk_size], pending[chunk_size:]
            out.append((source, chunk_id, len(chunk), chunk[0], chunk[-1],
                        "sampled" if shed else "count"))
            chunk_id += 1
        state.update((chunk_id, pending))
        state.setTimeoutDuration(pending_timeout_ms)
        if out:
            yield pd.DataFrame(
                out, columns=["source", "chunk_id", "n_rows", "first_event",
                              "last_event", "reason"])

    return _chunk


def chunked_stream(
    events_stream: DataFrame,
    chunk_size: int = 10,
    pending_timeout_ms: int = 30_000,
    sampling_threshold: int = 100,
) -> DataFrame:
    """events (with ``source`` + ``event_id`` columns) -> chunk records.
    Count-window + timeout-flush + keep-latest shedding, all in one
    stateful operator (the reference's chunk buffer, distributed)."""
    return (
        events_stream.groupBy("source")
        .applyInPandasWithState(
            chunking_fn(chunk_size, pending_timeout_ms, sampling_threshold),
            outputStructType=CHUNK_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
