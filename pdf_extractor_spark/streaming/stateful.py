"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY.md §2.9 — the north rule's
stream-shaped surface; the batch twin is ``events_sessionize``'s
running-sum window).

Why a custom operator instead of ``session_window``: the built-in
session window aggregates; this keeps arbitrary per-key state (the
open session) and emits one row per CLOSED session, closing either on
an in-stream gap or on event-time timeout once the watermark passes
the session's gap horizon — the canonical
keep-state-per-key-and-emit-on-close shape that generalizes to
per-user crawl frontiers or dedup caches on a live feed.

State per user: (session_start_us, last_event_us, n_events) — O(1) per
key, bounded by the key cardinality, evicted on timeout; exactly the
bounded-state posture that lets the stream run indefinitely.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .windows import EVENTS_SCHEMA

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min, matching the batch twin

OUTPUT_SCHEMA = ("user_id long, session_start_us long, "
                 "session_end_us long, n_events long")
STATE_SCHEMA = "start long, last long, n long"


def _sessionize_group(key: Tuple[Any, ...],
                      pdfs: Iterator[pd.DataFrame],
                      state: GroupState) -> Iterator[pd.DataFrame]:
    """Fold new events into the open session; emit sessions closed by
    a gap, or the held session when the watermark times the key out."""
    (user_id,) = key
    closed = []

    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        closed.append((user_id, start, last, n))
        yield pd.DataFrame(closed, columns=[
            "user_id", "session_start_us", "session_end_us", "n_events"])
        return

    ts_us = []
    for pdf in pdfs:
        ts_us.extend(int(v.value) // 1000 for v in pdf["ts"])
    ts_us.sort()

    start, last, n = state.get if state.exists else (None, None, 0)
    for t in ts_us:
        if last is None:
            start, last, n = t, t, 1
        elif t - last > SESSION_GAP_US:
            closed.append((user_id, start, last, n))
            start, last, n = t, t, 1
        else:
            last = max(last, t)
            n += 1
    if last is not None:
        state.update((start, last, n))
        # close the held session once the watermark passes its horizon
        state.setTimeoutTimestamp((last + SESSION_GAP_US) // 1000)
    yield pd.DataFrame(closed, columns=[
        "user_id", "session_start_us", "session_end_us", "n_events"])


def streaming_sessionize(spark: SparkSession, source_dir: str,
                         watermark: str = "10 minutes") -> DataFrame:
    """readStream(events) → per-user stateful sessionization. Returns
    the unstarted session DataFrame; callers attach a sink (append
    mode — only closed sessions ever emit)."""
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(source_dir))
    return (stream
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _sessionize_group,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))
