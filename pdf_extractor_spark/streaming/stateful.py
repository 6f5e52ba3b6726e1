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
from pyspark.sql import functions as F
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


# --- TTL'd per-key dedup cache (VERDICT r02 #8) -----------------------------

DEDUP_TTL_US = 60 * 60 * 1_000_000  # 1 hour

PAGES_STREAM_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                       "text string, lang string")
DEDUP_OUTPUT_SCHEMA = ("key string, url string, text_hash string, "
                       "is_dup boolean, cache_size int, evicted int")
DEDUP_STATE_SCHEMA = "hashes array<string>, expires array<long>"


def _dedup_cache_group(key: Tuple[Any, ...],
                       pdfs: Iterator[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
    """Per-key seen-hash cache with TTL semantics
    ``dropDuplicatesWithinWatermark`` cannot express: a re-sighting
    inside the TTL is flagged (not silently dropped) AND refreshes the
    entry's TTL; entries expire relative to event time; a quiet key's
    whole cache evicts on event-time timeout, emitting an accounting
    row (url NULL, evicted = n entries dropped)."""
    import hashlib

    (k,) = key
    cols = ["key", "url", "text_hash", "is_dup", "cache_size", "evicted"]

    if state.hasTimedOut:
        hashes, _expires = state.get
        state.remove()
        yield pd.DataFrame([(k, None, None, False, 0, len(hashes))],
                           columns=cols)
        return

    cache: dict = {}
    if state.exists:
        hashes, expires = state.get
        cache = dict(zip(hashes, expires))

    rows = []
    for pdf in pdfs:
        for url, ts, text in zip(pdf["url"], pdf["warc_ts"], pdf["text"]):
            rows.append((int(ts.value) // 1000, str(url), text or ""))
    rows.sort()  # (event time, url) — deterministic across partitionings

    out = []
    max_ts = 0
    for ts_us, url, text in rows:
        max_ts = max(max_ts, ts_us)
        h = hashlib.md5(text.encode("utf-8")).hexdigest()
        exp = cache.get(h)
        is_dup = exp is not None and exp > ts_us
        cache[h] = ts_us + DEDUP_TTL_US  # insert or TTL refresh
        out.append((k, url, h, is_dup, len(cache), 0))
    # event-time pruning: drop entries whose TTL lapsed before the
    # newest event this batch — the in-dict eviction path
    cache = {h: e for h, e in cache.items() if e > max_ts}

    if cache:
        state.update((list(cache.keys()), list(cache.values())))
        # whole-key eviction once the watermark passes every entry's TTL
        state.setTimeoutTimestamp(max(cache.values()) // 1000)
    else:
        state.remove()
    yield pd.DataFrame(out, columns=cols)


# --- Per-host quota on a live feed (streaming twin of domain_cap) -----------

QUOTA_OUTPUT_SCHEMA = ("host string, url string, host_seq long, "
                       "kept boolean")
QUOTA_STATE_SCHEMA = "n_seen long"

# canonical host from a URL column — the url_canonicalize algebra
# (lowercase, strip www., strip port), inlined so the quota and the
# batch cap agree on what "one site" means
_HOSTPORT = ("split_part(split_part(split_part(split_part(url, '#', 1),"
             " '://', 2), '?', 1), '/', 1)")
_HOST0 = f"lower(split_part({_HOSTPORT}, ':', 1))"
HOST_EXPR = (f"CASE WHEN substr({_HOST0}, 1, 4) = 'www.'"
             f" THEN substr({_HOST0}, 5) ELSE {_HOST0} END")


def _domain_quota_group(k: int):
    def fold(key: Tuple[Any, ...],
             pdfs: Iterator[pd.DataFrame],
             state: GroupState) -> Iterator[pd.DataFrame]:
        """Admit the first k documents ever seen for this host; state
        is ONE long per host (never evicted — a corpus quota is
        corpus-lifetime, and 10^8 hosts × one counter is trivially
        bounded). Rows within a batch fold in (event time, url) order
        so the admitted set is deterministic across partitionings."""
        (host,) = key
        rows = []
        for pdf in pdfs:
            rows.extend((int(ts.value) // 1000, str(url))
                        for ts, url in zip(pdf["warc_ts"], pdf["url"]))
        rows.sort()
        n = state.get[0] if state.exists else 0
        out = []
        for _ts, url in rows:
            n += 1
            out.append((host, url, n, n <= k))
        state.update((n,))
        yield pd.DataFrame(out, columns=["host", "url", "host_seq",
                                         "kept"])
    return fold


def streaming_domain_cap(spark: SparkSession, source_dir: str,
                         k: int = 10) -> DataFrame:
    """readStream(pages) → per-host admission quota: every document is
    emitted with a verdict, and at most ``k`` per canonical host are
    ever ``kept`` across the whole stream's lifetime.

    This is the quota a live crawl needs where the batch cap
    (queries/webcur.py ``domain_cap``) sorts the finished corpus: a
    stream cannot prefer longer documents it has not seen yet, so the
    streaming semantics are first-k-admitted (deterministic (event
    time, url) fold order within a batch). State per host is a single
    counter with NO timeout — the quota is corpus-lifetime by design,
    unlike the TTL'd dedup cache above whose state must decay."""
    stream = (spark.readStream.schema(PAGES_STREAM_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(source_dir))
    return (stream
            .withColumn("host", F.expr(HOST_EXPR))
            .groupBy("host")
            .applyInPandasWithState(
                _domain_quota_group(k),
                outputStructType=QUOTA_OUTPUT_SCHEMA,
                stateStructType=QUOTA_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def streaming_dedup_cache(spark: SparkSession, source_dir: str,
                          key_col: str = "lang",
                          watermark: str = "1 minute") -> DataFrame:
    """readStream(pages) → per-``key_col`` stateful dedup cache.

    State per key: parallel (hash, expiry) arrays — 16-byte hashes
    only, never text, pruned by TTL each batch and evicted wholesale on
    event-time timeout, so an endless crawl feed holds O(distinct live
    hashes per key) state. Emits EVERY row with its dup verdict
    (append mode) — the streaming twin of `dedup_exact` when filtered
    to ``is_dup = false``, plus the accounting rows a silent
    drop-duplicates can never surface."""
    stream = (spark.readStream.schema(PAGES_STREAM_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(source_dir))
    return (stream
            .withWatermark("warc_ts", watermark)
            .withColumn("key", F.col(key_col))
            .groupBy("key")
            .applyInPandasWithState(
                _dedup_cache_group,
                outputStructType=DEDUP_OUTPUT_SCHEMA,
                stateStructType=DEDUP_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


# --- Lag-based recrawl collapse (exact batch-rule twin; ADVICE r03) ---------

CRAWL_LAG_OUTPUT_SCHEMA = ("canonical_url string, url string, "
                           "warc_ts_us long, content_hash string, "
                           "verdict string")
CRAWL_LAG_STATE_SCHEMA = "last_hash string, last_us long"
CRAWL_LAG_TTL_US = 24 * 60 * 60 * 1_000_000  # 1 day of recrawl memory


def _crawl_lag_group(key: Tuple[Any, ...],
                     pdfs: Iterator[pd.DataFrame],
                     state: GroupState) -> Iterator[pd.DataFrame]:
    """Per-canonical-url state = the PREVIOUS capture's content hash —
    exactly the ``lag(content_hash)`` the batch audit computes
    (queries/webcur.py curate_pages), so reverting content A→B→A keeps
    all three captures, unlike the seen-set semantics of
    ``dropDuplicatesWithinWatermark``. State is one 32-char hash + one
    long per live url, evicted once the key has been quiet for the TTL
    horizon; eviction errs in the SAFE direction (a post-eviction
    recapture counts as changed and is kept — the stream may keep
    extra, it never drops a capture the batch keeps)."""
    (canonical_url,) = key
    cols = ["canonical_url", "url", "warc_ts_us", "content_hash",
            "verdict"]

    if state.hasTimedOut:
        state.remove()
        yield pd.DataFrame([], columns=cols)
        return

    rows = []
    for pdf in pdfs:
        rows.extend((int(ts.value) // 1000, str(url), str(h))
                    for ts, url, h in zip(pdf["warc_ts"], pdf["url"],
                                          pdf["content_hash"]))
    rows.sort()  # (event time, url) — the batch window's sort key

    last_hash, last_us = state.get if state.exists else (None, 0)
    out = []
    for ts_us, url, h in rows:
        verdict = ("unchanged_recrawl" if h == last_hash else "kept")
        out.append((canonical_url, url, ts_us, h, verdict))
        last_hash, last_us = h, ts_us
    state.update((last_hash, last_us))
    state.setTimeoutTimestamp((last_us + CRAWL_LAG_TTL_US) // 1000)
    yield pd.DataFrame(out, columns=cols)


def streaming_crawl_dedup_lag(spark: SparkSession, source_dir: str,
                              watermark: str = "1 hour") -> DataFrame:
    """readStream(pages) → per-capture recrawl verdict with the exact
    consecutive-unchanged rule of the batch ``curate_pages`` stage 1:
    a capture is ``unchanged_recrawl`` iff its content hash equals the
    IMMEDIATELY PREVIOUS capture of the same canonical url, else
    ``kept``. Content hash is ``md5(coalesce(text, ''))`` — identical
    to the batch hash. Within a micro-batch captures fold in (event
    time, url) order, the batch window's sort key; across batches the
    watermark bounds disorder."""
    from ..queries.webcur import canonicalize_urls

    stream = (spark.readStream.schema(PAGES_STREAM_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(source_dir))
    return (canonicalize_urls(stream)
            .withColumn("content_hash",
                        F.md5(F.coalesce(F.col("text"), F.lit(""))))
            .withWatermark("warc_ts", watermark)
            .groupBy("canonical_url")
            .applyInPandasWithState(
                _crawl_lag_group,
                outputStructType=CRAWL_LAG_OUTPUT_SCHEMA,
                stateStructType=CRAWL_LAG_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))
