"""Structured Streaming surface (SURVEY.md §2.9).

The reference is batch-only; the north rule adds stream-shaped
requirements. Two entry points:

- ``streaming_event_counts``: the canonical readStream → watermark →
  tumbling-window aggregation; in batch mode the same plan is
  ``q_events_hourly`` (which is the DuckDB-checked twin).
- ``streaming_extract``: the extraction pipeline as a stream — the
  same fused mapInPandas stage applied to a streaming pages source
  via ``foreachBatch``, each micro-batch writing through the lineage
  path. This is how the checkpoint-resumable batch loop in
  pipeline/lineage.py generalizes when the source is a live feed
  rather than snapshot partitions.

At 100 TB the streaming posture matters for the *tail* of a crawl
(continuous ingest after the bulk backfill); watermarking bounds state
for the windowed stats, and foreachBatch gives exactly-once sink
semantics on top of idempotent per-batch overwrites.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.extract import extract_pages

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def streaming_event_counts(spark: SparkSession, source_dir: str,
                           window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """readStream(parquet) → watermark → tumbling window counts.

    Late rows beyond the watermark are dropped; state is bounded by
    (watermark / window) per event_type — O(1) per key, which is what
    lets the agg run indefinitely on a live feed.
    """
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(source_dir))
    return (
        stream
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum("value").alias("value_sum"))
        .select(F.col("win.start").alias("window_start"),
                "event_type", "n_events", "value_sum")
    )


def streaming_event_anomalies(spark: SparkSession, source_dir: str,
                              stats, window: str = "1 hour",
                              watermark: str = "0 seconds"):
    """Live rate monitoring: the watermarked tumbling-window count
    stream scored against BATCH-TRAINED per-type σ-band stats
    (``queries.relational.anomaly_stats`` — the nb/dsir train-batch/
    score-stream pattern). The scoring join is stream-static +
    broadcast (stateless), so the only stateful operator is the
    window agg; append mode emits a (type, hour) cell once its window
    finalizes, flagged iff outside the trained band."""
    from ..queries.relational import anomaly_flag
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(source_dir))
    hourly = (stream
              .withWatermark("ts", watermark)
              .groupBy(F.window("ts", window).alias("win"), "event_type")
              .agg(F.count("*").alias("x"))
              .select("event_type", F.col("win.start").alias("hour"),
                      "x"))
    return anomaly_flag(hourly, stats)


def streaming_conversion_join(spark: SparkSession, source_dir: str,
                              watermark: str = "2 hours") -> DataFrame:
    """Watermarked STREAM-STREAM inner join — the missing §2.9 shape:
    two branches of the events feed (signups, purchases) joined on
    user_id with a time-interval condition. Both sides carry a
    watermark, and the interval bound lets Spark derive the state
    eviction horizon: a buffered signup row is dropped once the
    purchase-side watermark passes ``signup_ts + ATTR_WINDOW``, so
    state is O(events within watermark+window), not O(stream length).
    The join body is shared with the batch twin
    (``queries.temporal.conversion_join``) — parity is pinned by
    tests/test_streaming.py."""
    from ..queries.temporal import conversion_join
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(source_dir))
    s = (stream.filter(F.col("event_type") == "signup")
         .withWatermark("ts", watermark))
    p = (stream.filter(F.col("event_type") == "purchase")
         .withWatermark("ts", watermark))
    return conversion_join(s, p)


def streaming_conversion_funnel(spark: SparkSession, source_dir: str,
                                watermark: str = "2 hours") -> DataFrame:
    """LEFT-OUTER watermarked stream-stream join: every signup emits —
    matched pairs as they arrive, and an UNMATCHED signup emits its
    null row once the global watermark (the min across both branches)
    passes ``signup_ts + ATTR_WINDOW``, i.e. once no qualifying
    purchase can still arrive. Trailing caveat: signups younger than
    (max event time − watermark − window) at end-of-input hold state
    until later data advances the watermark — on a live feed that data
    always comes; the parity test supplies it as a sentinel batch."""
    from ..queries.temporal import conversion_join
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(source_dir))
    s = (stream.filter(F.col("event_type") == "signup")
         .withWatermark("ts", watermark))
    p = (stream.filter(F.col("event_type") == "purchase")
         .withWatermark("ts", watermark))
    return conversion_join(s, p, "leftOuter")


PAGES_STREAM_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                       "text string, lang string")


def streaming_dedup_exact(spark: SparkSession, source_dir: str,
                          watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of the `dedup_exact` batch query: drop pages
    whose text hash was already seen, with state BOUNDED by the
    watermark (`dropDuplicatesWithinWatermark` evicts hashes once the
    event-time horizon passes — on an endless crawl feed the seen-set
    cannot grow without bound, the property a plain dropDuplicates
    lacks). Only the 16-byte md5 enters state, never the text."""
    stream = (spark.readStream.schema(PAGES_STREAM_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(source_dir))
    return (stream
            .withWatermark("warc_ts", watermark)
            .withColumn("text_hash", F.md5("text"))
            .dropDuplicatesWithinWatermark(["text_hash"]))


def streaming_crawl_dedup(spark: SparkSession, source_dir: str,
                          watermark: str = "1 hour") -> DataFrame:
    """Streaming stage-1 of ``q_web_pipeline``: canonicalize each
    capture's URL in-flight (the webcur codegen algebra is pure
    projections, so it runs unchanged on a stream) and suppress
    recaptures whose (canonical_url, content) was already seen inside
    the watermark horizon. The content hash matches the batch
    ``curate_pages`` hash exactly: ``md5(coalesce(text, ''))`` — an
    html-only page hashes the empty string, not NULL (ADVICE r03).

    SEMANTIC DIFFERENCE from the batch rule, documented on purpose:
    ``dropDuplicatesWithinWatermark`` keeps a SEEN-SET per key inside
    the horizon, while the batch audit's ``unchanged_recrawl`` is
    LAG-based (drop only consecutive-unchanged captures). For
    reverting content A→B→A the batch keeps all three captures but
    this stream drops the third A while the first is still in state.
    When byte-parity with the batch audit matters, use the stateful
    twin ``streaming.stateful.streaming_crawl_dedup_lag``, which keys
    state on the PREVIOUS content hash per canonical url and
    reproduces the consecutive-unchanged rule exactly (A→B→A keeps
    all three; tests/test_streaming_stateful.py pins both behaviors).

    State: two 16-byte md5s per entry (url hash + content hash), never
    the URL or body text, evicted at the watermark — bounded on an
    endless crawl feed."""
    from ..queries.webcur import canonicalize_urls

    stream = (spark.readStream.schema(PAGES_STREAM_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(source_dir))
    return (canonicalize_urls(stream)
            .withWatermark("warc_ts", watermark)
            .withColumn("url_hash", F.md5("canonical_url"))
            .withColumn("content_hash",
                        F.md5(F.coalesce(F.col("text"), F.lit(""))))
            .dropDuplicatesWithinWatermark(["url_hash", "content_hash"]))


def streaming_extract(spark: SparkSession, source_dir: str,
                      checkpoint_dir: str, out_dir: str,
                      levels=("raw",),
                      on_batch: Optional[Callable[[DataFrame, int], None]]
                      = None):
    """Extraction as a stream: each micro-batch runs the SAME fused
    pipeline and lands as an idempotent parquet write (foreachBatch +
    checkpointLocation = exactly-once across restarts).

    Returns the StreamingQuery; caller awaits/stops it.
    """
    stream = (spark.readStream.schema(PAGES_STREAM_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(source_dir))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        extracted = extract_pages(batch_df, levels=levels).cache()
        try:
            (extracted.filter(F.col("failure_reason").isNull())
             .write.mode("overwrite")
             .parquet(f"{out_dir}/batch={batch_id}"))
            # Dead-letter path: failed rows stay queryable, mirroring
            # the batch loop's failures table (ADVICE r01) — both
            # writes are idempotent per-batch overwrites.
            (extracted.filter(F.col("failure_reason").isNotNull())
             .select("url", F.col("failure_reason").alias("reason"))
             .write.mode("overwrite")
             .parquet(f"{out_dir}/failures/batch={batch_id}"))
            if on_batch is not None:
                on_batch(extracted, batch_id)
        finally:
            extracted.unpersist()

    return (stream.writeStream
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def streaming_upsert_latest(spark: SparkSession, source_dir: str,
                            checkpoint_dir: str, out_dir: str):
    """MERGE/upsert sink semantics: maintain a LATEST-CAPTURE-PER-URL
    materialized table from the capture stream — each micro-batch
    merges its rows into the table, replacing any older capture of the
    same url (latest ``warc_ts`` wins; ties keep the lexically larger
    text for determinism). This is the sink class the append-only
    ``streaming_extract`` cannot express: re-captures UPDATE rows
    instead of accumulating.

    Exactly-once: latest-wins merge is IDEMPOTENT, so a replayed batch
    (restart re-runs the last uncommitted foreachBatch) converges to
    the same table; the two-generation directory swap keeps the read
    and write sides of the merge on different paths (overwriting the
    parquet dir being read is undefined).

    Scale note: this demo rewrites the whole table per batch — the
    local-parquet stand-in for what a table format does with file
    pruning (Iceberg MERGE INTO rewrites only matched files). The
    MERGE itself is one keyed aggregate: max_by(struct(capture),
    (warc_ts, text)) per url, map-side combinable."""
    stream = (spark.readStream.schema(PAGES_STREAM_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(source_dir))

    def _gen_paths(batch_id: int):
        return (f"{out_dir}/gen={batch_id % 2}",
                f"{out_dir}/gen={(batch_id + 1) % 2}")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        write_gen, read_gen = _gen_paths(batch_id)
        # Explicit existence probe, NOT a bare except: a transient IO
        # error or corrupt footer while reading the previous generation
        # must fail the batch (checkpoint retries it) rather than be
        # mistaken for "first batch" and silently rewrite the table
        # from this micro-batch alone (ADVICE r04).
        if os.path.isdir(read_gen) and any(
                f.endswith(".parquet") for f in os.listdir(read_gen)):
            cur = batch_df.sparkSession.read.parquet(read_gen)
            merged = cur.unionByName(batch_df)
        else:
            merged = batch_df  # first batch: no table yet
        latest = (merged
                  .groupBy("url")
                  .agg(F.max_by(
                      F.struct("warc_ts", "html", "text", "lang"),
                      F.struct("warc_ts", "text")).alias("r"))
                  .select("url", "r.warc_ts", "r.html", "r.text",
                          "r.lang"))
        latest.write.mode("overwrite").parquet(write_gen)

    return (stream.writeStream
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def read_upsert_table(spark: SparkSession, out_dir: str,
                      last_batch_id: int) -> DataFrame:
    """Read the live generation written by batch ``last_batch_id``."""
    return spark.read.parquet(f"{out_dir}/gen={last_batch_id % 2}")
