"""Temporal join operators Spark has no native node for — as-of join,
bounded range join, and the two-phase salted aggregation pattern.

The reference is document-at-a-time and has none of these (SURVEY.md
§2.3 notes no equi/as-of/interval joins exist there); they are part of
the engine's training-data-pipeline surface, where event-shaped inputs
(crawl logs, interaction streams) need time alignment at 100 TB.

Scale notes:
- the as-of join is a running `max_by`-style window — one shuffle on
  the partition key, zero joins, which is why it survives any scale;
- the range join buckets time into coarse grains and equi-joins on
  (bucket, bucket±1) before the exact band filter — the standard way
  to keep an interval join shuffle-partitionable instead of quadratic;
- the salted agg demonstrates the two-phase (salt → partial → final)
  shape that defeats a hot grouping key.

All time math in integer microseconds (epoch_us / unix_micros) — no
float, no truncation ambiguity between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

RANGE_SECONDS = 60
SALT_BUCKETS = 8


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _us(col_name: str):
    """NTZ-safe epoch microseconds: timestampdiff from an NTZ epoch is
    timezone-independent (a cast to TIMESTAMP would shift by the
    session offset and break oracle parity in non-UTC sessions)."""
    return F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"{col_name})")


def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: for every 'purchase', the most recent prior 'view'
    by the same user. Implemented as a running conditional max over an
    ordered window (no join at all) — the canonical Spark rewrite of
    ASOF JOIN. Ties on ts break by event_id (deterministic)."""
    ev = _events(spark, sf_dir).withColumn("ts_us", _us("ts"))
    w = (Window.partitionBy("user_id").orderBy("ts_us", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    last_view = F.max(
        F.when(F.col("event_type") == "view", F.col("ts_us"))).over(w)
    return (
        ev.withColumn("prior_view_us", last_view)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id", "event_id",
            F.col("ts_us").alias("purchase_us"),
            "prior_view_us",
            F.when(F.col("prior_view_us").isNotNull(),
                   F.col("ts_us") - F.col("prior_view_us"))
             .alias("gap_us"))
        .orderBy("user_id", "event_id")
    )


ORACLE_ASOF = """
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
), flagged AS (
  SELECT user_id, event_id, event_type, ts_us,
         MAX(CASE WHEN event_type = 'view' THEN ts_us END) OVER (
           PARTITION BY user_id ORDER BY ts_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS prior_view_us
  FROM ev
)
SELECT user_id, event_id, ts_us AS purchase_us, prior_view_us,
       CASE WHEN prior_view_us IS NOT NULL
            THEN ts_us - prior_view_us END AS gap_us
FROM flagged WHERE event_type = 'purchase'
ORDER BY user_id, event_id
"""


def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded RANGE join: pairs of same-user events within 60s.
    Scale path: equi-join on (user_id, minute bucket) with the
    neighbor bucket unioned in, exact band filter afterwards — the
    shuffle is keyed, never all-pairs. Output: per-user pair counts."""
    ev = (_events(spark, sf_dir)
          .select("user_id", "event_id", _us("ts").alias("ts_us")))
    bucket_us = RANGE_SECONDS * 1_000_000
    a = ev.select("user_id", F.col("event_id").alias("id_a"),
                  F.col("ts_us").alias("ts_a"),
                  F.floor(F.col("ts_us") / bucket_us).alias("b"))
    # each left row probes its own bucket and the next one; pairs are
    # ordered (id_a < id_b is NOT implied by time, so order by ts,id)
    probes = a.select("user_id", "id_a", "ts_a", "b").union(
        a.select("user_id", "id_a", "ts_a",
                 (F.col("b") + 1).alias("b")))
    bsel = ev.select("user_id", F.col("event_id").alias("id_b"),
                     F.col("ts_us").alias("ts_b"),
                     F.floor(F.col("ts_us") / bucket_us).alias("b"))
    pairs = (
        probes.join(bsel, ["user_id", "b"])
        .filter((F.col("ts_b") > F.col("ts_a"))
                | ((F.col("ts_b") == F.col("ts_a"))
                   & (F.col("id_b") > F.col("id_a"))))
        .filter(F.col("ts_b") - F.col("ts_a") <= bucket_us)
        .select("user_id", "id_a", "id_b").distinct())
    return (
        pairs.groupBy("user_id")
        .agg(F.count("*").alias("n_close_pairs"))
        .orderBy("user_id")
    )


ORACLE_RANGE = f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
)
SELECT a.user_id, COUNT(*) AS n_close_pairs
FROM ev a JOIN ev b
  ON a.user_id = b.user_id
 AND (b.ts_us > a.ts_us OR (b.ts_us = a.ts_us AND b.event_id > a.event_id))
 AND b.ts_us - a.ts_us <= {RANGE_SECONDS * 1_000_000}
GROUP BY a.user_id ORDER BY a.user_id
"""


def q_salted_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation: counts per event_type where the
    grouping key is low-cardinality/hot (5 types over the whole
    table). Phase 1 groups on (salt, key) — spreads each hot key over
    SALT_BUCKETS reducers; phase 2 re-aggregates per key. Result is
    identical to a plain GROUP BY (the oracle), the shuffle profile is
    not."""
    ev = _events(spark, sf_dir)
    salted = ev.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT_BUCKETS)))
    partial = (salted.groupBy("event_type", "salt")
               .agg(F.count("*").alias("c"),
                    F.sum(F.col("value").cast("decimal(18,6)")).alias("v")))
    return (
        partial.groupBy("event_type")
        .agg(F.sum("c").alias("n_events"),
             F.round(F.sum("v"), 4).cast("double").alias("value_sum"))
        .orderBy("event_type")
    )


ORACLE_SALTED = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS value_sum
FROM events GROUP BY event_type ORDER BY event_type
"""


ATTR_WINDOW = "1 hour"


def conversion_join(signups: DataFrame, purchases: DataFrame,
                    how: str = "inner") -> DataFrame:
    """Stream-legal attribution body: every (signup, purchase) pair for
    the same user with the purchase inside ``(signup_ts, signup_ts +
    1h]``. The join condition is expressed on the TIMESTAMP columns
    (equi-key + time interval) — exactly the shape Structured Streaming
    requires to bound stream-stream join state: with a watermark on
    both inputs, signup state older than watermark+1h is evicted, so
    the same body runs unmodified as a watermarked two-stream join
    (tests/test_streaming.py pins batch parity).

    Batch scale shape: ONE keyed shuffle on user_id; the interval
    predicate filters pairs inside each user's partition. Per-user pair
    volume is bounded by activity density within the hour — for
    unbounded-rate keys the bucketed form (q_events_range_join) is the
    fallback. Lag reported in integer microseconds (the repo's
    no-float time rule)."""
    s = signups.select("user_id",
                       F.col("event_id").alias("signup_id"),
                       F.col("ts").alias("signup_ts"))
    p = purchases.select(F.col("user_id").alias("p_user"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("purchase_ts"))
    return (s.join(p, (F.col("user_id") == F.col("p_user"))
                   & (F.col("purchase_ts") > F.col("signup_ts"))
                   & (F.col("purchase_ts") <= F.col("signup_ts")
                      + F.expr(f"INTERVAL {ATTR_WINDOW}")), how)
            .select("user_id", "signup_id", "purchase_id",
                    F.expr("timestampdiff(MICROSECOND, signup_ts,"
                           " purchase_ts)").alias("lag_us")))


def q_conversion_attribution(spark: SparkSession, sf_dir: str,
                             events: DataFrame = None) -> DataFrame:
    """Conversion attribution over the events table: signups joined to
    same-user purchases within the attribution window — the canonical
    stream-stream-join workload, run here in batch (the DuckDB-checked
    twin of ``streaming_conversion_join``).

    Deployed shape: pass ``events`` as a table BUCKETED on user_id —
    the join then runs with ZERO Exchange (both branches inherit the
    bucket layout; plan + row-identity pinned in test_bucketing.py).
    Measured at 100M events (BENCH/BASELINE.md): the shuffled form is
    disk-bandwidth-bound on one box (eff 0.63 at 4→16); the bucketed
    form is exchange-free, faster at both levels, eff 0.84 — and on a
    real cluster bucketing removes the network shuffle entirely, which
    is the point at 10^12 events."""
    ev = events if events is not None else _events(spark, sf_dir)
    out = conversion_join(ev.filter(F.col("event_type") == "signup"),
                          ev.filter(F.col("event_type") == "purchase"))
    return out.orderBy("user_id", "signup_id", "purchase_id")


def q_conversion_funnel(spark: SparkSession, sf_dir: str,
                        events: DataFrame = None) -> DataFrame:
    """Conversion funnel: EVERY signup with its purchase count and
    fastest lag inside the attribution window — including the
    unattributed ones (the left-outer shape). Streaming twin:
    ``streaming_conversion_funnel`` emits the same pair rows from a
    watermarked left-outer stream-stream join, where an unmatched
    signup's null row flushes once the global watermark passes
    ``signup_ts + window`` (parity pinned in tests/test_streaming.py).

    Batch scale shape: the same single user_id-keyed shuffle as the
    inner join; the per-signup rollup partial-combines (pair volume
    per signup is window-bounded). Pass a user_id-BUCKETED ``events``
    table for the exchange-free deployed shape (see
    q_conversion_attribution)."""
    ev = events if events is not None else _events(spark, sf_dir)
    pairs = conversion_join(
        ev.filter(F.col("event_type") == "signup"),
        ev.filter(F.col("event_type") == "purchase"), "left")
    return (pairs.groupBy("user_id", "signup_id")
            .agg(F.count("purchase_id").alias("n_purchases"),
                 F.min("lag_us").alias("min_lag_us"))
            .withColumn("attributed", F.col("n_purchases") > 0)
            .orderBy("user_id", "signup_id"))


ORACLE_FUNNEL = f"""
SELECT s.user_id, s.event_id AS signup_id,
       CAST(COUNT(p.event_id) AS BIGINT) AS n_purchases,
       MIN(epoch_us(p.ts) - epoch_us(s.ts)) AS min_lag_us,
       COUNT(p.event_id) > 0 AS attributed
FROM events s LEFT JOIN events p
  ON p.user_id = s.user_id AND p.event_type = 'purchase'
 AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL {ATTR_WINDOW}
WHERE s.event_type = 'signup'
GROUP BY s.user_id, s.event_id
ORDER BY s.user_id, signup_id
"""


ORACLE_ATTRIBUTION = f"""
SELECT s.user_id, s.event_id AS signup_id, p.event_id AS purchase_id,
       epoch_us(p.ts) - epoch_us(s.ts) AS lag_us
FROM events s JOIN events p
  ON p.user_id = s.user_id
 AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL {ATTR_WINDOW}
WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
ORDER BY s.user_id, signup_id, purchase_id
"""


QUERIES = {
    "conversion_funnel": (q_conversion_funnel, ORACLE_FUNNEL),
    "conversion_attribution": (q_conversion_attribution,
                               ORACLE_ATTRIBUTION),
    "events_asof_join": (q_events_asof_join, ORACLE_ASOF),
    "events_range_join": (q_events_range_join, ORACLE_RANGE),
    "salted_type_counts": (q_salted_type_counts, ORACLE_SALTED),
}
