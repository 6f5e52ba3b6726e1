"""Watermark semantics: a row arriving after its window's state was
finalized (event time older than the watermark) is dropped — the
bounded-state guarantee that lets the windowed agg run forever."""

import datetime as dt
import glob
import os
import shutil
import time

import pandas as pd


def _write_flat(spark, rows, staging, src, name):
    """Write one parquet FILE at src/name (the file stream source lists
    top-level files only, ordered by modification time)."""
    df = spark.createDataFrame(
        pd.DataFrame(rows),
        schema=("event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string"))
    stage_dir = os.path.join(staging, name)
    df.coalesce(1).write.mode("overwrite").parquet(stage_dir)
    part = glob.glob(os.path.join(stage_dir, "part-*.parquet"))[0]
    os.makedirs(src, exist_ok=True)
    shutil.copy(part, os.path.join(src, name))


def test_late_row_beyond_watermark_dropped(spark, tmp_path):
    from pdf_extractor_spark.streaming.windows import streaming_event_counts

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    src = str(tmp_path / "src")
    staging = str(tmp_path / "staging")
    # batch 1: two rows in the 12:00 window + one at 18:00
    # → watermark after batch 1 = 18:00 - 1h = 17:00
    _write_flat(spark, [
        dict(event_id=1, ts=base, user_id=1,
             event_type="click", value=1.0, props="{}"),
        dict(event_id=2, ts=base + dt.timedelta(minutes=10), user_id=1,
             event_type="click", value=1.0, props="{}"),
        dict(event_id=3, ts=base + dt.timedelta(hours=6), user_id=1,
             event_type="click", value=1.0, props="{}"),
    ], staging, src, "b1.parquet")
    time.sleep(1.1)  # distinct mtime → deterministic batch order
    # batch 2: a fresh row only — its processing evicts + emits the
    # finalized 12:00 window (watermark 17:00 > window end 13:00)
    _write_flat(spark, [
        dict(event_id=5, ts=base + dt.timedelta(hours=6, minutes=30),
             user_id=1, event_type="click", value=1.0, props="{}"),
    ], staging, src, "b2.parquet")
    time.sleep(1.1)
    # batch 3: a LATE row back in the 12:00 window — its state is gone
    # and the row is older than the watermark → dropped for real.
    # (Within-batch late rows are only best-effort dropped by Spark;
    # the guarantee applies once the state was finalized, which is
    # exactly what this ordering exercises.)
    _write_flat(spark, [
        dict(event_id=4, ts=base + dt.timedelta(minutes=5), user_id=1,
             event_type="click", value=1.0, props="{}"),
    ], staging, src, "b3.parquet")

    sink = f"late_sink_{os.getpid()}"
    q = (streaming_event_counts(spark, src, window="1 hour",
                                watermark="1 hour")
         .writeStream.format("memory").queryName(sink)
         .outputMode("append")        # append: finalized windows only
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    batches = [(p["batchId"], p["numInputRows"]) for p in q.recentProgress]
    assert sum(n for _b, n in batches) == 5, batches  # all rows ingested

    got = {r.window_start: r.n_events
           for r in spark.sql(f"SELECT * FROM {sink}").collect()}
    # the 12:00 window finalized with exactly 2 rows; the late
    # event_id=4 (same window, arrived after the watermark passed its
    # end) must NOT be counted anywhere
    assert got.get(base) == 2, (got, batches)
    assert sum(got.values()) == 2, (got, batches)
