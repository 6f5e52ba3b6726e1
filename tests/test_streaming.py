"""Structured Streaming surface: windowed counts equal the batch twin;
streaming extraction is exactly-once across a restart."""

import os

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.pipeline.extract import extract_pages
from pdf_extractor_spark.sources.pages import synth_pages_df
from pdf_extractor_spark.streaming.windows import (streaming_event_counts,
                                                   streaming_extract)

SF_DIR = "/root/testdata/sf0.001"


def _await(query, timeout=120):
    assert query.awaitTermination(timeout), "stream did not finish"


def test_streaming_window_counts_match_batch(spark, tmp_path):
    src = str(tmp_path / "events_src")
    # split the batch table into 3 files → 3 micro-batches
    spark.read.parquet(f"{SF_DIR}/events.parquet") \
        .repartition(3).write.parquet(src)

    sink = f"stream_counts_{os.getpid()}"
    q = (streaming_event_counts(spark, src)
         .writeStream.format("memory").queryName(sink)
         .outputMode("complete")
         .trigger(availableNow=True).start())
    _await(q)
    got = {(r.window_start, r.event_type): r.n_events
           for r in spark.sql(f"SELECT * FROM {sink}").collect()}

    batch = (spark.read.parquet(f"{SF_DIR}/events.parquet")
             .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
             .agg(F.count("*").alias("n")))
    want = {(r["win"].start, r["event_type"]): r["n"]
            for r in batch.collect()}
    assert got == want


def test_streaming_conversion_join_matches_batch(spark, tmp_path):
    """Stream-stream inner join (watermarked, time-interval bound):
    with availableNow over a finite source the join must emit exactly
    the batch twin's pairs — same body, two watermarked branches."""
    from pdf_extractor_spark.queries.temporal import conversion_join
    from pdf_extractor_spark.streaming.windows import \
        streaming_conversion_join
    src = str(tmp_path / "events_src")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev.repartition(3).write.parquet(src)

    # watermark wider than the table's time span: the random 3-file
    # split is NOT time-ordered, so a short watermark would race ahead
    # after batch 0 and drop later files' rows as late (lateness
    # semantics are pinned in test_streaming_latedata.py; this test
    # pins JOIN parity, including cross-micro-batch buffered matches)
    sink = f"stream_attr_{os.getpid()}"
    q = (streaming_conversion_join(spark, src, watermark="3650 days")
         .writeStream.format("memory").queryName(sink)
         .outputMode("append")
         .trigger(availableNow=True).start())
    _await(q)
    got = {(r.user_id, r.signup_id, r.purchase_id, r.lag_us)
           for r in spark.sql(f"SELECT * FROM {sink}").collect()}

    src_ev = spark.read.parquet(src)
    want = {(r.user_id, r.signup_id, r.purchase_id, r.lag_us)
            for r in conversion_join(
                src_ev.filter(F.col("event_type") == "signup"),
                src_ev.filter(F.col("event_type") == "purchase"))
            .collect()}
    assert len(want) > 0
    assert got == want


def test_streaming_funnel_outer_join_flushes_nulls(spark, tmp_path):
    """Left-outer stream-stream join: matched pairs emit eagerly;
    an UNMATCHED signup's null row emits once the watermark passes
    signup_ts + window. A far-future sentinel batch plays the 'later
    data' that advances both branch watermarks, so every earlier
    signup flushes; the sentinel's own rows stay in state (documented
    trailing caveat) and are excluded from the expectation."""
    import datetime as dt
    from tests.test_streaming_latedata import _write_flat
    from pdf_extractor_spark.streaming.windows import \
        streaming_conversion_funnel

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    src = str(tmp_path / "src")
    staging = str(tmp_path / "staging")

    def ev(eid, ts, uid, etype):
        return dict(event_id=eid, ts=ts, user_id=uid, event_type=etype,
                    value=1.0, props="{}")

    import time as _time
    # batch 1: u1 signup+purchase (30min lag, matches), u2 signup
    # (never purchases), u3 purchase (no signup — must NOT emit)
    _write_flat(spark, [
        ev(1, base, 1, "signup"),
        ev(2, base + dt.timedelta(minutes=30), 1, "purchase"),
        ev(3, base, 2, "signup"),
        ev(4, base + dt.timedelta(minutes=10), 3, "purchase"),
    ], staging, src, "b1.parquet")
    _time.sleep(1.1)
    # batch 2: u1 second purchase at +45min (also inside the window),
    # u2 purchase at +2h — OUTSIDE the 1h window (u2 stays null)
    _write_flat(spark, [
        ev(5, base + dt.timedelta(minutes=45), 1, "purchase"),
        ev(6, base + dt.timedelta(hours=2), 2, "purchase"),
    ], staging, src, "b2.parquet")
    _time.sleep(1.1)
    # batch 3: sentinel signup+purchase 30 days out, unused users —
    # advances BOTH branch watermarks past every earlier signup's
    # flush horizon (signup_ts + 1h + 2h watermark)
    far = base + dt.timedelta(days=30)
    _write_flat(spark, [
        ev(98, far, 98, "signup"),
        ev(99, far, 99, "purchase"),
    ], staging, src, "b3.parquet")

    sink = f"stream_funnel_{os.getpid()}"
    q = (streaming_conversion_funnel(spark, src)
         .writeStream.format("memory").queryName(sink)
         .outputMode("append")
         .trigger(availableNow=True).start())
    _await(q)
    got = {(r.user_id, r.signup_id, r.purchase_id, r.lag_us)
           for r in spark.sql(f"SELECT * FROM {sink}").collect()}
    want = {
        (1, 1, 2, 30 * 60 * 1_000_000),   # matched, 30min lag
        (1, 1, 5, 45 * 60 * 1_000_000),   # second purchase in window
        (2, 3, None, None),               # unmatched signup → null row
    }
    assert got == want


def test_streaming_extract_exactly_once(spark, tmp_path):
    src = str(tmp_path / "pages_src")
    synth_pages_df(spark, n=60).repartition(3).write.parquet(src)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    seen = []
    q = streaming_extract(spark, src, ckpt, out,
                          on_batch=lambda df, bid: seen.append(bid))
    _await(q)
    n_batches_first = len(seen)
    assert n_batches_first >= 2  # maxFilesPerTrigger=1 over 3 files

    first = spark.read.parquet(f"{out}/batch=*")
    urls_first = sorted(r.url for r in first.select("url").collect())
    assert len(urls_first) == 60
    assert len(set(urls_first)) == 60

    # restart with the same checkpoint: no new batches, no duplicates
    q2 = streaming_extract(spark, src, ckpt, out,
                           on_batch=lambda df, bid: seen.append(bid))
    _await(q2)
    assert len(seen) == n_batches_first
    again = spark.read.parquet(f"{out}/batch=*")
    assert again.count() == 60

    # output text matches the batch pipeline byte-for-byte
    batch_out = {r.url: r.text for r in
                 extract_pages(spark.read.parquet(src)).collect()}
    stream_out = {r.url: r.text for r in again.collect()}
    assert stream_out == batch_out


def test_streaming_failures_go_to_dead_letter(spark, tmp_path):
    """ADVICE r01: streaming failures must be persisted (dead-letter
    parquet under out/failures), not silently dropped."""
    src = str(tmp_path / "pages_src")
    rows = [("https://x.example/ok.html", None,
             b"<html><body><p>A perfectly fine paragraph right here."
             b"</p></body></html>", None, "en"),
            ("https://x.example/bad.pdf", None, b"%PDF-1.4 garbage",
             None, "en")]
    spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, "
              "lang string").coalesce(1).write.parquet(src)
    q = streaming_extract(spark, src, str(tmp_path / "ckpt"),
                          str(tmp_path / "out"))
    _await(q)
    ok = spark.read.parquet(str(tmp_path / "out" / "batch=*"))
    assert [r.url for r in ok.collect()] == ["https://x.example/ok.html"]
    dead = spark.read.parquet(str(tmp_path / "out" / "failures"))
    drows = dead.collect()
    assert len(drows) == 1
    assert drows[0].url == "https://x.example/bad.pdf"
    assert "PdfParseError" in drows[0].reason


def test_streaming_gopher_filter_matches_batch(spark, tmp_path):
    """The curation quality filter is a stateless zero-shuffle
    projection, so the SAME body (curation.gopher_filter) runs on a
    streaming DataFrame with no state store and no watermark — per-doc
    verdicts must equal the batch twin's."""
    from pdf_extractor_spark.queries.curation import gopher_filter

    src = str(tmp_path / "docs_src")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.repartition(3).write.parquet(src)

    sink = f"stream_gopher_{os.getpid()}"
    stream_docs = spark.readStream.schema(docs.schema).parquet(src)
    q = (gopher_filter(stream_docs)
         .writeStream.format("memory").queryName(sink)
         .outputMode("append")
         .trigger(availableNow=True).start())
    _await(q)
    got = {r.doc_id: (r.n_words, r.wlen_bp, r.dup_bp, r.top_bp, r.verdict)
           for r in spark.sql(f"SELECT * FROM {sink}").collect()}
    want = {r.doc_id: (r.n_words, r.wlen_bp, r.dup_bp, r.top_bp, r.verdict)
            for r in gopher_filter(docs).collect()}
    assert got == want


def test_gopher_filter_empty_text_no_ansi_divide_error(spark):
    """ADVICE r03 (low): a whitespace-only doc has n_words=0; the
    wlen_bp division must be NULL-guarded or ANSI mode (Spark 4
    default) throws DIVIDE_BY_ZERO. The verdict short-circuits on
    too_few_words either way."""
    from pdf_extractor_spark.queries.curation import gopher_filter

    docs = spark.createDataFrame(
        [(1, ""), (2, "      "), (3, "one two three")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in gopher_filter(docs).collect()}
    assert rows[1].verdict == "too_few_words"
    assert rows[2].verdict == "too_few_words"
    assert rows[1].wlen_bp is None and rows[2].wlen_bp is None
    assert rows[3].n_words == 3 and rows[3].wlen_bp is not None


def test_streaming_nb_score_matches_batch(spark, tmp_path):
    """nb_score is a stateless broadcast-map fold, so the SAME body
    scores a streaming DataFrame with no state store — per-doc scores
    must equal the batch twin's under the same trained weights."""
    from pdf_extractor_spark.queries.curation import nb_score, nb_train

    src = str(tmp_path / "docs_src")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.repartition(3).write.parquet(src)
    weights = nb_train(docs).localCheckpoint()

    sink = f"stream_nb_{os.getpid()}"
    stream_docs = spark.readStream.schema(docs.schema).parquet(src)
    # drop the presentation sort: orderBy is not stream-legal; the
    # scoring body itself is the streaming surface
    body = nb_score(stream_docs, weights)
    q = (body.writeStream.format("memory").queryName(sink)
         .outputMode("append").trigger(availableNow=True).start())
    _await(q)
    got = {r.doc_id: (r.n_tokens, r.score_u, r.predicted_good)
           for r in spark.sql(f"SELECT * FROM {sink}").collect()}
    want = {r.doc_id: (r.n_tokens, r.score_u, r.predicted_good)
            for r in nb_score(docs, weights).collect()}
    assert got == want


def test_streaming_dsir_score_matches_batch(spark, tmp_path):
    """dsir_score is the same stateless broadcast-map fold as nb_score
    — the constant-size (<=512-entry) bucket map makes it the safer
    streaming scorer (state cannot grow with vocabulary)."""
    from pdf_extractor_spark.queries.curation import (dsir_score,
                                                      dsir_train)

    src = str(tmp_path / "docs_src")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.repartition(3).write.parquet(src)
    llr = dsir_train(docs).localCheckpoint()
    assert llr.count() <= 512  # the constant-size guarantee

    sink = f"stream_dsir_{os.getpid()}"
    stream_docs = spark.readStream.schema(docs.schema).parquet(src)
    q = (dsir_score(stream_docs, llr)
         .writeStream.format("memory").queryName(sink)
         .outputMode("append").trigger(availableNow=True).start())
    _await(q)
    got = {r.doc_id: (r.n_tokens, r.dsir_u)
           for r in spark.sql(f"SELECT * FROM {sink}").collect()}
    want = {r.doc_id: (r.n_tokens, r.dsir_u)
            for r in dsir_score(docs, llr).collect()}
    assert got == want


def test_streaming_upsert_latest_wins(spark, tmp_path):
    """MERGE/upsert sink: recaptures UPDATE the per-url table (latest
    warc_ts wins), a LATE OLDER capture cannot regress a newer row,
    and a checkpoint restart leaves the table unchanged (idempotent
    latest-wins merge)."""
    import datetime as dt
    import glob
    import shutil
    import time as _time

    import pandas as pd

    from pdf_extractor_spark.streaming.windows import (
        read_upsert_table, streaming_upsert_latest)

    src = str(tmp_path / "src")
    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "tbl")

    def write_pages(rows, name):
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["url", "warc_ts", "html",
                                        "text", "lang"]),
            schema=("url string, warc_ts timestamp, html binary, "
                    "text string, lang string"))
        stage = os.path.join(staging, name)
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        os.makedirs(src, exist_ok=True)
        shutil.copy(part, os.path.join(src, name))

    t = lambda h: dt.datetime(2025, 6, 1, h)
    write_pages([("https://a.example/x", t(1), None, "v1", "en"),
                 ("https://b.example/y", t(1), None, "b1", "en")],
                "b1.parquet")
    _time.sleep(1.1)
    write_pages([("https://a.example/x", t(2), None, "v2", "en"),
                 ("https://c.example/z", t(1), None, "c1", "en")],
                "b2.parquet")
    _time.sleep(1.1)
    # late OLDER capture of b.example/y — must not replace t(1)'s row
    write_pages([("https://b.example/y", t(0), None, "old", "en")],
                "b3.parquet")

    q = streaming_upsert_latest(spark, src, ckpt, out)
    _await(q)
    live = read_upsert_table(spark, out, last_batch_id=2)
    got = {r.url: (r.warc_ts, r.text) for r in live.collect()}
    assert got == {"https://a.example/x": (t(2), "v2"),
                   "https://b.example/y": (t(1), "b1"),
                   "https://c.example/z": (t(1), "c1")}

    # restart on the same checkpoint: no new batches, table unchanged
    q2 = streaming_upsert_latest(spark, src, ckpt, out)
    _await(q2)
    again = {r.url: (r.warc_ts, r.text)
             for r in read_upsert_table(spark, out, 2).collect()}
    assert again == got


def test_streaming_anomalies_match_batch(spark, tmp_path):
    """Rate-monitor trilogy closer: the watermarked window-count
    stream scored against batch-trained sigma-band stats equals the
    batch flags for every FINALIZED window (a far-future sentinel
    advances the watermark past all real windows; its own window stays
    in state and is excluded from the expectation)."""
    import datetime as dt

    from pdf_extractor_spark.queries.relational import (anomaly_flag,
                                                        anomaly_stats)
    from pdf_extractor_spark.streaming.windows import \
        streaming_event_anomalies

    import glob
    import shutil
    import time as _time

    src = str(tmp_path / "events_src")
    staging = str(tmp_path / "staging")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    far = dt.datetime(2030, 1, 1)
    sentinel = spark.createDataFrame(
        [(999999, far, 0, "error", 0.0, "{}")], ev.schema)

    # TIME-ORDERED batches (mtime-ordered single files): with a 0s
    # watermark delay a random split would drop later files' rows as
    # late; ordered chunks advance the watermark monotonically with
    # no drops, and the sentinel finalizes every real window
    rows = ev.orderBy("ts").collect()
    chunks = [rows[:400], rows[400:700], rows[700:]]
    for i, chunk in enumerate(chunks):
        df = spark.createDataFrame(chunk, ev.schema)
        stage = f"{staging}/c{i}"
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        os.makedirs(src, exist_ok=True)
        shutil.copy(glob.glob(f"{stage}/part-*.parquet")[0],
                    f"{src}/c{i}.parquet")
        _time.sleep(1.1)
    stage = f"{staging}/sent"
    sentinel.coalesce(1).write.mode("overwrite").parquet(stage)
    shutil.copy(glob.glob(f"{stage}/part-*.parquet")[0],
                f"{src}/sent.parquet")

    hourly = (spark.read.parquet(src)
              .groupBy(F.window("ts", "1 hour").alias("win"),
                       "event_type")
              .agg(F.count("*").alias("x"))
              .select("event_type", F.col("win.start").alias("hour"),
                      "x"))
    stats = anomaly_stats(hourly).localCheckpoint()

    sink = f"stream_anom_{os.getpid()}"
    q = (streaming_event_anomalies(spark, src, stats)
         .writeStream.format("memory").queryName(sink)
         .outputMode("append")
         .trigger(availableNow=True).start())
    _await(q)
    got = {(r.event_type, r.hour, r.n_events, r.anomaly)
           for r in spark.sql(f"SELECT * FROM {sink}").collect()}

    want = {(r.event_type, r.hour, r.n_events, r.anomaly)
            for r in anomaly_flag(hourly, stats).collect()
            if r.hour < far}   # sentinel's own window never finalizes
    assert len(want) > 0
    assert got == want


def test_streaming_badwords_matches_batch(spark, tmp_path):
    """The blocklist filter is a stateless zero-shuffle projection
    (the list rides inside the expression), so the SAME body
    (training.badwords_verdicts) runs on a streaming DataFrame with
    no state store — per-doc verdicts must equal the batch twin's."""
    from pdf_extractor_spark.queries.training import badwords_verdicts

    src = str(tmp_path / "docs_src")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.repartition(3).write.parquet(src)

    sink = f"stream_badwords_{os.getpid()}"
    stream_docs = spark.readStream.schema(docs.schema).parquet(src)
    q = (badwords_verdicts(stream_docs)
         .writeStream.format("memory").queryName(sink)
         .outputMode("append")
         .trigger(availableNow=True).start())
    _await(q)
    got = {r.doc_id: (r.n_words, r.n_bad, r.bad_bp, r.verdict)
           for r in spark.sql(f"SELECT * FROM {sink}").collect()}
    want = {r.doc_id: (r.n_words, r.n_bad, r.bad_bp, r.verdict)
            for r in badwords_verdicts(docs).collect()}
    assert got == want


def test_streaming_chunk_fanout_matches_batch(spark, tmp_path):
    """The training-window fan-out is stateless (explode + doc-local
    slices), so the SAME body (training.chunk_fanout) runs on a
    streaming DataFrame with no state store — the window set must
    equal the batch twin's."""
    from pdf_extractor_spark.queries.training import chunk_fanout

    src = str(tmp_path / "docs_src")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.repartition(3).write.parquet(src)

    sink = f"stream_chunks_{os.getpid()}"
    stream_docs = spark.readStream.schema(docs.schema).parquet(src)
    q = (chunk_fanout(stream_docs)
         .writeStream.format("memory").queryName(sink)
         .outputMode("append")
         .trigger(availableNow=True).start())
    _await(q)
    got = {(r.doc_id, r.win_id): (r.win_tokens, r.win_hash)
           for r in spark.sql(f"SELECT * FROM {sink}").collect()}
    want = {(r.doc_id, r.win_id): (r.win_tokens, r.win_hash)
            for r in chunk_fanout(docs).collect()}
    assert len(want) > 0 and got == want


def test_streaming_funnel_flushes_on_live_clock(spark, tmp_path):
    """VERDICT r04 #8: the outer-join flush proven under a
    PROCESSING-TIME trigger with an idle-source tail — not at
    availableNow batch boundaries. After the sentinel batch advances
    the event-time watermark, the source goes idle; the unmatched
    signup's null row must still emit on the live clock (Spark runs a
    no-data micro-batch to evict/emit state once the watermark moved),
    with NO further input files arriving."""
    import datetime as dt
    import time as _time

    from pdf_extractor_spark.streaming.windows import \
        streaming_conversion_funnel
    from tests.test_streaming_latedata import _write_flat

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    src = str(tmp_path / "src")
    staging = str(tmp_path / "staging")

    def ev(eid, ts, uid, etype):
        return dict(event_id=eid, ts=ts, user_id=uid, event_type=etype,
                    value=1.0, props="{}")

    # batch 1: one matched pair (u1) + one never-matched signup (u2)
    _write_flat(spark, [
        ev(1, base, 1, "signup"),
        ev(2, base + dt.timedelta(minutes=30), 1, "purchase"),
        ev(3, base, 2, "signup"),
    ], staging, src, "b1.parquet")
    _time.sleep(1.1)
    # batch 2 (sentinel): far-future rows on BOTH branches advance the
    # global watermark past u2's flush horizon; after this the source
    # is IDLE — the flush below happens on wall-clock triggers alone.
    far = base + dt.timedelta(days=30)
    _write_flat(spark, [
        ev(98, far, 98, "signup"),
        ev(99, far, 99, "purchase"),
    ], staging, src, "b2.parquet")

    sink = f"stream_funnel_live_{os.getpid()}"
    q = (streaming_conversion_funnel(spark, src)
         .writeStream.format("memory").queryName(sink)
         .outputMode("append")
         .trigger(processingTime="500 milliseconds").start())
    try:
        deadline = _time.time() + 120
        got = set()
        while _time.time() < deadline:
            got = {(r.user_id, r.signup_id, r.purchase_id, r.lag_us)
                   for r in spark.sql(f"SELECT * FROM {sink}").collect()}
            if (2, 3, None, None) in got:
                break
            _time.sleep(0.5)
    finally:
        q.stop()
    assert (1, 1, 2, 30 * 60 * 1_000_000) in got   # matched pair
    assert (2, 3, None, None) in got               # live-clock flush
    # no phantom matches for the sentinel users
    assert not any(u in (98, 99) and p is not None
                   for (u, s, p, l) in got)
