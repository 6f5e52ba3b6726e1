"""Scaling evidence for the round-4b selection/retrieval operators:
``dsir_weights``, ``tfidf_keyterms``, ``conversion_attribution``.

Stress inputs (deterministic, built once under /tmp, 128 files each —
the straggler-tail lesson from BENCH/BASELINE.md):

- documents: K×-replicated sf0.1 corpus (each replica near- but not
  exact-duplicate) — drives the DSIR token-stream aggregate + fold and
  the tf-idf pair-stream exchanges;
- events: N synthetic events over U users and a 180-day span, typed by
  hash — drives the attribution join (same-user signup→purchase ≤1h).

Per the repo bench protocol each (level, query) is the MEDIAN of
--reps runs (box noise documented at up to 2.5× on single runs).

Usage: python tools/selection_scale_bench.py [--factor 100]
           [--events 20000000] [--users 200000] [--lo 4 --hi 16]
           [--reps 3] [--only name ...]
Prints one JSON report; results are folded into BENCH/BASELINE.md BY
HAND (never rewrite that file from a tool).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_docs(factor: int, path: str) -> None:
    if os.path.exists(path):
        return
    from pyspark.sql import functions as F

    from pdf_extractor_spark.session import get_spark, stop_spark
    spark = get_spark("sel-corpus", extra={
        "spark.ui.showConsoleProgress": "false"})
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    big = (docs.crossJoin(reps)
           .select((F.col("doc_id") + F.col("rep") * 1_000_000)
                   .alias("doc_id"),
                   F.concat(F.col("text"), F.lit(" uniq"),
                            (F.col("doc_id") + F.col("rep") * 1_000_000)
                            .cast("string")).alias("text")))
    big.repartition(128).write.parquet(f"{path}/documents.parquet")
    stop_spark()


def build_events(n: int, users: int, path: str) -> None:
    if os.path.exists(path):
        return
    from pyspark.sql import functions as F

    from pdf_extractor_spark.session import get_spark, stop_spark
    spark = get_spark("sel-events", extra={
        "spark.ui.showConsoleProgress": "false"})
    span_s = 180 * 24 * 3600
    ev = (spark.range(n)
          .select(F.col("id").alias("event_id"),
                  F.expr(f"timestampadd(SECOND, cast(pmod(xxhash64(id),"
                         f" {span_s}) as int),"
                         " TIMESTAMP'2024-01-01 00:00:00')").alias("ts"),
                  F.pmod(F.xxhash64(F.col("id") + 1), F.lit(users))
                  .alias("user_id"),
                  F.expr("element_at(array('view','click','signup',"
                         "'purchase','error'),"
                         " cast(pmod(xxhash64(id + 2), 5) as int) + 1)")
                  .alias("event_type"),
                  (F.pmod(F.xxhash64(F.col("id") + 3), F.lit(10000))
                   / 100.0).alias("value"),
                  F.lit('{"k": 1}').alias("props")))
    ev.repartition(128).write.parquet(f"{path}/events.parquet")
    stop_spark()


def run_level(cpus: int, docs_dir: str, ev_dir: str, reps: int,
              only=None) -> dict:
    from pyspark.sql import functions as F

    from pdf_extractor_spark.queries.curation import q_dsir_weights
    from pdf_extractor_spark.queries.search import q_tfidf_keyterms
    from pdf_extractor_spark.queries.temporal import \
        q_conversion_attribution
    from pdf_extractor_spark.session import get_spark, stop_spark

    spark = get_spark(f"sel-bench-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus * 2, 8),
                      extra={"spark.ui.showConsoleProgress": "false"})
    out = {}

    def timed(name, thunk):
        if only and name not in only:
            return
        secs, n = [], None
        for _ in range(reps):
            df = thunk()
            t0 = time.time()
            row = df.agg(
                F.count("*").alias("n"),
                F.expr("bit_xor(xxhash64(" + ", ".join(df.columns)
                       + "))").alias("chk")).collect()[0]
            secs.append(round(time.time() - t0, 2))
            n = row.n
        out[name] = {"sec": statistics.median(secs), "runs": secs,
                     "rows": n}
        print(f"local[{cpus}] {name}: {n} rows median "
              f"{out[name]['sec']}s {secs}", file=sys.stderr, flush=True)

    timed("dsir_weights", lambda: q_dsir_weights(spark, docs_dir))
    timed("tfidf_keyterms", lambda: q_tfidf_keyterms(spark, docs_dir))
    timed("conversion_attribution",
          lambda: q_conversion_attribution(spark, ev_dir))
    stop_spark()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--events", type=int, default=20_000_000)
    ap.add_argument("--users", type=int, default=200_000)
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    docs_dir = f"/tmp/sel_scale_f{args.factor}"
    ev_dir = f"/tmp/sel_events_n{args.events}_u{args.users}"
    build_docs(args.factor, docs_dir)
    build_events(args.events, args.users, ev_dir)
    os.system("sync")  # page-cache writeback vs first timed run
    time.sleep(2)

    lo = run_level(args.lo, docs_dir, ev_dir, args.reps, args.only)
    hi = run_level(args.hi, docs_dir, ev_dir, args.reps, args.only)
    report = {"docs": 5000 * args.factor, "events": args.events,
              "users": args.users, "lo_cpus": args.lo,
              "hi_cpus": args.hi, "reps": args.reps, "queries": {}}
    for name in lo:
        eff = ((lo[name]["sec"] / hi[name]["sec"]) /
               (args.hi / args.lo)) if name in hi else None
        report["queries"][name] = {
            "rows": lo[name]["rows"],
            f"local[{args.lo}]_sec": lo[name]["sec"],
            f"local[{args.hi}]_sec": hi[name]["sec"],
            "efficiency": round(eff, 3) if eff else None,
        }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
