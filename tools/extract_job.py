"""spark-submit entry point for the extraction job (scaling bench).

Run as:
  spark-submit --master local[N] --py-files engine.zip \
      tools/extract_job.py --pages /tmp/pages.parquet --mode salted

Prints one JSON line: {"docs": N, "sec": s, "docs_per_sec": r,
"mode": ..., "parallelism": P, "partitions": K}.
Modes:
  salted  — repartition by xxhash64(url) (the engine's skew defense)
  domain  — repartition by url domain (adversarial: the hot domain
            lands in one partition; demonstrates the pathology)
  none    — keep the scan's file-split partitioning
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pdf_extractor_spark.pipeline.extract import (extract_pages,
                                                  repartition_salted)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--mode", default="salted",
                    choices=["salted", "domain", "none"])
    ap.add_argument("--partitions", type=int, default=0)
    ap.add_argument("--levels", default="raw",
                    help="comma list: raw,lines,chapters,processed,markdown")
    ap.add_argument("--payload", default="all",
                    choices=["all", "pdf", "html"],
                    help="restrict the corpus to one payload lane "
                         "(by url extension) — isolates parser cost")
    args = ap.parse_args()

    spark = SparkSession.builder \
        .config("spark.sql.execution.arrow.pyspark.enabled", "true") \
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256") \
        .config("spark.sql.adaptive.enabled", "true") \
        .config("spark.sql.files.maxPartitionBytes", "8m") \
        .config("spark.ui.enabled", "false") \
        .config("spark.ui.showConsoleProgress", "false") \
        .getOrCreate()
    parallelism = spark.sparkContext.defaultParallelism
    num_parts = args.partitions or parallelism * 2

    pages = spark.read.parquet(args.pages)
    if args.payload != "all":
        pages = pages.filter(F.col("url").endswith(f".{args.payload}"))
    n_docs = pages.count()

    if args.mode == "salted":
        pages = repartition_salted(pages, num_parts)
    elif args.mode == "domain":
        domain = F.regexp_extract("url", r"https?://([^/]+)/", 1)
        pages = pages.repartition(num_parts, domain)

    # Full untimed pass: starts every Python worker (worker reuse keeps
    # them alive), fills the OS page cache, JITs the JVM side. The
    # timed pass then measures steady-state throughput — the regime a
    # long-running 100 TB job actually operates in.
    levels = tuple(args.levels.split(","))
    extract_pages(pages, levels=levels) \
        .filter("failure_reason is null").count()

    t0 = time.time()
    ok = extract_pages(pages, levels=levels) \
        .filter("failure_reason is null").count()
    sec = time.time() - t0

    print(json.dumps({
        "docs": n_docs, "ok": ok, "sec": round(sec, 3),
        "docs_per_sec": round(n_docs / sec, 1),
        "mode": args.mode, "parallelism": parallelism,
        "partitions": num_parts, "levels": args.levels,
        "payload": args.payload,
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
