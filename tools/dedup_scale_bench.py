"""Scaling evidence for the shuffle-heavy dedup path (north rule:
"partitioning / shuffle / skew handled explicitly" must hold beyond
the embarrassingly-parallel extraction stage).

Builds a K×-replicated documents corpus from sf0.1 (each replica gets
a unique tail token, so replicas are near- but not exact duplicates —
the adversarial regime for MinHash/SimHash banding), then times the
three scale-path dedup queries at two parallelism levels and reports
throughput + scaling efficiency per query.

Also reports what the Jaccard document-frequency cap prunes on this
corpus: replication multiplies every shingle's DF by K, so shingles
that were benign at sf0.1 cross the cap — exactly the stop-shingle
blowup the cap exists for.

Usage: python tools/dedup_scale_bench.py [--factor 5] [--lo 4 --hi 16]
Writes /tmp JSON to stdout; results folded into BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_corpus(factor: int, path: str) -> None:
    if os.path.exists(path):
        return
    from pyspark.sql import functions as F

    from pdf_extractor_spark.session import get_spark, stop_spark
    spark = get_spark("dedup-corpus", extra={
        "spark.ui.showConsoleProgress": "false"})
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    big = (docs.crossJoin(reps)
           .select((F.col("doc_id") + F.col("rep") * 1_000_000)
                   .alias("doc_id"),
                   F.concat(F.col("text"), F.lit(" uniq"),
                            (F.col("doc_id") + F.col("rep") * 1_000_000)
                            .cast("string")).alias("text"),
                   "lang", "source", "n_chars"))
    big.repartition(32).write.parquet(f"{path}/documents.parquet")
    stop_spark()


def run_level(cpus: int, sf_dir: str, only=None) -> dict:
    """Fresh interpreter per level via re-exec would be cleanest; a
    fresh SparkSession per level is the practical stand-in (JVM reuse
    slightly favors the second level — noted in the report)."""
    from pdf_extractor_spark.queries import dedup
    from pdf_extractor_spark.session import get_spark, stop_spark
    spark = get_spark(f"dedup-bench-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus * 2, 8),
                      extra={"spark.ui.showConsoleProgress": "false"})
    out = {}
    for name, fn in [("dedup_minhash_lsh", dedup.q_dedup_minhash_lsh),
                     ("simhash_bands", dedup.q_simhash_bands),
                     ("dedup_ngram_jaccard", dedup.q_dedup_ngram_jaccard),
                     ("dedup_clusters", dedup.q_dedup_clusters),
                     ("dedup_clusters_converged",
                      dedup.q_dedup_clusters_converged),
                     ("benchmark_contamination",
                      dedup.q_benchmark_contamination)]:
        if only and name not in only:
            continue
        # warm pass not needed: each query's scan dominates and the OS
        # cache is warm after corpus build; timings are steady-state
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        out[name] = {"sec": round(time.time() - t0, 2), "rows": n}
        print(f"local[{cpus}] {name}: {n} rows "
              f"{out[name]['sec']}s", file=sys.stderr, flush=True)
    stop_spark()
    return out


def cap_stats(sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from pdf_extractor_spark.queries.dedup import (_SHINGLES_SPARK,
                                                   JACCARD_DF_CAP)
    from pdf_extractor_spark.session import get_spark, stop_spark
    spark = get_spark("dedup-capstats", extra={
        "spark.ui.showConsoleProgress": "false"})
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    sh = docs.select("doc_id", F.explode(F.expr(_SHINGLES_SPARK))
                     .alias("shingle")).distinct()
    df = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    row = df.agg(
        F.count("*").alias("n_shingles"),
        F.max("df").alias("max_df"),
        F.sum(F.when(F.col("df") > JACCARD_DF_CAP, 1).otherwise(0))
         .alias("hot_shingles"),
        F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("pairs_all"),
        F.sum(F.when(F.col("df") <= JACCARD_DF_CAP,
                     F.col("df") * (F.col("df") - 1) / 2).otherwise(0))
         .alias("pairs_capped")).collect()[0]
    stop_spark()
    d = {k: int(v) for k, v in row.asDict().items()}
    d["n_docs"] = n_docs
    d["prune_ratio"] = round(d["pairs_all"] / max(d["pairs_capped"], 1), 1)
    return d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=5)
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=16)
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset of query names")
    ap.add_argument("--skip-cap-stats", action="store_true")
    args = ap.parse_args()
    only = set(args.queries.split(",")) if args.queries else None

    sf_dir = f"/tmp/dedup_scale_x{args.factor}"
    build_corpus(args.factor, sf_dir)

    stats = {"n_docs": 5000 * args.factor}
    if not args.skip_cap_stats:
        stats = cap_stats(sf_dir)
        print(f"cap stats: {stats}", file=sys.stderr, flush=True)
    lo = run_level(args.lo, sf_dir, only)
    hi = run_level(args.hi, sf_dir, only)
    eff = {name: round((lo[name]["sec"] / hi[name]["sec"])
                       / (args.hi / args.lo), 3)
           for name in lo}
    print(json.dumps({"factor": args.factor,
                      "docs": stats["n_docs"],
                      "lo_cpus": args.lo, "hi_cpus": args.hi,
                      "lo": lo, "hi": hi, "efficiency": eff,
                      "jaccard_cap_stats": stats}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
