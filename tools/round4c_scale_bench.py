"""Scaling evidence for the round-4c operators: split_divergence,
robots_filter, host_triangles, fetch_schedule, crawl_budget,
embedding_quantize.

Corpora (deterministic, 128 files, built once under /tmp):
- documents with ALL columns (source survives — the URL/host synthesis
  needs it): K×-replicated sf0.1;
- embeddings: N 64-dim vectors (the curation bench recipe).

Median of --reps per (level, query); count+checksum forcing. Results
folded into BENCH/BASELINE.md BY HAND.

Usage: python tools/round4c_scale_bench.py [--factor 100] [--vectors
           500000] [--lo 4 --hi 16] [--reps 3] [--only name ...]
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

from curation_scale_bench import build_embeddings  # noqa: E402


def build_docs_full(factor: int, path: str) -> None:
    if os.path.exists(path):
        return
    from pyspark.sql import functions as F

    from pdf_extractor_spark.session import get_spark, stop_spark
    spark = get_spark("r4c-corpus", extra={
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
    big.repartition(128).write.parquet(f"{path}/documents.parquet")
    stop_spark()


def build_graph(n_edges: int, n_hosts: int, path: str) -> None:
    """Deterministic hub-skewed undirected edge table (a, b) with
    a < b: endpoint b is drawn from a RANDOM-width prefix [0, r), so
    small ids become hubs (density ∝ 1/rank) — the wedge-explosion
    adversary degree ordering exists for."""
    if os.path.exists(path):
        return
    from pyspark.sql import functions as F

    from pdf_extractor_spark.session import get_spark, stop_spark
    spark = get_spark("r4c-graph", extra={
        "spark.ui.showConsoleProgress": "false"})
    e = (spark.range(n_edges)
         .select(F.pmod(F.xxhash64("id"), F.lit(n_hosts)).alias("x"),
                 F.pmod(F.xxhash64(F.col("id") + 7),
                        F.pmod(F.xxhash64(F.col("id") + 13),
                               F.lit(n_hosts)) + 1).alias("y"))
         .filter(F.col("x") != F.col("y"))
         .select(F.least("x", "y").alias("a"),
                 F.greatest("x", "y").alias("b"))
         .distinct())
    e.repartition(128).write.parquet(f"{path}/edges.parquet")
    stop_spark()


def run_level(cpus: int, docs_dir: str, emb_dir: str, graph_dir: str,
              reps: int, only=None) -> dict:
    from pyspark.sql import functions as F

    from pdf_extractor_spark.queries.simsearch import \
        q_embedding_quantize
    from pdf_extractor_spark.queries.textstats import q_split_divergence
    from pdf_extractor_spark.queries.webcur import q_robots_filter
    from pdf_extractor_spark.queries.webgraph import (q_crawl_budget,
                                                      q_fetch_schedule,
                                                      q_host_triangles)
    from pdf_extractor_spark.session import get_spark, stop_spark

    spark = get_spark(f"r4c-bench-{cpus}", master=f"local[{cpus}]",
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

    timed("split_divergence",
          lambda: q_split_divergence(spark, docs_dir))
    timed("robots_filter", lambda: q_robots_filter(spark, docs_dir))
    timed("host_triangles", lambda: q_host_triangles(spark, docs_dir))
    timed("fetch_schedule", lambda: q_fetch_schedule(spark, docs_dir))
    timed("crawl_budget", lambda: q_crawl_budget(spark, docs_dir))
    timed("embedding_quantize",
          lambda: q_embedding_quantize(spark, emb_dir))
    if (not only) or "triangles_synth" in only:
        from pdf_extractor_spark.queries.webgraph import triangle_counts
        und = spark.read.parquet(f"{graph_dir}/edges.parquet") \
            .localCheckpoint()
        timed("triangles_synth", lambda: triangle_counts(und))
    if (not only) or "fetch_schedule_pre" in only:
        from pdf_extractor_spark.queries.webgraph import q_host_pagerank
        rank = q_host_pagerank(spark, docs_dir).localCheckpoint()
        timed("fetch_schedule_pre",
              lambda: q_fetch_schedule(spark, docs_dir, rank=rank))
    stop_spark()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--vectors", type=int, default=500_000)
    ap.add_argument("--clusters", type=int, default=250)
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--edges", type=int, default=5_000_000)
    ap.add_argument("--graph-hosts", type=int, default=100_000)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    docs_dir = f"/tmp/r4c_scale_f{args.factor}"
    emb_dir = f"/tmp/emb_scale_n{args.vectors}_c{args.clusters}"
    graph_dir = f"/tmp/r4c_graph_e{args.edges}_v{args.graph_hosts}"
    build_docs_full(args.factor, docs_dir)
    build_embeddings(args.vectors, args.clusters, emb_dir)
    build_graph(args.edges, args.graph_hosts, graph_dir)
    os.system("sync")
    time.sleep(2)

    lo = run_level(args.lo, docs_dir, emb_dir, graph_dir, args.reps,
                   args.only)
    hi = run_level(args.hi, docs_dir, emb_dir, graph_dir, args.reps,
                   args.only)
    report = {"docs": 5000 * args.factor, "vectors": args.vectors,
              "lo_cpus": args.lo, "hi_cpus": args.hi,
              "reps": args.reps, "queries": {}}
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
