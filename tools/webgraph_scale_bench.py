"""Scaling measurement for the link-graph + retrieval operators.

Corpus: the ×K corpus from tools/dedup_scale_bench (sf0.1 documents
replicated with distinct doc_ids — each new doc_id synthesizes its own
page HTML, so the outlink explode and the BM25 token stream both grow
linearly with K while the host space stays fixed at N_SITES, the
worst case for the edge aggregation's key cardinality: maximal rows
per key).

Timings force full results via count+checksum aggregates so the
presentation sort / LIMIT cannot hide work (same methodology as the
other scale benches).

Usage: python tools/webgraph_scale_bench.py [--factor 20] [--lo 4] [--hi 16]
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
    """×K corpus like tools/dedup_scale_bench's, but written as 128
    files: 32 files gave local[16] exactly two task waves (straggler
    tail — the measured ~0.6 efficiencies were task granularity, not
    the operators); 128 ≈ 8 waves at 16 cores, 32 at 4."""
    if os.path.exists(path):
        return
    from pyspark.sql import functions as F

    from pdf_extractor_spark.session import get_spark, stop_spark
    spark = get_spark("webgraph-corpus", extra={
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


def run_level(cpus: int, sf_dir: str, only=None, sites=None,
              runs=1) -> dict:
    from pyspark.sql import functions as F

    from pdf_extractor_spark.queries import search, webgraph
    from pdf_extractor_spark.session import get_spark, stop_spark
    if sites:
        # widen the synthetic host space (N_SITES is read at call
        # time): with the default 10 hosts the PageRank iterations and
        # the per-host window are pure fixed latency — a web-scale run
        # has millions of hosts and the per-iteration keyed aggs are
        # the work being measured
        webgraph.N_SITES = sites
    spark = get_spark(f"webgraph-bench-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus * 2, 8),
                      extra={"spark.ui.showConsoleProgress": "false"})
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm
    out = {}

    rank_df = None
    if only is None or "frontier_priority_precomputed" in only \
            or "host_sample_weights_precomputed" in only:
        # the deployed shape (VERDICT r03 #6): PageRank materialized
        # ONCE per graph snapshot; consumers broadcast the table. The
        # materialization is deliberately outside every timed window —
        # that is the point being measured.
        rank_path = (f"/tmp/webgraph_rank_"
                     f"{os.path.basename(sf_dir.rstrip('/'))}"
                     f"_{webgraph.N_SITES}")
        if not os.path.exists(rank_path):
            webgraph.q_host_pagerank(spark, sf_dir) \
                .write.mode("overwrite").parquet(rank_path)
        rank_df = spark.read.parquet(rank_path)

    jobs = [
        ("outlinks",
         lambda: webgraph.q_outlinks(spark, sf_dir).agg(
             F.count("*").alias("n"),
             F.bit_xor(F.xxhash64("src_host", "dst_host",
                                  "n_links")).alias("ck"))),
        ("anchor_texts",
         lambda: webgraph.q_anchor_texts(spark, sf_dir).agg(
             F.count("*").alias("n"),
             F.bit_xor(F.xxhash64("dst_host", "anchor", "n_refs",
                                  "rk")).alias("ck"))),
        ("host_pagerank",
         lambda: webgraph.q_host_pagerank(spark, sf_dir).agg(
             F.count("*").alias("n"),
             F.bit_xor(F.xxhash64("host", "rank_ppb")).alias("ck"))),
        ("host_hits",
         lambda: webgraph.q_host_hits(spark, sf_dir).agg(
             F.count("*").alias("n"),
             F.bit_xor(F.xxhash64("host", "auth_u",
                                  "hub_u")).alias("ck"))),
        ("host_degrees",
         lambda: webgraph.q_host_degrees(spark, sf_dir).agg(
             F.count("*").alias("n"),
             F.bit_xor(F.xxhash64("host", "outdeg", "indeg",
                                  "reciprocal")).alias("ck"))),
        ("frontier_priority",
         lambda: webgraph.q_frontier_priority(spark, sf_dir).agg(
             F.count("*").alias("n"),
             F.bit_xor(F.xxhash64("canonical_url",
                                  "priority", "rk")).alias("ck"))),
        ("frontier_priority_precomputed",
         lambda: webgraph.q_frontier_priority(
             spark, sf_dir, rank=rank_df).agg(
             F.count("*").alias("n"),
             F.bit_xor(F.xxhash64("canonical_url",
                                  "priority", "rk")).alias("ck"))),
        ("host_sample_weights_precomputed",
         lambda: webgraph.q_host_sample_weights(
             spark, sf_dir, rank=rank_df).agg(
             F.count("*").alias("n"),
             F.bit_xor(F.xxhash64("host", "per_doc_weight_ppb"))
             .alias("ck"))),
        ("bm25_topk",
         lambda: search.q_bm25_topk(spark, sf_dir).agg(
             F.count("*").alias("n"),
             F.bit_xor(F.xxhash64("doc_id", "score_u",
                                  "rk")).alias("ck"))),
        ("bpe_wordfreq",
         lambda: spark.read.parquet(f"{sf_dir}/documents.parquet")
         .filter(F.trim(F.col("text")) != "")
         .selectExpr("explode(filter(split(text, ' '), x -> x <> ''))"
                     " AS word")
         .groupBy("word").count().agg(
             F.count("*").alias("n"),
             F.bit_xor(F.xxhash64("word", "count")).alias("ck"))),
        ("bpe_merges",
         lambda: search.q_bpe_merges(spark, sf_dir).agg(
             F.count("*").alias("n"),
             F.bit_xor(F.xxhash64("merge_rank", "lhs", "rhs",
                                  "pair_count")).alias("ck"))),
        ("bpe_encode",
         lambda: search.q_bpe_encode(spark, sf_dir).agg(
             F.count("*").alias("n"),
             F.bit_xor(F.xxhash64("doc_id", "ws_tokens",
                                  "bpe_tokens")).alias("ck"))),
    ]
    for name, thunk in jobs:
        if only and name not in only:
            continue
        secs, row = [], None
        for _ in range(runs):
            t0 = time.time()
            row = thunk().collect()[0]
            secs.append(time.time() - t0)
        out[name] = {"sec": round(sorted(secs)[len(secs) // 2], 2),
                     "runs": [round(s, 2) for s in secs],
                     "rows": row["n"], "checksum": row["ck"]}
        print(f"local[{cpus}] {name}: {row['n']} rows "
              f"ck={row['ck']} median {out[name]['sec']}s {secs}",
              file=sys.stderr, flush=True)
    stop_spark()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=20)
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=16)
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset of query names")
    ap.add_argument("--sites", type=int, default=None,
                    help="override webgraph.N_SITES (host-space size)")
    ap.add_argument("--runs", type=int, default=1,
                    help="timed runs per query; median reported")
    args = ap.parse_args()
    only = set(args.queries.split(",")) if args.queries else None
    sf_dir = f"/tmp/webgraph_scale_x{args.factor}"
    build_corpus(args.factor, sf_dir)
    lo = run_level(args.lo, sf_dir, only, args.sites, args.runs)
    hi = run_level(args.hi, sf_dir, only, args.sites, args.runs)
    eff = {n: round((lo[n]["sec"] / hi[n]["sec"]) / (args.hi / args.lo), 3)
           for n in lo}
    mismatch = [n for n in lo if lo[n]["checksum"] != hi[n]["checksum"]]
    print(json.dumps({"factor": args.factor, "docs": 5000 * args.factor,
                      "lo_cpus": args.lo, "hi_cpus": args.hi,
                      "lo": lo, "hi": hi, "efficiency": eff,
                      "checksum_mismatch": mismatch}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
