"""Measure pointer doubling in run-to-convergence label propagation.

Same ×K replicated near-dup corpus as tools/dedup_scale_bench.py; for
each parallelism level, runs min-label propagation to convergence with
and without the label(label(u)) doubling fold and reports rounds run,
wall seconds, and the cluster-count checksum (must match: the fixpoint
is schedule-independent).

Usage: python tools/cluster_doubling_bench.py [--factor 20] [--lo 4] [--hi 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.dedup_scale_bench import build_corpus  # noqa: E402


def run_level(cpus: int, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from pdf_extractor_spark.queries import dedup
    from pdf_extractor_spark.session import get_spark, stop_spark
    spark = get_spark(f"cluster-dbl-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus * 2, 8),
                      extra={"spark.ui.showConsoleProgress": "false"})
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    edges = dedup.q_dedup_minhash_lsh(spark, sf_dir) \
        .select("doc_a", "doc_b")
    # materialize the edge set once so both variants time ONLY the
    # propagation loop, not the LSH candidate generation
    edges = edges.localCheckpoint(eager=True)
    docs = docs.localCheckpoint(eager=True)
    out = {}
    for tag, doubling in [("plain", False), ("doubling", True)]:
        t0 = time.time()
        labels, rounds = dedup.propagate_min_labels(
            docs, edges, rounds=None, doubling=doubling)
        n_clusters = labels.agg(
            F.countDistinct("label").alias("c")).collect()[0]["c"]
        out[tag] = {"sec": round(time.time() - t0, 2),
                    "rounds": rounds, "clusters": n_clusters}
        print(f"local[{cpus}] {tag}: rounds={rounds} "
              f"clusters={n_clusters} {out[tag]['sec']}s",
              file=sys.stderr, flush=True)
    stop_spark()
    return out


def run_chain(n: int, plain_cap: int) -> dict:
    """Path graph 0-1-2-…-(n-1): diameter n-1, ONE component. Plain
    propagation needs ~n rounds (infeasible beyond tiny n — the whole
    point); doubling needs ~log2(n). Plain runs only up to
    ``plain_cap`` rounds to show it has NOT converged by then."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.queries import dedup
    from pdf_extractor_spark.session import get_spark, stop_spark
    spark = get_spark("cluster-dbl-chain", master="local[16]",
                      shuffle_partitions=32,
                      extra={"spark.ui.showConsoleProgress": "false"})
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    edges = (spark.range(n - 1)
             .select(F.col("id").alias("doc_a"),
                     (F.col("id") + 1).alias("doc_b")))
    out = {"n": n}
    t0 = time.time()
    labels, rounds = dedup.propagate_min_labels(
        docs, edges, rounds=None, doubling=True, max_rounds=100)
    n_clusters = labels.agg(F.countDistinct("label")).collect()[0][0]
    out["doubling"] = {"sec": round(time.time() - t0, 2),
                       "rounds": rounds, "clusters": n_clusters}
    print(f"chain[{n}] doubling: rounds={rounds} clusters={n_clusters} "
          f"{out['doubling']['sec']}s", file=sys.stderr, flush=True)
    t0 = time.time()
    labels, rounds = dedup.propagate_min_labels(
        docs, edges, rounds=plain_cap)
    n_clusters = labels.agg(F.countDistinct("label")).collect()[0][0]
    out["plain_capped"] = {"sec": round(time.time() - t0, 2),
                           "rounds": rounds, "clusters": n_clusters,
                           "cap": plain_cap}
    print(f"chain[{n}] plain@{plain_cap}: clusters={n_clusters} "
          f"(1 = converged) {out['plain_capped']['sec']}s",
          file=sys.stderr, flush=True)
    stop_spark()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=20)
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=16)
    ap.add_argument("--chain", type=int, default=0,
                    help="run the path-graph mode at this node count "
                         "instead of the corpus mode")
    ap.add_argument("--plain-cap", type=int, default=20)
    args = ap.parse_args()

    if args.chain:
        print(json.dumps(run_chain(args.chain, args.plain_cap)))
        return 0
    sf_dir = f"/tmp/dedup_scale_x{args.factor}"
    build_corpus(args.factor, sf_dir)
    lo = run_level(args.lo, sf_dir)
    hi = run_level(args.hi, sf_dir)
    print(json.dumps({"factor": args.factor, "docs": 5000 * args.factor,
                      "lo_cpus": args.lo, "hi_cpus": args.hi,
                      "lo": lo, "hi": hi}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
