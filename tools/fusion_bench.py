"""Pass-fusion evidence: N scoring passes over the corpus as N
separate actions (N scans) vs ONE fused projection (one scan).

At 100 TB the scan IS the cost — quality stats, language ID, and DSIR
scoring are all doc-local folds, so running them per-pass re-reads the
corpus per pass while the fused projection computes every column in
one pass. This tool measures both on the 500k-doc stress corpus; the
fused wall should sit near the slowest single pass, not the sum.

Usage: python tools/fusion_bench.py [--factor 100] [--cpus 16]
           [--reps 3]
Prints one JSON line; folded into BENCH/BASELINE.md by hand.
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

from selection_scale_bench import build_docs  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    docs_dir = f"/tmp/sel_scale_f{args.factor}"
    build_docs(args.factor, docs_dir)

    from pyspark.sql import functions as F

    from pdf_extractor_spark.queries.curation import (dsir_score,
                                                      dsir_train)
    from pdf_extractor_spark.session import get_spark, stop_spark

    spark = get_spark(f"fusion-{args.cpus}",
                      master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus * 2, 8),
                      extra={"spark.ui.showConsoleProgress": "false"})
    docs = spark.read.parquet(f"{docs_dir}/documents.parquet")
    llr = dsir_train(docs).localCheckpoint()  # train once (snapshot)
    wmap = llr.agg(F.map_from_entries(
        F.collect_list(F.struct("b", "llr_u"))).alias("m"))

    W = "filter(split(text, ' '), x -> x <> '')"
    quality_cols = [
        F.expr(f"size({W})").alias("n_words"),
        F.expr(f"aggregate({W}, 0L, (a, x) -> a + length(x))")
        .alias("n_chars"),
        F.expr("length(text) - length(replace(text, '.', ''))")
        .alias("n_periods"),
    ]
    lang_col = [F.expr(
        f"CASE WHEN size(filter({W}, x -> x IN ('the','a','and','of')))"
        f" * 4 > size({W}) THEN 'en' ELSE 'other' END").alias("lang_g")]
    dsir_col = [F.expr(
        f"aggregate({W}, cast(0 as bigint), (acc, x) -> acc +"
        " coalesce(element_at(m, cast(conv(substring(md5(x), 1, 14),"
        " 16, 10) as bigint) % 512), 0L))").alias("dsir_u")]

    def run(df):
        cols = ", ".join(df.columns)
        return df.agg(F.count("*"),
                      F.expr(f"bit_xor(xxhash64({cols}))")).collect()

    def timed(thunks):
        secs = []
        for _ in range(args.reps):
            t0 = time.time()
            for t in thunks:
                run(t())
            secs.append(round(time.time() - t0, 2))
        return statistics.median(secs), secs

    base = docs.crossJoin(F.broadcast(wmap))
    passes = {
        "quality": lambda: docs.select("doc_id", *quality_cols),
        "lang": lambda: docs.select("doc_id", *lang_col),
        "dsir": lambda: base.select("doc_id", *dsir_col),
    }
    report = {"docs_factor": args.factor, "cpus": args.cpus,
              "reps": args.reps}
    total_separate = 0.0
    for name, thunk in passes.items():
        med, runs = timed([thunk])
        report[f"pass_{name}_sec"] = med
        total_separate += med
        print(f"pass {name}: {med}s {runs}", file=sys.stderr, flush=True)
    report["separate_total_sec"] = round(total_separate, 2)
    fused_med, fused_runs = timed([lambda: base.select(
        "doc_id", *quality_cols, *lang_col, *dsir_col)])
    report["fused_sec"] = fused_med
    report["fusion_speedup"] = round(total_separate / fused_med, 2)
    print(f"fused: {fused_med}s {fused_runs}", file=sys.stderr,
          flush=True)
    stop_spark()
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
