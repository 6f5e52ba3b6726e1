"""Scaling measurement for the web-curation span operators.

Corpus: the ×K replicated near-dup corpus from tools/dedup_scale_bench
(every doc has K-1 near-verbatim replicas — the adversarial regime for
span detection, since every replica pair shares essentially the whole
document). Timings force the full span set via a checksum aggregate
(the registry query's LIMIT 50 would let the presentation sort hide
nothing here, but the checksum keeps the methodology identical to the
other scale benches).

Usage: python tools/webcur_scale_bench.py [--factor 20] [--lo 4] [--hi 16]
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


def run_level(cpus: int, sf_dir: str, only=None) -> dict:
    from pyspark.sql import functions as F

    from pdf_extractor_spark.queries import webcur
    from pdf_extractor_spark.session import get_spark, stop_spark
    spark = get_spark(f"webcur-bench-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus * 2, 8),
                      extra={"spark.ui.showConsoleProgress": "false"})
    # warm the session + OS page cache so the first timed job does not
    # absorb the JVM/scan startup floor (the cheap queries would
    # otherwise measure session startup, not the operator)
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    out = {}
    jobs = [
        ("duplicate_spans_full",
         lambda: webcur._span_runs(spark, sf_dir).agg(
             F.count("*").alias("n"),
             F.bit_xor(F.xxhash64("doc_a", "doc_b", "start_a",
                                  "start_b", "span_len")).alias("ck"))),
        ("span_scrub",
         lambda: webcur.q_span_scrub(spark, sf_dir).agg(
             F.count("*").alias("n"),
             F.bit_xor(F.xxhash64("doc_id", "dup_tokens",
                                  "dup_bp", "verdict")).alias("ck"))),
        ("span_scrub_star",
         lambda: webcur.q_span_scrub_star(spark, sf_dir).agg(
             F.count("*").alias("n"),
             F.bit_xor(F.xxhash64("doc_id", "dup_tokens",
                                  "dup_bp", "verdict")).alias("ck"))),
        ("url_canonicalize",
         lambda: webcur.q_url_canonicalize(spark, sf_dir).agg(
             F.count("*").alias("n"),
             F.bit_xor(F.xxhash64("doc_id", "canonical_url")).alias("ck"))),
    ]
    for name, thunk in jobs:
        if only and name not in only:
            continue
        t0 = time.time()
        row = thunk().collect()[0]
        out[name] = {"sec": round(time.time() - t0, 2),
                     "rows": row["n"], "checksum": row["ck"]}
        print(f"local[{cpus}] {name}: {row['n']} rows "
              f"ck={row['ck']} {out[name]['sec']}s",
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
    args = ap.parse_args()
    only = set(args.queries.split(",")) if args.queries else None
    sf_dir = f"/tmp/dedup_scale_x{args.factor}"
    build_corpus(args.factor, sf_dir)
    lo = run_level(args.lo, sf_dir, only)
    hi = run_level(args.hi, sf_dir, only)
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
