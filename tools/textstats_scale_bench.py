"""Scaling evidence for the zero-shuffle textstats rewrites.

Round 3 rewrote the five per-document text-analysis queries
(lang_id, quality_score, token_count, doc_fingerprint, doc_winnow)
from explode→groupBy shapes (one shuffled row per WORD) into
doc-local array folds (zero data shuffle; the only exchange left is
the presentation sort).  This tool measures both shapes on the
500k-doc stress corpus (/tmp/dedup_scale_f100, sf0.1 replicated
100×) at two parallelism levels and reports throughput + scaling
efficiency.

Every timing forces all output columns via a bit_xor(xxhash64(*))
checksum — `count()` lets Catalyst prune the very projections being
benchmarked (see BENCH/BASELINE.md).

Usage: python tools/textstats_scale_bench.py [--lo 4 --hi 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPUS = "/tmp/dedup_scale_f100"

QUERIES = ["lang_id", "quality_score", "token_count",
           "doc_fingerprint", "doc_winnow"]


def _checksum(df) -> int:
    from pyspark.sql import functions as F
    row = df.agg(F.bit_xor(F.xxhash64(*df.columns)).alias("chk"),
                 F.count("*").alias("n")).collect()[0]
    return row["chk"], row["n"]


def _old_winnow(spark, sf_dir):
    """The r02 shape: explode → per-doc window → distinct → groupBy
    (two hash-partition shuffles of every shingle row)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from pdf_extractor_spark.queries.dedup import _shingled
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = _shingled(docs).select(
        "doc_id", F.posexplode("sh").alias("pos", "shingle"))
    hashed = sh.withColumn(
        "h", F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long"))
    w = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    selected = (hashed.withColumn("win_min", F.min("h").over(w))
                .select("doc_id", "win_min").distinct())
    return (selected.groupBy("doc_id")
            .agg(F.count("*").alias("fp_size"),
                 F.min("win_min").alias("fp_min"),
                 F.max("win_min").alias("fp_max"))
            .orderBy("doc_id"))


def _old_token_count(spark, sf_dir):
    """The r02 shape: explode words → groupBy doc_id (+countDistinct)."""
    from pyspark.sql import functions as F
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = (docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
         .filter(F.col("word") != ""))
    return (w.groupBy("doc_id")
            .agg(F.count("*").alias("ws_tokens"),
                 F.sum(F.ceil(F.length("word") / F.lit(4.0)).cast("long"))
                 .alias("bpe_tokens"),
                 F.countDistinct("word").alias("distinct_tokens"))
            .orderBy("doc_id"))


def run_level(cores: int) -> dict:
    from pdf_extractor_spark.session import get_spark, stop_spark

    from __spark_entry__ import queries
    spark = get_spark(f"textstats-scale-{cores}", master=f"local[{cores}]",
                      extra={"spark.ui.showConsoleProgress": "false",
                             "spark.sql.shuffle.partitions": str(cores * 2)})
    qs = queries()
    out = {}
    for name in QUERIES:
        t0 = time.time()
        chk, n = _checksum(qs[name](spark, CORPUS))
        out[name] = {"sec": round(time.time() - t0, 1), "rows": n,
                     "chk": chk}
    for name, fn in [("doc_winnow_OLD", _old_winnow),
                     ("token_count_OLD", _old_token_count)]:
        t0 = time.time()
        chk, n = _checksum(fn(spark, CORPUS))
        out[name] = {"sec": round(time.time() - t0, 1), "rows": n,
                     "chk": chk}
    stop_spark()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=16)
    args = ap.parse_args()
    if not os.path.exists(CORPUS):
        print(f"missing stress corpus {CORPUS} "
              "(build via tools/dedup_scale_bench.py)", file=sys.stderr)
        return 1
    lo = run_level(args.lo)
    hi = run_level(args.hi)
    report = {}
    for name in lo:
        eff = (lo[name]["sec"] / hi[name]["sec"]) / (args.hi / args.lo)
        report[name] = {
            f"local[{args.lo}]_sec": lo[name]["sec"],
            f"local[{args.hi}]_sec": hi[name]["sec"],
            "efficiency": round(eff, 3),
            "rows": hi[name]["rows"],
            "chk_match_across_levels": lo[name]["chk"] == hi[name]["chk"],
        }
    # old-vs-new checksum identity at hi level
    report["_winnow_old_eq_new"] = (
        hi["doc_winnow"]["chk"] == hi["doc_winnow_OLD"]["chk"])
    report["_token_old_eq_new"] = (
        hi["token_count"]["chk"] == hi["token_count_OLD"]["chk"])
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
