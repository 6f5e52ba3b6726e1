"""Execution-lane comparison on ONE operator: the mojibake repair
(queries/webcur.py) run three ways over the same corpus —

  jvm        bare chained literal replace() inside whole-stage codegen
  jvm_gated  the registry plan: the same chain behind a two-contains()
             literal precheck (every signature sequence carries 'Ã' or
             'â'), so clean rows skip the ten replace passes
  pandas_udf the vectorized Arrow lane: pandas Series.str.replace
             chain (what the repair would be if written as a UDF)
  python_udf the per-row lane the input_hint forbids: plain Python
             str.replace per row

Same replace chain, same corpus, checksummed outputs must agree.
This measures the lane hierarchy on a real operator instead of citing
folklore — and the folklore LOSES on the bare chain (CPython's
two-way/memmem substring search beats UTF8String.indexOf, so the
per-row UDF outruns both vectorized lanes); the gate is what returns
the win to the JVM on realistic (mostly-clean) corpora.

Usage: python tools/mojibake_lane_bench.py [--docs 4000000] [--cpus 16]
       [--dirty-den 4]   (1 of every dirty-den docs carries mojibake;
                          the registry query's own synthesis uses 3 of 4)
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

import pandas as pd  # noqa: E402  (module level so the pandas_udf
#                      type hints resolve at decoration time)


def build_corpus(docs: int, dirty_den: int, path: str) -> None:
    if os.path.exists(path):
        return
    from pyspark.sql import functions as F

    from pdf_extractor_spark.queries.webcur import _MOJI_SUFFIXES
    from pdf_extractor_spark.session import get_spark, stop_spark
    spark = get_spark("moji-corpus", extra={
        "spark.ui.showConsoleProgress": "false"})
    # ~25-token docs; 1 of every dirty_den docs gets one of the
    # registry query's mojibake suffixes (dirty_den=4 reproduces its
    # 3-of-4 synthesis shape inverted; 20 models a realistic crawl).
    # MATERIALIZED so the timed lanes all read identical dirty bytes.
    branches = " ".join(
        f"WHEN doc_id % {dirty_den * 3} = {3 * j + 1} THEN '{s}'"
        for j, s in enumerate(_MOJI_SUFFIXES[1:]))
    suffix = f"CASE {branches} ELSE '' END" if dirty_den > 1 else \
        f"CASE WHEN doc_id % 3 = 0 THEN '{_MOJI_SUFFIXES[1]}' " \
        f"WHEN doc_id % 3 = 1 THEN '{_MOJI_SUFFIXES[2]}' " \
        f"ELSE '{_MOJI_SUFFIXES[3]}' END"
    base = (spark.range(docs)
            .select(F.col("id").alias("doc_id"),
                    F.concat_ws(" ", F.transform(
                        F.sequence(F.lit(1), F.lit(25)),
                        lambda i: F.concat(F.lit("word"),
                                           i.cast("string"))))
                    .alias("text")))
    (base.select("doc_id",
                 F.expr(f"concat(text, {suffix})").alias("dirty"))
     .repartition(32).write.parquet(f"{path}/dirty.parquet"))
    stop_spark()


def run(cpus: int, sf_dir: str) -> dict:
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    from pdf_extractor_spark.queries.webcur import _MOJIBAKE_PAIRS
    from pdf_extractor_spark.session import get_spark, stop_spark
    spark = get_spark(f"moji-lanes-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus * 2, 8),
                      extra={"spark.ui.showConsoleProgress": "false"})
    dirty = spark.read.parquet(f"{sf_dir}/dirty.parquet")
    n_docs = dirty.count()  # warm scan

    def jvm_fixed():
        col = F.col("dirty")
        for bad, good in _MOJIBAKE_PAIRS:
            col = F.replace(col, F.lit(bad), F.lit(good))
        return col

    def jvm_gated():
        return (F.when(F.col("dirty").contains("Ã")
                       | F.col("dirty").contains("â"), jvm_fixed())
                .otherwise(F.col("dirty")))

    @F.pandas_udf(StringType())
    def fix_pandas(s: pd.Series) -> pd.Series:
        for bad, good in _MOJIBAKE_PAIRS:
            s = s.str.replace(bad, good, regex=False)
        return s

    def fix_row(t: str) -> str:
        for bad, good in _MOJIBAKE_PAIRS:
            t = t.replace(bad, good)
        return t
    fix_udf = F.udf(fix_row, StringType())

    lanes = {"jvm": jvm_fixed, "jvm_gated": jvm_gated,
             "pandas_udf": lambda: fix_pandas("dirty"),
             "python_udf": lambda: fix_udf("dirty")}
    out = {}
    for name, mk_expr in lanes.items():
        # a FRESH DataFrame per run: re-collecting the same DF object
        # reuses its partial-agg shuffle files (skipped stages) and
        # measures nothing
        def mk_df():
            return spark.read.parquet(f"{sf_dir}/dirty.parquet").select(
                F.count("*").alias("n"),
                F.bit_xor(F.xxhash64("doc_id", mk_expr())).alias("ck"))
        row = mk_df().collect()  # warm-up (codegen / workers), untimed
        secs = []
        for _ in range(3):
            t0 = time.time()
            row = mk_df().collect()
            secs.append(time.time() - t0)
        med = statistics.median(secs)
        out[name] = {"sec": round(med, 2),
                     "docs_per_sec": int(n_docs / med),
                     "checksum": row[0]["ck"]}
        print(f"local[{cpus}] {name}: {out[name]['docs_per_sec']}"
              f" docs/s ({med:.2f}s) ck={row[0]['ck']}",
              file=sys.stderr, flush=True)
    stop_spark()
    cks = {v["checksum"] for v in out.values()}
    return {"cpus": cpus, "docs": n_docs, "lanes": out,
            "checksums_agree": len(cks) == 1,
            "gate_speedup": round(out["jvm"]["sec"]
                                  / out["jvm_gated"]["sec"], 2),
            "gated_vs_best_python": round(
                min(out["pandas_udf"]["sec"], out["python_udf"]["sec"])
                / out["jvm_gated"]["sec"], 2)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=4_000_000)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--dirty-den", type=int, default=4,
                    help="1 in N docs dirty (1 = every doc dirty)")
    args = ap.parse_args()
    sf_dir = f"/tmp/moji_lanes_{args.docs}_d{args.dirty_den}"
    build_corpus(args.docs, args.dirty_den, sf_dir)
    out = run(args.cpus, sf_dir)
    out["dirty_den"] = args.dirty_den
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
