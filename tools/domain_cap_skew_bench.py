"""Skew evidence for the per-host quota (queries/webcur.py domain_cap).

The cap's scale posture rests on ONE plan property: `row_number() <= K`
compiles to a Partial WindowGroupLimit below the host exchange, so a
mega-host ships at most K rows per input partition into the shuffle
instead of its full row set. This bench measures exactly that defense:
the same query on the same corpus with the rewrite ON (default) and
OFF (`spark.sql.window.group.limit.threshold=-1` — Spark's own kill
switch), at two parallelism levels.

Corpus: one mega-host holding half the documents (the wiki-mirror
regime the cap exists for), the rest spread uniformly over small
hosts. Document text is a short deterministic token run (the window
shuffle, not the tokenize, must dominate — that is the operator's
cost at 10^12 rows, where text rides in other columns).

Checksums (count + bit_xor of row hashes) pin that both plan variants
and both levels produce the identical keep-set.

Usage: python tools/domain_cap_skew_bench.py [--docs 2000000]
       [--hosts 1000] [--lo 4 --hi 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_corpus(docs: int, hosts: int, mega_mod: int, mega_hits: int,
                 path: str) -> None:
    if os.path.exists(path):
        return
    from pyspark.sql import functions as F

    from pdf_extractor_spark.session import get_spark, stop_spark
    spark = get_spark("domcap-corpus", extra={
        "spark.ui.showConsoleProgress": "false"})
    # doc_id % mega_mod < mega_hits -> the mega host; rest uniform over
    # `hosts` small hosts. Token count varies 3..10 with doc_id so the
    # quota's ordering has real work to do while the scan/tokenize cost
    # stays small relative to the window — at 10^12 rows the window
    # shuffle, not the tokenize, is the operator's cost.
    df = (spark.range(docs)
          .select(F.col("id").alias("doc_id"),
                  F.concat_ws(" ", F.transform(
                      F.sequence(F.lit(1),
                                 (F.col("id") % 8 + 3).cast("int")),
                      lambda i: F.concat(F.lit("w"), i.cast("string"))))
                  .alias("text"),
                  F.lit("en").alias("lang"),
                  F.when(F.col("id") % mega_mod < mega_hits,
                         F.lit("megahost"))
                  .otherwise(F.concat(F.lit("s"),
                                      (F.col("id") % hosts)
                                      .cast("string")))
                  .alias("source")))
    (df.withColumn("n_chars", F.length("text").cast("long"))
       .repartition(32).write.parquet(f"{path}/documents.parquet"))
    stop_spark()


def run_level(cpus: int, sf_dir: str) -> dict:
    """One session per level; the WindowGroupLimit kill switch is a
    runtime SQL conf, so both variants run in the same session. The
    first execution of each variant is an untimed warm-up (first-job
    codegen/JIT measured at ~5s — it would swamp the plan delta);
    reported numbers are medians of 3 warm runs."""
    import statistics

    from pyspark.sql import functions as F

    from pdf_extractor_spark.queries import webcur
    from pdf_extractor_spark.session import get_spark, stop_spark
    spark = get_spark(f"domcap-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus * 2, 8),
                      extra={"spark.ui.showConsoleProgress": "false"})

    def run():
        return (webcur.q_domain_cap(spark, sf_dir)
                .agg(F.count("*").alias("n"),
                     F.bit_xor(F.xxhash64("doc_id", "host", "n_tokens",
                                          "host_rank")).alias("ck"))
                .collect()[0])

    out = {}
    for variant, threshold in [("wgl_on", "1000"), ("wgl_off", "-1")]:
        spark.conf.set("spark.sql.window.group.limit.threshold",
                       threshold)
        row = run()  # warm-up: codegen + page cache, untimed
        secs = []
        for _ in range(3):
            t0 = time.time()
            row = run()
            secs.append(round(time.time() - t0, 2))
        out[variant] = {"sec": round(statistics.median(secs), 2),
                        "runs": secs,
                        "rows": row["n"], "checksum": row["ck"]}
        print(f"local[{cpus}] {variant}: {row['n']} rows "
              f"ck={row['ck']} {out[variant]['sec']}s {secs}",
              file=sys.stderr, flush=True)
    stop_spark()
    return out


def shuffle_rows(sf_dir: str) -> dict:
    """Rows entering the host exchange under each plan — the cost that
    matters on a real cluster where the shuffle is network, not local
    disk. With the Partial WindowGroupLimit each input partition ships
    at most K rows per host (exact by the operator's semantics:
    sum over (input_partition, host) of min(count, K)); without it the
    exchange carries every row."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.queries import webcur
    from pdf_extractor_spark.session import get_spark, stop_spark
    spark = get_spark("domcap-rows", extra={
        "spark.ui.showConsoleProgress": "false"})
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hostport = ("split_part(split_part(split_part(split_part(url, '#', 1),"
                " '://', 2), '?', 1), '/', 1)")
    host0 = f"lower(split_part({hostport}, ':', 1))"
    host = (f"CASE WHEN substr({host0}, 1, 4) = 'www.'"
            f" THEN substr({host0}, 5) ELSE {host0} END")
    per_part = (docs
                .select(F.expr(webcur._URL_SPARK).alias("url"),
                        F.spark_partition_id().alias("pid"))
                .withColumn("host", F.expr(host))
                .groupBy("pid", "host").count()
                .agg(F.sum(F.least(F.col("count"),
                                   F.lit(webcur.DOMAIN_CAP_K))).alias("on"),
                     F.sum("count").alias("off"))
                .collect()[0])
    stop_spark()
    return {"wgl_on": int(per_part["on"]), "wgl_off": int(per_part["off"]),
            "reduction": round(per_part["off"] / per_part["on"], 1)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--hosts", type=int, default=1000)
    ap.add_argument("--mega-mod", type=int, default=2)
    ap.add_argument("--mega-hits", type=int, default=1)
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=16)
    args = ap.parse_args()
    sf_dir = (f"/tmp/domcap_skew_{args.docs}_{args.hosts}"
              f"_{args.mega_hits}of{args.mega_mod}")
    build_corpus(args.docs, args.hosts, args.mega_mod, args.mega_hits,
                 sf_dir)
    rows = shuffle_rows(sf_dir)
    lo = run_level(args.lo, sf_dir)
    hi = run_level(args.hi, sf_dir)
    cks = {v[k]["checksum"] for v in (lo, hi) for k in v}
    eff = round((lo["wgl_on"]["sec"] / hi["wgl_on"]["sec"])
                / (args.hi / args.lo), 3)
    print(json.dumps({
        "docs": args.docs, "hosts": args.hosts,
        "lo_cpus": args.lo, "hi_cpus": args.hi,
        "shuffle_rows_into_host_exchange": rows,
        "lo": lo, "hi": hi,
        "wgl_on_efficiency": eff,
        "wgl_speedup_hi": round(hi["wgl_off"]["sec"]
                                / hi["wgl_on"]["sec"], 2),
        "checksums_agree": len(cks) == 1}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
