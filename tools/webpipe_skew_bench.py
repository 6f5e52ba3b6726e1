"""Skew-adversarial scaling bench for the COMPOSED web_pipeline
(VERDICT r04 #7).

The 30%-one-host adversary was measured for extraction and domain_cap
but never for the composed canonicalize → recrawl-collapse → host-quota
chain. Corpus: 2M captures, one mega-host holding ~30% of them as a
RECRAWL FLOOD (8 captures/url, ~87.5% unchanged bytes — the regime the
plan's "unchanged recaptures bypass the host-quota shuffle" claim is
about), the rest spread over 2000 hosts at 2 captures/url with ~50%
changed. Deterministic, pure-SQL synthesis (no Python workers).

Also measured: the ALL-CHANGED variant on the same key layout — every
capture survives to the quota window, so the mega-host's share lands in
ONE window partition. That is the composed pipeline's honest worst
case; reporting it keeps the two-exchange claim falsifiable.

Usage: python tools/webpipe_skew_bench.py [--captures 2000000]
           [--lo 4 --hi 16] [--reps 3]
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

MEGA_HOST = "mega.example.com"


def build_captures(path: str, n: int) -> None:
    """~30% of captures on one host as an 8-captures/url recrawl flood
    (content changes only every 8th capture); the rest 2 captures/url
    over 2000 hosts, alternating changed bytes."""
    if os.path.exists(path):
        return
    from pdf_extractor_spark.session import get_spark, stop_spark
    spark = get_spark("webpipe-corpus", extra={
        "spark.ui.showConsoleProgress": "false"})
    n_mega = int(n * 0.3)
    mu = n_mega // 8  # mega urls: 8 captures each (id div mu = capture#)
    mega = spark.range(n_mega).selectExpr(
        f"concat('https://{MEGA_HOST}/page/', "
        f"cast(id % {mu} as string), '.html') AS url",
        "timestamp_seconds(1750000000 + id) AS warc_ts",
        # revision bumps once mid-stream: captures 0-3 rev 0, 4-7 rev 1
        # -> 2 changed + 6 byte-identical recaptures per url
        f"concat('mega body ', cast(id % {mu} as string), ' rev ', "
        f"cast((id div {mu}) div 4 as string)) AS text")
    n_rest = n - n_mega
    ru = n_rest // 2  # rest urls: 2 captures each over 2000 hosts
    rest = spark.range(n_rest).selectExpr(
        f"concat('https://host-', cast(id % 2000 as string), "
        f"'.example.org/doc/', cast(id % {ru} as string)) AS url",
        "timestamp_seconds(1750000000 + id) AS warc_ts",
        # odd urls change bytes on recapture, even urls do not
        f"concat('body ', cast(id % {ru} as string), ' rev ', "
        f"cast((id div {ru}) * ((id % {ru}) % 2) as string)) AS text")
    mega.unionByName(rest).repartition(128) \
        .write.parquet(f"{path}/pages.parquet")
    stop_spark()


def run_level(cpus: int, path: str, reps: int) -> dict:
    from pyspark.sql import functions as F

    from pdf_extractor_spark.queries.webcur import curate_pages
    from pdf_extractor_spark.session import get_spark, stop_spark
    spark = get_spark(f"webpipe-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus * 2, 8),
                      extra={"spark.ui.showConsoleProgress": "false"})
    pages = spark.read.parquet(f"{path}/pages.parquet")
    pages.count()  # page-cache + session warm
    out = {}
    for name, src in (
            ("recrawl_flood", pages),
            # all-changed adversary: every capture's bytes unique, so
            # nothing bypasses the host-quota window
            ("all_changed", pages.withColumn(
                "text", F.concat_ws(" ", "text", F.col("warc_ts")
                                    .cast("string"))))):
        thunk = lambda: curate_pages(src).agg(  # noqa: E731
            F.count("*").alias("rows"),
            F.bit_xor(F.xxhash64("canonical_url", "capture_rank",
                                 "verdict")).alias("ck")).collect()[0]
        thunk()  # warm
        runs, row = [], None
        for _ in range(reps):
            t0 = time.time()
            row = thunk()
            runs.append(round(time.time() - t0, 2))
        out[name] = {"sec": statistics.median(runs), "runs": runs,
                     "rows": row["rows"], "checksum": row["ck"]}
        print(f"local[{cpus}] {name}: median {out[name]['sec']}s "
              f"runs {runs} ck={row['ck']}", file=sys.stderr, flush=True)
    stop_spark()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--captures", type=int, default=2_000_000)
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    path = f"/tmp/webpipe_skew_{args.captures}"
    build_captures(path, args.captures)

    lo = run_level(args.lo, path, args.reps)
    hi = run_level(args.hi, path, args.reps)
    result = {"metric": "composed web_pipeline on 30%-mega-host corpus",
              "captures": args.captures,
              "lo_cpus": args.lo, "hi_cpus": args.hi}
    for name in lo:
        assert lo[name]["checksum"] == hi[name]["checksum"], name
        eff = (lo[name]["sec"] / hi[name]["sec"]) / (args.hi / args.lo)
        result[name] = {"lo_sec": lo[name]["sec"],
                        "hi_sec": hi[name]["sec"],
                        "rows": lo[name]["rows"],
                        "efficiency": round(eff, 3)}
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
