"""Measured recall of the MinHash-LSH candidate graph vs exact Jaccard.

The star-edge LSH rewrite (queries/dedup.py::q_dedup_minhash_lsh) is
the scale path for near-dedup; this tool quantifies what it trades
away.  Ground truth: exact token-set Jaccard over all pairs, computed
via a posting-list self-join (no DF cap, no sketch).  A true pair
counts as RECALLED if both docs land in the same connected component
of the star-edge graph — component co-membership is what dedup
actually consumes, and the star construction preserves per-bucket
components exactly, so this measures only the SKETCH loss (16-slot
MinHash + 4×4 banding), not the star rewrite.

Reports recall per Jaccard bucket against the theoretical banding
S-curve P(candidate) = 1 - (1 - s^4)^4 at the bucket midpoint.

Usage: python tools/lsh_recall_eval.py [--corpus /tmp/dedup_scale_f2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BUCKETS = [(0.3, 0.5), (0.5, 0.7), (0.7, 0.9), (0.9, 1.01)]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/dedup_scale_f2",
                    help="dir holding documents.parquet (near-dup-rich)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pdf_extractor_spark.queries.dedup import q_dedup_minhash_lsh
    from pdf_extractor_spark.session import get_spark
    spark = get_spark("lsh-recall", master="local[16]",
                      extra={"spark.ui.showConsoleProgress": "false"})

    docs = spark.read.parquet(f"{args.corpus}/documents.parquet")
    n_docs = docs.count()

    # Exact pairwise token-set Jaccard via posting lists (words, the
    # same token universe the MinHash signatures hash).
    words = (docs.select("doc_id",
                         F.explode(F.split("text", " ")).alias("word"))
             .filter(F.col("word") != "").distinct())
    sizes = words.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = words.alias("a"), words.alias("b")
    inter = (a.join(b, (F.col("a.word") == F.col("b.word"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("da"),
                      F.col("b.doc_id").alias("db"))
             .agg(F.count("*").alias("i")))
    truth = (inter
             .join(sizes.select(F.col("doc_id").alias("da"),
                                F.col("n").alias("na")), "da")
             .join(sizes.select(F.col("doc_id").alias("db"),
                                F.col("n").alias("nb")), "db")
             .withColumn("j", F.col("i")
                         / (F.col("na") + F.col("nb") - F.col("i")))
             .filter(F.col("j") >= BUCKETS[0][0])
             .select("da", "db", "j")
             .localCheckpoint(eager=True))

    # Connected components of the star-edge graph (min-label
    # propagation until no label changes).
    edges = (q_dedup_minhash_lsh(spark, args.corpus)
             .select("doc_a", "doc_b").localCheckpoint(eager=True))
    lab = (docs.select("doc_id").distinct()
           .withColumn("lab", F.col("doc_id")))
    sym = edges.union(edges.select(F.col("doc_b").alias("doc_a"),
                                   F.col("doc_a").alias("doc_b")))
    while True:
        nxt = (sym.join(lab, sym.doc_b == lab.doc_id)
               .groupBy(F.col("doc_a").alias("doc_id"))
               .agg(F.min("lab").alias("nlab")))
        merged = (lab.join(nxt, "doc_id", "left")
                  .select("doc_id",
                          F.least("lab", F.coalesce("nlab", "lab"))
                          .alias("lab"))
                  .localCheckpoint(eager=True))
        changed = (merged.alias("m").join(lab.alias("l"), "doc_id")
                   .filter(F.col("m.lab") != F.col("l.lab")).count())
        lab = merged
        if changed == 0:
            break

    la = lab.select(F.col("doc_id").alias("da"), F.col("lab").alias("ca"))
    lb = lab.select(F.col("doc_id").alias("db"), F.col("lab").alias("cb"))

    # Direct banding candidates (pre-star): docs sharing any band key.
    # This is the textbook S-curve event; component co-membership above
    # it adds transitive recovery.
    from pdf_extractor_spark.queries.dedup import LSH_ROWS, _minhash_sigs
    sigs = _minhash_sigs(spark, args.corpus) \
        .withColumn("band", F.floor(F.col("j") / LSH_ROWS).cast("int"))
    slot = lambda k: F.max(F.when(F.col("j") % LSH_ROWS == k, F.col("sig")))
    bands = (sigs.groupBy("doc_id", "band")
             .agg(F.concat_ws("-", slot(0).cast("string"),
                              slot(1).cast("string"), slot(2).cast("string"),
                              slot(3).cast("string")).alias("band_key")))
    ba, bb = bands.alias("ba"), bands.alias("bb")
    cand = (ba.join(bb, (F.col("ba.band") == F.col("bb.band"))
                    & (F.col("ba.band_key") == F.col("bb.band_key"))
                    & (F.col("ba.doc_id") < F.col("bb.doc_id")))
            .select(F.col("ba.doc_id").alias("da"),
                    F.col("bb.doc_id").alias("db"))
            .distinct()
            .withColumn("direct", F.lit(1)))

    scored = (truth.join(la, "da").join(lb, "db")
              .join(cand, ["da", "db"], "left")
              .withColumn("hit", (F.col("ca") == F.col("cb")).cast("int"))
              .withColumn("direct", F.coalesce("direct", F.lit(0))))

    out = {"corpus": args.corpus, "n_docs": n_docs, "buckets": {}}
    for lo, hi in BUCKETS:
        row = (scored.filter((F.col("j") >= lo) & (F.col("j") < hi))
               .agg(F.count("*").alias("n"), F.sum("hit").alias("hits"),
                    F.sum("direct").alias("direct"))
               .collect()[0])
        mid = (lo + min(hi, 1.0)) / 2
        theory = 1 - (1 - mid ** 4) ** 4
        out["buckets"][f"[{lo},{min(hi, 1.0)})"] = {
            "true_pairs": row["n"],
            "direct_band_recall": round((row["direct"] or 0) / row["n"], 3)
            if row["n"] else None,
            "component_recall": round((row["hits"] or 0) / row["n"], 3)
            if row["n"] else None,
            "theory_scurve_mid": round(theory, 3),
        }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
