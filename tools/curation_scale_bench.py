"""Scaling evidence for the round-3 curation operators.

Two stress corpora, both deterministic-seeded and built once under
/tmp:

- documents: the same K×-replicated sf0.1 corpus the dedup scale bench
  uses (each replica near- but not exact-duplicate) — drives
  ngram_repetition / gopher_quality_filter / pack_sequences /
  temperature_sample;
- embeddings: N vectors around C cluster centers (C grows with N —
  the SemDeDup deployment shape: per-cluster size stays bounded as the
  corpus grows, so the within-cluster pair join stays linear-ish) —
  drives semantic_dedup.

For pack_sequences the bench also times the NAIVE single global
window (every row through one task) against the shipped hierarchical
prefix sum on the same input — the measured reason the hierarchy
exists.

Usage: python tools/curation_scale_bench.py [--factor 100]
           [--vectors 50000] [--clusters 250] [--lo 4 --hi 16]
Per-level JSON to stdout; results folded into BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dedup_scale_bench import build_corpus  # noqa: E402  (same dir)


def build_embeddings(n: int, clusters: int, path: str) -> None:
    if os.path.exists(path):
        return
    import numpy as np
    import pandas as pd

    from pdf_extractor_spark.session import get_spark, stop_spark

    spark = get_spark("emb-corpus", extra={
        "spark.ui.showConsoleProgress": "false"})

    def gen(batches):
        rng_c = np.random.default_rng(12345)
        cent = rng_c.normal(size=(clusters, 64))
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            labels = (ids % clusters).astype("int32")
            rng = np.random.default_rng(int(ids[0]) + 1)
            vecs = cent[labels] + 0.35 * rng.normal(size=(len(ids), 64))
            yield pd.DataFrame({
                "vec_id": ids,
                "embedding": list(vecs.astype("float32")),
                "label": labels,
            })

    (spark.range(n).repartition(32)
     .mapInPandas(gen, "vec_id long, embedding array<float>, label int")
     .write.parquet(f"{path}/embeddings.parquet"))
    stop_spark()


def naive_pack(tok):
    """The rejected design: ONE unpartitioned running-sum window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.orderBy("doc_id") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return tok.withColumn(
        "start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens"))


def doc_tok(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from pdf_extractor_spark.queries.curation import _W_EXPR
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", F.expr(_W_EXPR).alias("w"))
            .select("doc_id", F.size("w").cast("long").alias("n_tokens")))


def synth_tok(spark, n: int):
    """(doc_id, n_tokens) at arbitrary row count — isolates the
    prefix-sum comparison from text tokenization cost."""
    from pyspark.sql import functions as F
    return (spark.range(n).repartition(64)
            .select(F.col("id").alias("doc_id"),
                    (F.lit(20) + F.col("id") % 80).cast("long")
                    .alias("n_tokens")))


def run_level(cpus: int, docs_dir: str, emb_dir: str,
              include_naive: bool, only=None,
              pack_rows: int = 0) -> dict:
    from pdf_extractor_spark.queries import curation as cu
    from pdf_extractor_spark.session import get_spark, stop_spark

    spark = get_spark(f"curation-bench-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus * 2, 8),
                      extra={"spark.ui.showConsoleProgress": "false"})
    out = {}

    def timed(name, thunk):
        from pyspark.sql import functions as F

        if only and name not in only:
            return

        # Force EVERY output column (count() alone lets Catalyst prune
        # an unused Window/projection — which is exactly what the naive
        # global-window comparison must not be allowed to skip).
        df = thunk()
        t0 = time.time()
        row = df.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(" + ", ".join(df.columns) + "))")
             .alias("chk")).collect()[0]
        out[name] = {"sec": round(time.time() - t0, 2), "rows": row.n}
        print(f"local[{cpus}] {name}: {row.n} rows {out[name]['sec']}s",
              file=sys.stderr, flush=True)

    timed("ngram_repetition",
          lambda: cu.q_ngram_repetition(spark, docs_dir))
    timed("gopher_quality_filter",
          lambda: cu.q_gopher_quality_filter(spark, docs_dir))
    timed("pack_sequences",
          lambda: cu.q_pack_sequences(spark, docs_dir))
    if include_naive:
        timed("pack_sequences_naive_global_window",
              lambda: naive_pack(doc_tok(spark, docs_dir)))
    if pack_rows:
        label = f"{pack_rows // 1_000_000}M"
        timed(f"pack_offsets_hier_{label}",
              lambda: cu.pack_offsets(synth_tok(spark, pack_rows)))
        timed(f"pack_offsets_naive_{label}",
              lambda: naive_pack(synth_tok(spark, pack_rows)))
    timed("temperature_sample",
          lambda: cu.q_temperature_sample(spark, docs_dir))
    timed("boilerplate_strip",
          lambda: cu.q_boilerplate_strip(spark, docs_dir))
    timed("semantic_dedup",
          lambda: cu.q_semantic_dedup(spark, emb_dir))
    stop_spark()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--vectors", type=int, default=50_000)
    ap.add_argument("--clusters", type=int, default=250)
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=16)
    ap.add_argument("--skip-naive", action="store_true")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--pack-rows", type=int, default=0)
    args = ap.parse_args()

    docs_dir = f"/tmp/dedup_scale_f{args.factor}"
    emb_dir = f"/tmp/emb_scale_n{args.vectors}_c{args.clusters}"
    build_corpus(args.factor, docs_dir)
    build_embeddings(args.vectors, args.clusters, emb_dir)

    lo = run_level(args.lo, docs_dir, emb_dir, not args.skip_naive,
                   args.only, args.pack_rows)
    hi = run_level(args.hi, docs_dir, emb_dir, not args.skip_naive,
                   args.only, args.pack_rows)
    report = {"factor": args.factor, "docs": 5000 * args.factor,
              "vectors": args.vectors, "clusters": args.clusters,
              "lo_cpus": args.lo, "hi_cpus": args.hi, "queries": {}}
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
