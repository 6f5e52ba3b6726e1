"""Streaming incremental dedup — the production shape of
``dedup_incremental`` (queries/dedup.py): every micro-batch of new
documents is probed against the corpus's MATERIALIZED hash and band
tables, verdicts land in a per-batch output, and only the ``new`` docs'
hashes/bands are appended to the state — so the corpus tables grow by
exactly the admitted increment and a later batch's duplicate of an
earlier batch's document is caught.

Scale/consistency posture:
- State is two parquet table families under ``state_dir`` written ONE
  SUBDIR PER BATCH ID and re-written with ``overwrite`` on retry — the
  same idempotent exactly-once pattern as ``pipeline/lineage`` and the
  streaming extract sink: a replayed micro-batch reproduces identical
  state instead of double-appending.
- The probes are KEYED joins of the batch against the state tables
  (never batch×batch or state×state pairs); per-increment work scales
  with the batch, and the state read is a parquet scan a real
  deployment would compact per snapshot (Iceberg table in the
  north-rule mapping).
- Within-batch duplicates keep the batch contract of
  ``dedup_incremental``: both copies are ``new`` relative to the
  existing corpus (the intra-batch pass is ``dedup_exact``'s job);
  state stores EVERY new doc's hash, so later batches still dedup
  against the batch's first copy (min doc_id per hash at probe time).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries.dedup import (LSH_ROWS, MINHASH_PERMS, MINHASH_PRIME,
                             _HASH_SPARK)

_HASH_SCHEMA = "th string, doc_id bigint"
_BAND_SCHEMA = "band int, band_key string, doc_id bigint"


def hash_rows(docs: DataFrame) -> DataFrame:
    """(th, doc_id) rows for the exact-dup state table."""
    return docs.select(F.md5("text").alias("th"), "doc_id")


def band_rows(docs: DataFrame) -> DataFrame:
    """(band, band_key, doc_id) rows for the near-dup state table —
    the same wide-aggregate MinHash build as ``_minhash_sigs`` (one
    token pass, map-side combined), applied to an arbitrary
    (doc_id, text) DataFrame."""
    words = (docs
             .select("doc_id", F.explode(F.expr(
                 "filter(split(text, ' '), x -> x <> '')")).alias("word"))
             .withColumn("h", _HASH_SPARK(F.col("word"))))
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_PRIME))
         .alias(f"s{j}")
        for j, (a, b) in enumerate(MINHASH_PERMS)
    ]
    wide = words.groupBy("doc_id").agg(*aggs)
    stack_args = ", ".join(f"{j}, s{j}" for j in range(len(MINHASH_PERMS)))
    sigs = wide.selectExpr(
        "doc_id",
        f"stack({len(MINHASH_PERMS)}, {stack_args}) AS (j, sig)")
    slot = lambda k: F.max(F.when(F.col("j") % LSH_ROWS == k,
                                  F.col("sig")))
    return (sigs
            .withColumn("band", F.floor(F.col("j") / LSH_ROWS)
                        .cast("int"))
            .groupBy("doc_id", "band")
            .agg(F.concat_ws("-", slot(0).cast("string"),
                             slot(1).cast("string"),
                             slot(2).cast("string"),
                             slot(3).cast("string")).alias("band_key"))
            .select("band", "band_key", "doc_id"))


def probe(batch: DataFrame, ex_hash: DataFrame,
          ex_bands: DataFrame) -> DataFrame:
    """One verdict row per batch doc against the state tables
    (precedence exact > near, representative = min existing match) —
    the exact verdict contract of ``q_dedup_incremental``."""
    exh = ex_hash.groupBy("th").agg(F.min("doc_id").alias("ex_min"))
    exb = ex_bands.groupBy("band", "band_key") \
        .agg(F.min("doc_id").alias("ex_min"))
    exact = (hash_rows(batch).join(exh, "th")
             .groupBy("doc_id").agg(F.min("ex_min").alias("exact_rep")))
    near = (band_rows(batch).join(exb, ["band", "band_key"])
            .groupBy("doc_id").agg(F.min("ex_min").alias("near_rep")))
    return (batch.select("doc_id")
            .join(exact, "doc_id", "left").join(near, "doc_id", "left")
            .select("doc_id",
                    F.when(F.col("exact_rep").isNotNull(),
                           F.lit("exact_dup"))
                    .when(F.col("near_rep").isNotNull(),
                          F.lit("near_dup"))
                    .otherwise(F.lit("new")).alias("verdict"),
                    F.coalesce("exact_rep", "near_rep")
                    .alias("representative")))


def _state(spark, state_dir: str, family: str, schema: str,
           before_batch: int) -> DataFrame:
    """State as of batches STRICTLY BEFORE ``before_batch``. A replayed
    micro-batch (foreachBatch retry after a failure that already wrote
    some of batch N's own hash/band output) must NOT probe against its
    own leftover rows — otherwise genuinely-new docs flip to
    exact_dup/near_dup with themselves and the overwritten state drops
    them, breaking idempotency (ADVICE r04)."""
    path = os.path.join(state_dir, family)
    subdirs = []
    if os.path.isdir(path):
        for d in os.listdir(path):
            if not d.startswith("batch="):
                continue
            try:
                if int(d.split("=", 1)[1]) < before_batch:
                    subdirs.append(os.path.join(path, d))
            except ValueError:
                continue
    if not subdirs:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*subdirs)


def incremental_dedup_stream(stream_docs: DataFrame, state_dir: str,
                             checkpoint_dir: str):
    """Wire a streaming (doc_id, text, ...) source into the
    incremental-dedup state machine; returns the started query.
    Verdicts land in ``{state_dir}/verdicts/batch=N``; admitted docs'
    hash/band rows in ``{state_dir}/{hash,bands}/batch=N``."""
    def handle(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.localCheckpoint()  # probed by 3 consumers
        ex_hash = _state(spark, state_dir, "hash", _HASH_SCHEMA, batch_id)
        ex_bands = _state(spark, state_dir, "bands", _BAND_SCHEMA,
                          batch_id)
        verdicts = probe(batch, ex_hash, ex_bands).localCheckpoint()
        verdicts.write.mode("overwrite").parquet(
            f"{state_dir}/verdicts/batch={batch_id}")
        new_docs = batch.join(
            verdicts.filter("verdict = 'new'").select("doc_id"),
            "doc_id", "left_semi")
        hash_rows(new_docs).write.mode("overwrite").parquet(
            f"{state_dir}/hash/batch={batch_id}")
        band_rows(new_docs).write.mode("overwrite").parquet(
            f"{state_dir}/bands/batch={batch_id}")

    return (stream_docs.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())
