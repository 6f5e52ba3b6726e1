"""Extraction-surface and multimodal queries for the driver contract.

- ``extract_docs_stats`` drives the real fused extraction pipeline
  (kernels via one mapInPandas stage) over the `documents` table
  re-shaped as a pages table — rows-only check (the per-document
  kernel chain is deliberately not re-expressed in SQL; its
  correctness gate is the golden-fixture pytest suite).
- ``multimodal_decode`` exercises the opaque-binary-column pattern:
  payload bytes → mapInPandas "decode" producing typed metadata. The
  decode itself is a deterministic stand-in (the container has no
  image/audio codecs — a real deployment swaps `_fake_decode` for the
  codec call), but the Spark-side plumbing (binary column, Arrow
  batching, schema, partitioning) is real and oracle-checked because
  the stand-in is a pure function of the byte length.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.extract import extract_pages


def q_extract_docs_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full extraction pipeline over `documents` as a pages table
    (pre-extracted-text path), rolled up per lang: the flagship
    extraction demo at driver scale."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    extracted = extract_pages(pages, levels=("lines",))
    return (
        extracted.groupBy("lang")
        .agg(F.count("*").alias("docs"),
             F.count("failure_reason").alias("failures"),
             F.sum("n_chars").alias("total_chars"),
             F.sum("n_lines").alias("total_lines"))
        .orderBy("lang")
    )


def q_extract_stats_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable twin of the flagship (VERDICT r04 #6): the SAME
    fused extraction pipeline as ``extract_docs_stats``, projected to
    the metadata-derived columns DuckDB can recompute — per-lang doc
    and failure counts. On the pre-extracted-text path the ONLY
    failure mode is a row with neither payload nor text
    (``pipeline/extract.py`` S5 contract), so the oracle recomputes
    failures from the input table alone. What this pins: the
    mapInPandas stage preserves every row (no silent drops/dupes at
    the Arrow crossing) and routes exactly the documented rows to
    ``failure_reason``. The text-derived fields (total_chars,
    total_lines) stay golden-checked via pytest — DuckDB cannot run
    the P1 normalizer."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    extracted = extract_pages(pages, levels=("lines",))
    return (
        extracted.groupBy("lang")
        .agg(F.count("*").alias("docs"),
             F.count("failure_reason").alias("failures"))
        .orderBy("lang")
    )


ORACLE_EXTRACT_COUNTS = """
SELECT lang, COUNT(*) AS docs,
       COUNT(*) FILTER (WHERE text IS NULL OR text = '') AS failures
FROM documents GROUP BY lang ORDER BY lang
"""


_DECODE_SCHEMA = ("doc_id long, media_type string, payload_bytes long, "
                  "width int, height int, n_frames int")


def _fake_decode(n_bytes: int) -> dict:
    """Deterministic stand-in for an image/audio decode: pure function
    of payload size. Swap for the real codec on a cluster with libs."""
    return {
        "media_type": "image" if n_bytes % 2 == 0 else "audio",
        "width": 64 + n_bytes % 512,
        "height": 64 + (n_bytes * 7) % 512,
        "n_frames": 1 + n_bytes % 16,
    }


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary column → typed metadata via mapInPandas. The
    payload column rides Arrow as bytes; the decode loop is batched
    (iterator form, codec init once per partition at scale)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with_payload = docs.select(
        "doc_id", F.encode("text", "utf-8").alias("payload"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # codec/library init would happen HERE, once per partition
        for batch in batches:
            rows = []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                n = len(payload)
                rec = _fake_decode(n)
                rec.update(doc_id=doc_id, payload_bytes=n)
                rows.append(rec)
            yield pd.DataFrame(rows)

    return (with_payload.mapInPandas(decode, schema=_DECODE_SCHEMA)
            .orderBy("doc_id"))


ORACLE_MULTIMODAL = """
SELECT doc_id,
       CASE WHEN octet_length(encode(text)) % 2 = 0
            THEN 'image' ELSE 'audio' END AS media_type,
       octet_length(encode(text)) AS payload_bytes,
       CAST(64 + octet_length(encode(text)) % 512 AS INT) AS width,
       CAST(64 + (octet_length(encode(text)) * 7) % 512 AS INT) AS height,
       CAST(1 + octet_length(encode(text)) % 16 AS INT) AS n_frames
FROM documents ORDER BY doc_id
"""


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame of each
    'video' payload (every 4th frame), with per-frame typed metadata.
    The frame decode is the same deterministic stand-in as
    `multimodal_decode`; the Spark shape — explode over a computed
    frame index sequence, keyed metadata per frame — is the real
    pattern a video pipeline runs, and stays fully JVM-side here."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_bytes = F.octet_length(F.encode("text", "utf-8"))
    n_frames = F.lit(1) + n_bytes % 16
    frames = docs.select(
        "doc_id", n_bytes.alias("payload_bytes"),
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(4)))
         .alias("frame_no"))
    return (
        frames.select(
            "doc_id", "frame_no",
            (F.col("frame_no") * 40).alias("ts_ms"),
            F.pmod(F.col("payload_bytes") * (F.col("frame_no") + 7), 256)
             .alias("brightness"))
        .orderBy("doc_id", "frame_no")
    )


ORACLE_FRAMES = """
WITH d AS (
  SELECT doc_id, octet_length(encode(text)) AS payload_bytes,
         1 + octet_length(encode(text)) % 16 AS n_frames
  FROM documents
)
SELECT doc_id, CAST(frame_no AS INTEGER) AS frame_no,
       CAST(frame_no * 40 AS INTEGER) AS ts_ms,
       CAST((payload_bytes * (frame_no + 7)) % 256 AS INTEGER) AS brightness
FROM d, LATERAL (SELECT unnest(generate_series(0, n_frames - 1, 4))
                 AS frame_no)
ORDER BY doc_id, frame_no
"""


_VALIDATE_SCHEMA = ("doc_id long, valid boolean, n_issues int, "
                    "total_words int, unknown_words int, "
                    "was_corrected boolean, first_issue_word string, "
                    "first_suggestion string")


def q_validation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.3 diagnostics side-output: the kernel validator (correction
    pass J1/J2, unknown-word anti-join J3, capped suggestion lookups
    J4 with the Q7 sorted-order determinism fix) over each document,
    emitted as a per-doc diagnostics row. Kernel semantics — rows-only
    check; the kernel itself is unit-tested against the reference's
    documented behavior (text_validator.py:43-124)."""
    from ..kernels import validator as kval

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, text in zip(batch["doc_id"], batch["text"]):
                r = kval.validate_text(text or "")
                issues = r.get("issues", [])
                metrics = r.get("metrics", {})
                rows.append({
                    "doc_id": doc_id,
                    "valid": bool(r.get("valid", True)),
                    "n_issues": len(issues),
                    "total_words": int(metrics.get("total_words", 0)),
                    "unknown_words": int(metrics.get("unknown_words", 0)),
                    "was_corrected": bool(metrics.get("was_corrected",
                                                      False)),
                    "first_issue_word": issues[0]["word"] if issues else None,
                    "first_suggestion": (issues[0]["suggestion"]
                                         if issues else None),
                })
            yield pd.DataFrame(rows)

    return docs.mapInPandas(run, schema=_VALIDATE_SCHEMA).orderBy("doc_id")


def q_validation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate twin of ``validation_report`` (VERDICT r03 #8): the
    KERNEL's per-doc metrics — total_words, unknown_words, the capped
    issue count, the valid verdict — pinned against an independent
    pure-SQL recomputation of the same rules: Python-`re` tokenize
    (``[^\\w\\s]``→space, lower, whitespace split, len≥3), anti-join
    against the embedded 195-word dictionary, the first-10-unknown
    cap in token order, and the prefix-2 / |len−2| suggestion-EXISTS
    rule over the sorted common words (quirk Q7).

    Contract scope, stated honestly: the oracle tokenizes the RAW
    text, so it pins the kernel on any corpus where the J1/J2
    correction pass is the identity — measured true for the driver's
    synthetic tables (0 corrected docs at sf0.01/sf0.1; ASCII, where
    Python re and RE2 agree on ``\\w``/``\\s``). The correction pass
    itself stays pinned by its own unit/golden tests and the
    rows-only ``validation_report``; what was previously unverifiable
    cross-engine — the counting, capping, and suggestion-existence
    logic — now has a hash-green oracle."""
    return (q_validation_report(spark, sf_dir)
            .select("doc_id", F.col("total_words").cast("long")
                    .alias("total_words"),
                    F.col("unknown_words").cast("long")
                    .alias("unknown_words"),
                    F.col("n_issues").cast("long").alias("n_issues"),
                    "valid")
            .orderBy("doc_id"))


def _validation_counts_oracle() -> str:
    from ..kernels.validator import (MAX_UNKNOWN_CHECKED,
                                     MIN_WORD_LENGTH)
    from ..kernels.wordcorr import (BASE_COMMON_WORDS, DOMAIN_TERMS,
                                    SORTED_COMMON_WORDS)
    vdict = ", ".join(f"('{w}')"
                      for w in sorted(BASE_COMMON_WORDS | DOMAIN_TERMS))
    cdict = ", ".join(f"('{w}')" for w in SORTED_COMMON_WORDS)
    return f"""
WITH vdict(dword) AS (VALUES {vdict}),
cdict(cword) AS (VALUES {cdict}),
base AS (
  SELECT doc_id, length(text) AS tl,
         list_filter(
           string_split_regex(
             regexp_replace(lower(text), '[^\\w\\s]', ' ', 'g'),
             '\\s+'),
           x -> x <> '' AND length(x) >= {MIN_WORD_LENGTH}) AS w
  FROM documents
), metrics AS (
  SELECT doc_id, tl, w, CAST(len(w) AS BIGINT) AS total_words,
         (tl >= 10 AND len(w) >= 3) AS scored
  FROM base
), unk AS (
  SELECT m.doc_id, m.w[i] AS uw, i
  FROM metrics m,
       LATERAL (SELECT unnest(generate_series(1, len(m.w))) AS i)
  WHERE m.scored AND m.w[i] NOT IN (SELECT dword FROM vdict)
), unk_counts AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS unknown_words
  FROM unk GROUP BY doc_id
), checked AS (
  SELECT doc_id, uw,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS rn
  FROM unk
), issues AS (
  SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_issues
  FROM checked c
  WHERE c.rn <= {MAX_UNKNOWN_CHECKED} AND length(c.uw) > 3
    AND EXISTS (SELECT 1 FROM cdict d
                WHERE substr(d.cword, 1, 2) = substr(c.uw, 1, 2)
                  AND abs(length(d.cword) - length(c.uw)) <= 2)
  GROUP BY c.doc_id
)
SELECT m.doc_id,
       CASE WHEN m.scored THEN m.total_words ELSE 0 END AS total_words,
       CASE WHEN m.scored THEN COALESCE(u.unknown_words, 0)
            ELSE 0 END AS unknown_words,
       CASE WHEN m.scored THEN COALESCE(i.n_issues, 0)
            ELSE 0 END AS n_issues,
       (NOT m.scored OR COALESCE(i.n_issues, 0) = 0) AS valid
FROM metrics m
LEFT JOIN unk_counts u ON u.doc_id = m.doc_id
LEFT JOIN issues i ON i.doc_id = m.doc_id
ORDER BY m.doc_id
"""


ORACLE_VALIDATION_COUNTS = _validation_counts_oracle()


_HEX_DIGITS = "0123456789ABCDEF"


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL feature extraction over the opaque binary payload (the
    step between decode and dedup in a media pipeline — corruption
    screening / coarse fingerprinting): the byte-NIBBLE histogram and
    its peak concentration, computed from the actual payload bytes.
    Unlike the decode stand-ins, nothing here is faked — the feature
    is a true function of the binary column.

    Byte access without a UDF: ``hex(payload)`` turns N bytes into 2N
    hex digits and each digit's count is a ``length − length(replace)``
    chain — whole-stage codegen in Spark, the identical expressions in
    DuckDB. Zero shuffle (doc-local projection + presentation sort).
    A uniform payload has peak_bp ≈ 625 (1/16); text payloads
    concentrate heavily (ASCII high nibbles 6/7) — the discriminator a
    corruption screen thresholds on."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = (docs.select(
        "doc_id", F.hex(F.encode("text", "utf-8")).alias("hx"))
        .select("doc_id", "hx", F.length("hx").alias("n2")))
    cnts = [
        (F.col("n2") - F.length(F.replace(
            F.col("hx"), F.lit(d)))).cast("long").alias(f"h{i}")
        for i, d in enumerate(_HEX_DIGITS)]
    wide = base.select("doc_id", F.col("n2").cast("long")
                       .alias("n_nibbles"), *cnts)
    return (wide
            .withColumn("peak_bp", F.expr(
                "(10000 * greatest(" + ", ".join(
                    f"h{i}" for i in range(16)) + ")) div n_nibbles"))
            .orderBy("doc_id"))


ORACLE_MM_FEATURES = f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx FROM documents
), c AS (
  SELECT doc_id, CAST(length(hx) AS BIGINT) AS n_nibbles,
         {", ".join(
             f"CAST(length(hx) - length(replace(hx, '{d}', '')) AS BIGINT)"
             f" AS h{i}" for i, d in enumerate(_HEX_DIGITS))}
  FROM b
)
SELECT doc_id, n_nibbles, {", ".join(f"h{i}" for i in range(16))},
       CAST((10000 * greatest({", ".join(f"h{i}" for i in range(16))}))
            // n_nibbles AS BIGINT) AS peak_bp
FROM c ORDER BY doc_id
"""


QUERIES = {
    "multimodal_features": (q_multimodal_features, ORACLE_MM_FEATURES),
    "extract_docs_stats": (q_extract_docs_stats, None),  # rows-only
    "extract_stats_counts": (q_extract_stats_counts, ORACLE_EXTRACT_COUNTS),
    "multimodal_decode": (q_multimodal_decode, ORACLE_MULTIMODAL),
    "multimodal_frames": (q_multimodal_frames, ORACLE_FRAMES),
    "validation_report": (q_validation_report, None),  # rows-only (kernel)
    "validation_counts": (q_validation_counts, ORACLE_VALIDATION_COUNTS),
}
