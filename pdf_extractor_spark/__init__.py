"""pdf_extractor_spark — a PySpark-native document-to-clean-text engine.

A from-scratch reimplementation of the capabilities of traagel/pdf-extractor
(reference snapshot at /root/reference) on Apache Spark:

- ``kernels/``   pure-Python per-document semantics (no Spark imports) shared by
  the vectorized pandas-UDF stages and the single-node golden generator.
- ``pipeline/``  the extraction surface: one fused ``mapInPandas`` stage over a
  Common-Crawl-style ``pages`` table, salted repartitioning, checkpoint/resume,
  per-partition lineage.
- ``queries/``   the relational surface: every SURVEY.md §2 operator plus the
  training-data pipeline ops (dedup, similarity search, temporal joins, text
  analytics, multimodal plumbing), each with a DuckDB oracle.
- ``sources/``   deterministic synthetic ``pages`` generator + readers.
- ``streaming/`` watermarked windowed aggregation and exactly-once
  foreachBatch extraction.

Typical use::

    from pdf_extractor_spark import get_spark, extract_pages
    spark = get_spark()
    pages = spark.read.parquet(".../pages")   # url, warc_ts, html, text, lang
    out = extract_pages(pages, levels=("raw", "markdown"))

or from a shell: ``python -m pdf_extractor_spark extract --input ... --output ...``
"""

from .pipeline.extract import (extract_pages, extraction_stats,  # noqa: F401
                               repartition_salted)
from .pipeline.lineage import read_failures, run_resumable  # noqa: F401
from .pipeline.sinks import read_envelopes, save_envelopes  # noqa: F401
from .session import get_spark, stop_spark  # noqa: F401

__version__ = "0.2.0"

__all__ = ["extract_pages", "extraction_stats", "repartition_salted",
           "run_resumable", "read_failures", "save_envelopes",
           "read_envelopes", "get_spark", "stop_spark"]
