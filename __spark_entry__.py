"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship fused-extraction query on sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator registry
(pdf_extractor_spark.queries) — one entry per implemented SURVEY.md §2
mapping plus the training-data pipeline ops (dedup / similarity /
text-analysis / multimodal).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pdf_extractor_spark import queries as q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the fused extraction pipeline (detect → parse →
    normalize → line level) over sf0.001 documents, rolled up per
    lang. Exercises the mapInPandas kernel chain end-to-end."""
    return q.extraction.q_extract_docs_stats(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 and the
    training-data pipeline surface. Each callable takes
    (spark, sf_dir) and returns a DataFrame with oracle-matched
    column names."""
    return q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted only for the
    non-SQL-expressible fused-extraction pipeline, which is golden-
    checked by pytest instead)."""
    return q.oracle_sql()
