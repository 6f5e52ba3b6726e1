"""Relational query surface — the driver-checkable operator registry.

Each entry maps a SURVEY.md §2 operator (or a training-data pipeline
operation) to an idiomatic-Spark implementation plus an ANSI-SQL oracle
that DuckDB runs on the same parquet tables. The registry feeds
``__spark_entry__.queries()`` / ``oracle_sql()``.

Registry shape: ``name -> (fn(spark, sf_dir) -> DataFrame, oracle_sql | None)``.
``None`` oracle ⇒ rows-only check (non-SQL-expressible op).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

from . import (curation, dedup, extraction, mdvalidate, relational,
               search, simsearch, temporal, textstats, webcur, webgraph)

QueryFn = Callable[[SparkSession, str], DataFrame]

# Module order IS the driver-visible order: the correctness driver checks the
# first 50 registry entries, so the newest / least-historied modules go first
# and the long-green relational demos absorb the >50 overflow (every relational
# query has a hash-green row in CORRECTNESS_r01/r02; the tail is additionally
# re-verified each round via ``tools/check_oracles.py``).
REGISTRY: Dict[str, Tuple[QueryFn, Optional[str]]] = {}
for mod in (extraction, mdvalidate, webcur, webgraph, search, curation,
            dedup, simsearch, textstats, temporal, relational):
    overlap = set(REGISTRY) & set(mod.QUERIES)
    if overlap:
        raise ValueError(f"duplicate query names: {sorted(overlap)}")
    REGISTRY.update(mod.QUERIES)


def queries() -> Dict[str, QueryFn]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> Dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items()
            if sql is not None}
