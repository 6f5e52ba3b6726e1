"""SparkSession construction with the engine's scale defaults.

Every knob here is a 100-TB posture choice, tested locally:
- AQE on (runtime re-plan, skew-join splitting) — the second line of
  defense behind explicit salted repartitioning (SURVEY.md §4).
- Arrow on for all pandas-UDF exchange; batch size capped so multi-MB
  ``html`` payloads cannot blow Python-worker memory (§7.3.6).
- shuffle partitions default to the local core count; on a real cluster
  AQE coalesces from a deliberately high initial number.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

from pyspark.sql import SparkSession

ARROW_MAX_RECORDS = 256  # bound per-batch memory for binary payload columns


def get_spark(app_name: str = "pdf-extractor-spark",
              master: Optional[str] = None,
              shuffle_partitions: Optional[int] = None,
              extra: Optional[Dict[str, str]] = None) -> SparkSession:
    """Build (or fetch) the configured session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; under
    spark-submit the submitted master wins (we never override a running
    session's master).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(ARROW_MAX_RECORDS))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    """Stop the active session (used by the bench harness to switch
    parallelism levels between runs)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
