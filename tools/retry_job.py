"""Task-retry determinism job (VERDICT r04 #5), driven by
tests/test_retry_determinism.py.

Runs the checkpoint/lineage resumable extraction over a deterministic
synthetic corpus on ``local[4,4]`` (4 threads, spark.task.maxFailures=4
— the second bracket arg) and prints ONE JSON line with a canonical
digest of the output: sha256 over the sorted (url, text) byte pairs,
plus lineage row sums. The parent test runs it twice — once with
PDFX_RETRY_FAULT=1 in the env (attempt 0 of EVERY fused-stage task
dies after its first Arrow batch) and once clean — and asserts the
digests and lineage counts are identical: per-document capture into
``failure_reason`` (reference pdf_extractor.py:73-81) plus Spark's
task-level re-execution must yield exactly-once, byte-identical output.
"""

import hashlib
import json
import sys

from pyspark.sql import SparkSession


def main(out_dir: str) -> int:
    spark = (SparkSession.builder.master("local[4,4]")
             .appName("retry-determinism")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    sys.path.insert(0, "/root/repo")
    from pdf_extractor_spark.pipeline import lineage as lin
    from pdf_extractor_spark.sources.pages import synth_pages_df

    pages = synth_pages_df(spark, n=3000, seed=11, partitions=6)
    ran = lin.run_resumable(spark, pages, out_dir, snapshot_id=0,
                            num_batches=3)

    data = spark.read.parquet(f"{out_dir}/data").select("url", "text")
    rows = sorted((r.url, r.text or "") for r in data.collect())
    h = hashlib.sha256()
    for url, text in rows:
        h.update(url.encode())
        h.update(b"\x00")
        h.update(text.encode())
        h.update(b"\x01")
    lineage = lin.read_lineage(spark, out_dir)
    agg = lineage.groupBy().sum("rows_in", "rows_out",
                                "failure_count").collect()[0]
    print(json.dumps({
        "batches_ran": ran,
        "n_rows": len(rows),
        "digest": h.hexdigest(),
        "rows_in": agg[0], "rows_out": agg[1], "failures": agg[2],
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1]))
