"""Spark pipeline tests: golden byte-identity, determinism under
repartitioning, failure capture, resume/lineage (SURVEY.md §5.2)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.pipeline.extract import (
    LEVELS,
    extract_pages,
    extraction_stats,
    repartition_salted,
)
from pdf_extractor_spark.pipeline import lineage as lin
from pdf_extractor_spark.sources.pages import (
    build_pages_records,
    synth_pages_df,
)
from tools.make_goldens import GOLDEN_N, GOLDEN_SEED, OUT_DIR, url_hash

pytestmark = pytest.mark.spark


def _load_goldens():
    with open(os.path.join(OUT_DIR, "_index.json"), encoding="utf-8") as f:
        index = json.load(f)
    goldens = {}
    for h, url in index.items():
        with open(os.path.join(OUT_DIR, f"{h}.json"), encoding="utf-8") as f:
            goldens[url] = json.load(f)
    return goldens


class TestGoldenIdentity:
    def test_spark_matches_goldens_byte_identical(self, spark):
        goldens = _load_goldens()
        pages = synth_pages_df(spark, GOLDEN_N, seed=GOLDEN_SEED, partitions=7)
        rows = extract_pages(pages, levels=LEVELS).collect()
        assert len(rows) == GOLDEN_N
        for r in rows:
            g = goldens[r.url]
            assert r.failure_reason is None, (r.url, r.failure_reason)
            assert r.text == g["text"], f"raw text mismatch for {r.url}"
            assert r.lines_json == g["lines_json"], r.url
            assert r.chapters_json == g["chapters_json"], r.url
            assert r.processed_json == g["processed_json"], r.url
            assert r.markdown == g["markdown"], r.url

    def test_all_content_classes_covered(self):
        goldens = _load_goldens()
        classes = {u.split("/docs/")[1].split("/")[0] for u in goldens}
        assert len(classes) == 9

    def test_goldens_have_no_failures(self):
        assert all(g["failure_reason"] is None
                   for g in _load_goldens().values())


class TestDeterminism:
    def test_partition_count_invariance(self, spark):
        """Same input at 2 and 32 partitions → identical (url, text) bytes
        (FIXTURES.md §5, SURVEY §5.2.5)."""
        def run(parts):
            pages = synth_pages_df(spark, 60, partitions=parts)
            out = extract_pages(repartition_salted(pages, parts),
                                levels=("raw",))
            return sorted((r.url, r.text) for r in out.collect())

        assert run(2) == run(32)

    def test_executor_vs_driver_generation_identical(self, spark):
        """sources: executor-side mapInPandas generation == driver pandas."""
        driver = {r["url"]: r["html"] for r in build_pages_records(30)}
        dist = {r.url: bytes(r.html)
                for r in synth_pages_df(spark, 30, partitions=5).collect()}
        assert driver == dist


class TestFailureCapture:
    def test_poison_rows_become_failure_reason(self, spark):
        rows = [
            ("https://x.example/ok.html", None,
             b"<html><body><p>A perfectly fine paragraph of content here.</p></body></html>",
             None, "en"),
            ("https://x.example/bad.pdf", None, b"%PDF-1.4 garbage", None, "en"),
            ("https://x.example/empty.bin", None, b"", None, "en"),
        ]
        df = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, text string, lang string")
        out = {r.url: r for r in extract_pages(df).collect()}
        assert out["https://x.example/ok.html"].failure_reason is None
        assert "PdfParseError" in out["https://x.example/bad.pdf"].failure_reason
        assert out["https://x.example/empty.bin"].failure_reason is not None
        assert out["https://x.example/empty.bin"].doctype == "empty"

    def test_wet_pretext_fallback(self, spark):
        df = spark.createDataFrame(
            [("https://x.example/wet.txt", None, None,
              "Pre extracted text. Already clean.", "en")],
            "url string, warc_ts timestamp, html binary, text string, lang string")
        r = extract_pages(df).collect()[0]
        assert r.failure_reason is None
        assert r.text == "Pre extracted text.\nAlready clean."


class TestStatsAndPlan:
    def test_extraction_stats_rollup(self, spark):
        pages = synth_pages_df(spark, 40, partitions=4)
        stats = extraction_stats(extract_pages(pages)).collect()
        by_type = {r.doctype: r for r in stats}
        assert by_type["html"].docs == 20 and by_type["pdf"].docs == 20
        assert by_type["html"].failures == 0

    def test_salted_repartition_spreads_hot_domain(self, spark):
        pages = synth_pages_df(spark, 300, partitions=4, skew_frac=0.5)
        parts = (repartition_salted(pages, 12)
                 .withColumn("pid", F.spark_partition_id())
                 .groupBy("pid").count().collect())
        counts = [r["count"] for r in parts]
        assert len(counts) == 12
        assert max(counts) <= 2.5 * (sum(counts) / len(counts))


class TestResumeLineage:
    def test_resume_processes_only_remainder(self, spark, tmp_path):
        out_dir = str(tmp_path / "out")
        pages = synth_pages_df(spark, 80, partitions=4)
        first = lin.run_resumable(spark, pages, out_dir, snapshot_id=7,
                                  num_batches=6, max_batches=2)
        assert len(first) == 2
        second = lin.run_resumable(spark, pages, out_dir, snapshot_id=7,
                                   num_batches=6)
        assert sorted(first + second) == list(range(6))
        # Exactly-once: output rows equal input rows, no duplicates.
        out = lin.read_output(spark, out_dir)
        assert out.count() == 80
        assert out.select("url").distinct().count() == 80

    def test_rerun_after_completion_is_noop(self, spark, tmp_path):
        out_dir = str(tmp_path / "out")
        pages = synth_pages_df(spark, 30, partitions=2)
        lin.run_resumable(spark, pages, out_dir, snapshot_id=1, num_batches=3)
        again = lin.run_resumable(spark, pages, out_dir, snapshot_id=1,
                                  num_batches=3)
        assert again == []
        assert lin.read_output(spark, out_dir).count() == 30

    def test_lineage_rows_account_for_all_input(self, spark, tmp_path):
        out_dir = str(tmp_path / "out")
        pages = synth_pages_df(spark, 40, partitions=2)
        lin.run_resumable(spark, pages, out_dir, snapshot_id=3, num_batches=4)
        lineage = lin.read_lineage(spark, out_dir)
        agg = lineage.agg(F.sum("rows_in").alias("rin"),
                          F.sum("rows_out").alias("rout")).collect()[0]
        assert agg.rin == 40 and agg.rout == 40

    def test_high_failure_batch_goes_to_failures_table(self, spark,
                                                       tmp_path):
        """VERDICT r01 #3: a batch where EVERY row fails must land its
        per-url failure rows in the failures parquet table via a
        DataFrame write — lineage keeps only counts (no array<struct>
        materialized on the driver)."""
        out_dir = str(tmp_path / "out")
        n = 50
        rows = [(f"https://x.example/poison/{i:04d}.pdf", None,
                 b"%PDF-1.4 garbage", None, "en") for i in range(n)]
        pages = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, "
                  "text string, lang string")
        lin.run_resumable(spark, pages, out_dir, snapshot_id=9,
                          num_batches=4)
        failures = lin.read_failures(spark, out_dir)
        assert failures.count() == n
        # basePath read surfaces the batch partition key (ADVICE r02)
        assert set(failures.columns) == {"url", "reason", "batch"}
        assert failures.select("batch").distinct().count() >= 1
        assert failures.filter(
            F.col("reason").contains("PdfParseError")).count() == n
        lineage = lin.read_lineage(spark, out_dir)
        assert "failures" not in lineage.columns  # counts only
        agg = lineage.agg(F.sum("failure_count").alias("fc"),
                          F.sum("rows_out").alias("rout")).collect()[0]
        assert agg.fc == n and agg.rout == 0
        # successful-output table holds nothing for the poison batch
        assert lin.read_output(spark, out_dir).count() == 0


@pytest.mark.spark
def test_output_table_partition_pruning(spark, tmp_path):
    """The batch-partitioned output table must prune partitions on a
    batch filter — the local-parquet analog of Iceberg partition
    pruning the lineage module's docstring promises (one scan per
    batch at 10^12 rows)."""
    out_dir = str(tmp_path / "out")
    pages = synth_pages_df(spark, 40, partitions=2)
    lin.run_resumable(spark, pages, out_dir, snapshot_id=5, num_batches=4)
    df = lin.read_output(spark, out_dir).filter(F.col("batch") == 2)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "batch" in m.group(1), plan
    # and the pruned read returns exactly that batch's rows
    assert df.count() == lin.read_output(spark, out_dir) \
        .filter(F.col("batch") == 2).count()
    assert set(r.batch for r in df.select("batch").distinct().collect()) \
        == {2}


@pytest.mark.spark
def test_extract_resumable_cli_resumes(spark, tmp_path):
    """CLI wiring over run_resumable: first invocation processes all
    batches, the identical re-run is a no-op (exactly-once output)."""
    from pdf_extractor_spark.__main__ import main as cli_main

    src = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    synth_pages_df(spark, 24, partitions=2).write.parquet(src)
    argv = ["extract-resumable", "--input", src, "--output", out,
            "--batches", "3"]
    assert cli_main(argv) == 0
    assert lin.read_output(spark, out).count() == 24
    assert cli_main(argv) == 0  # resume: nothing left to do
    assert lin.read_output(spark, out).count() == 24
    assert lin.read_output(spark, out).select("url").distinct().count() == 24


@pytest.mark.spark
def test_curate_cli_writes_kept_and_audit(spark, tmp_path):
    """CLI wiring over curate_pages: audit covers every capture, the
    kept table is exactly the verdict='kept' subset of the source."""
    from pdf_extractor_spark.__main__ import main as cli_main

    src = str(tmp_path / "pages")
    out = str(tmp_path / "cur")
    synth_pages_df(spark, 60, partitions=2).write.parquet(src)
    argv = ["curate", "--input", src, "--output", out, "--host-cap", "4"]
    assert cli_main(argv) == 0
    audit = spark.read.parquet(f"{out}/audit")
    kept = spark.read.parquet(f"{out}/kept")
    assert audit.count() == 60
    assert audit.select("url").distinct().count() == 60
    kept_urls = {r.url for r in
                 audit.filter("verdict = 'kept'").collect()}
    assert {r.url for r in kept.select("url").collect()} == kept_urls
    # the cap binds per host on this skewed corpus
    per_host = (audit.filter("verdict = 'kept'")
                .groupBy("host").count().collect())
    assert per_host and all(r["count"] <= 4 for r in per_host)


@pytest.mark.spark
def test_curate_cli_recaptures_do_not_leak(spark, tmp_path):
    """ADVICE r03 (high): the audit is per-capture (url, warc_ts); a
    url recaptured with unchanged text has one kept row AND one
    unchanged_recrawl row. The kept corpus must contain ONLY the kept
    captures — with the old url-only semi-join every recapture of a
    kept url leaked in."""
    import datetime as dt

    from pdf_extractor_spark.__main__ import main as cli_main

    def ts(h):
        return dt.datetime(2025, 1, 1, h)

    rows = []
    for i in range(8):
        url = f"https://site{i % 2}.example/page{i}"
        rows.append((url, ts(1), None, f"body {i}", "en"))
        rows.append((url, ts(2), None, f"body {i}", "en"))   # unchanged
        rows.append((url, ts(3), None, f"body {i} v2", "en"))  # changed
    src = str(tmp_path / "pages")
    out = str(tmp_path / "cur")
    spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, "
              "text string, lang string").write.parquet(src)
    argv = ["curate", "--input", src, "--output", out,
            "--host-cap", "100"]
    assert cli_main(argv) == 0
    audit = spark.read.parquet(f"{out}/audit")
    kept = spark.read.parquet(f"{out}/kept")
    assert audit.count() == 24
    n_unchanged = audit.filter("verdict = 'unchanged_recrawl'").count()
    assert n_unchanged == 8
    # kept corpus = exactly the kept CAPTURES, not all captures of
    # kept urls (24 here, since every url has a kept capture)
    assert kept.count() == audit.filter("verdict = 'kept'").count() == 16
    kept_keys = {(r.url, r.warc_ts) for r in
                 kept.select("url", "warc_ts").collect()}
    audit_kept_keys = {(r.url, r.warc_ts) for r in
                       audit.filter("verdict = 'kept'")
                       .select("url", "warc_ts").collect()}
    assert kept_keys == audit_kept_keys
    for u, t in kept_keys:
        assert t != ts(2)  # no unchanged recapture leaked


@pytest.mark.spark
def test_select_cli_writes_kept_and_audit(spark, tmp_path):
    """CLI wiring over gopher_filter + DSIR: audit covers every doc,
    the kept corpus is exactly the (verdict='kept' AND selected)
    subset, and both rules actually bind on the sf corpus."""
    from pdf_extractor_spark.__main__ import main as cli_main

    src = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "sel")
    assert cli_main(["select", "--input", src, "--output", out]) == 0
    audit = spark.read.parquet(f"{out}/audit")
    kept = spark.read.parquet(f"{out}/kept")
    n_docs = spark.read.parquet(src).count()
    assert audit.count() == n_docs
    kept_ids = {r.doc_id for r in
                audit.filter("kept").select("doc_id").collect()}
    assert {r.doc_id for r in kept.select("doc_id").collect()} \
        == kept_ids
    # both filters bind: some docs fail gopher, some fail dsir
    assert audit.filter("verdict <> 'kept'").count() > 0
    assert audit.filter("verdict = 'kept' AND NOT selected").count() > 0
    assert 0 < len(kept_ids) < n_docs


@pytest.mark.spark
def test_extract_with_quality_single_scan(spark, tmp_path):
    """--with-quality appends the gopher signals + verdict to the
    extraction output as projections on the same scan; the verdict
    must equal gopher_filter run on the extracted text."""
    from pdf_extractor_spark.__main__ import main as cli_main
    from pdf_extractor_spark.queries.curation import gopher_filter
    from pyspark.sql import functions as F

    src = str(tmp_path / "pages")
    out = str(tmp_path / "ext")
    synth_pages_df(spark, 40, partitions=2).write.parquet(src)
    assert cli_main(["extract", "--input", src, "--output", out,
                     "--levels", "raw", "--with-quality"]) == 0
    got = spark.read.parquet(out)
    assert {"verdict", "n_words", "wlen_bp", "dup_bp",
            "top_bp"} <= set(got.columns)
    want = {r.doc_id: r.verdict for r in gopher_filter(
        got.select(F.col("url").alias("doc_id"), "text")).collect()}
    for r in got.select("url", "verdict").collect():
        assert want[r.url] == r.verdict
    assert len(set(want.values())) > 1   # more than one verdict fires


@pytest.mark.spark
def test_assemble_cli_pack_invariants(spark, tmp_path):
    """CLI wiring over budget_select + pack_offsets +
    pack_manifest_body + shard_manifest: the kept corpus is exactly
    the audit's kept set, the pack lays kept docs end-to-end with no
    gaps, every sequence but the last fills to SEQ_LEN, and the shard
    manifest accounts for every kept doc exactly once."""
    from pdf_extractor_spark.__main__ import main as cli_main
    from pdf_extractor_spark.queries.curation import SEQ_LEN

    src = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "asm")
    assert cli_main(["assemble", "--input", src, "--output", out]) == 0
    audit = spark.read.parquet(f"{out}/audit")
    kept = spark.read.parquet(f"{out}/kept")
    pack = spark.read.parquet(f"{out}/pack").orderBy("doc_id").collect()
    man = spark.read.parquet(f"{out}/seq_manifest") \
        .orderBy("seq_id").collect()
    shards = spark.read.parquet(f"{out}/shards").collect()

    kept_ids = {r.doc_id for r in audit.filter("kept").collect()}
    assert 0 < len(kept_ids) < audit.count()
    assert {r.doc_id for r in kept.select("doc_id").collect()} \
        == kept_ids

    # pack: end-to-end, gap-free in doc_id order over the KEPT set
    off = 0
    for r in pack:
        assert r.start_offset == off, (r, off)
        off += r.n_tokens
    assert {r.doc_id for r in pack} == kept_ids
    # manifest: full SEQ_LEN fill except the final sequence
    assert [r.seq_id for r in man] == list(range(len(man)))
    assert all(r.seq_tokens == SEQ_LEN for r in man[:-1])
    assert sum(r.seq_tokens for r in man) == off
    # shards: every kept doc exactly once, checksums consistent (the
    # per-shard xor checksums recombine to the xor of all kept ids)
    import functools
    import operator
    assert sum(r.n_docs for r in shards) == len(kept_ids)
    assert functools.reduce(operator.xor,
                            (r.id_checksum for r in shards)) == \
        functools.reduce(operator.xor, kept_ids)


def test_with_quality_rejects_all_colliding_columns(spark):
    """ADVICE r04: with_quality promises every input column survives —
    it must refuse inputs already carrying ANY name it creates,
    including intermediates it later drops (sum_len, nb, top) and
    outputs it would overwrite (n_words, verdict, ...)."""
    import pytest as _pytest

    from pdf_extractor_spark.queries.curation import with_quality
    base = spark.createDataFrame([(1, "hello world")],
                                 "doc_id long, text string")
    for c in ("w", "bg", "sum_len", "nb", "top",
              "n_words", "wlen_bp", "dup_bp", "top_bp", "verdict"):
        bad = base.withColumn(c, F.lit(1))
        with _pytest.raises(ValueError, match=c):
            with_quality(bad)
    # clean input still works and keeps its extra column
    ok = with_quality(base.withColumn("extra", F.lit(7)))
    assert "extra" in ok.columns and "verdict" in ok.columns
