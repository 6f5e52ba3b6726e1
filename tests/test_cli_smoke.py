"""CLI smoke coverage (VERDICT r04 #9): every ``python -m
pdf_extractor_spark`` subcommand runs over a fixture-sized corpus
inside pytest, asserting exit code + output-table schema, so CLI drift
cannot outlive a round.

The module entrypoint itself (``python -m``) is proven ONCE via a real
subprocess (``synth`` — the cheapest subcommand, fresh JVM); the other
nine subcommands run in-process through ``main(argv)`` — the same
argparse → cmd_* → Spark path — reusing the session JVM so the whole
file stays minutes, not a JVM boot per subcommand.
"""

import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.__main__ import main

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    """ONE real ``python -m pdf_extractor_spark synth`` subprocess:
    proves the module entrypoint, exit code, and output table; every
    other test reuses its corpus."""
    out = str(tmp_path_factory.mktemp("cli") / "pages")
    proc = subprocess.run(
        [sys.executable, "-m", "pdf_extractor_spark", "synth",
         "--output", out, "--docs", "60", "--seed", "7", "--cpus", "2"],
        capture_output=True, text=True, timeout=600,
        cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "wrote 60 synthetic pages" in proc.stdout
    return out


def test_synth_output_schema(spark, pages_dir):
    back = spark.read.parquet(pages_dir)
    assert {"url", "warc_ts", "html", "text", "lang"} <= set(back.columns)
    assert back.count() == 60


def test_cli_extract(spark, pages_dir, tmp_path):
    out = str(tmp_path / "extracted")
    assert main(["extract", "--input", pages_dir, "--output", out,
                 "--levels", "raw,lines"]) == 0
    back = spark.read.parquet(out)
    assert {"url", "text", "n_chars", "n_lines", "failure_reason",
            "lines_json"} <= set(back.columns)
    assert back.count() == 60


def test_cli_extract_with_quality(spark, pages_dir, tmp_path):
    out = str(tmp_path / "extracted_q")
    assert main(["extract", "--input", pages_dir, "--output", out,
                 "--with-quality"]) == 0
    back = spark.read.parquet(out)
    assert {"n_words", "wlen_bp", "dup_bp", "top_bp",
            "verdict"} <= set(back.columns)


def test_cli_validate(spark, pages_dir, tmp_path):
    ext = str(tmp_path / "ext")
    assert main(["extract", "--input", pages_dir, "--output", ext]) == 0
    out = str(tmp_path / "validated")
    assert main(["validate", "--input", ext, "--output", out]) == 0
    back = spark.read.parquet(out)
    assert set(back.columns) == {"url", "valid", "n_issues",
                                 "total_words", "unknown_words"}
    assert back.count() == 60


@pytest.fixture(scope="module")
def md_table(tmp_path_factory, spark):
    path = str(tmp_path_factory.mktemp("cli_md") / "md")
    spark.createDataFrame(
        [(1, "# Title\n\nword word woord\n\n``broken fence\n"),
         (2, "plain text with no  issues here\n")],
        "doc_id long, text string").write.parquet(path)
    return path


def test_cli_validate_md(spark, md_table, tmp_path):
    out = str(tmp_path / "mderrs")
    assert main(["validate-md", "--input", md_table,
                 "--output", out]) == 0
    back = spark.read.parquet(out)
    assert {"key", "line_num", "column", "error_type",
            "suggestion", "confidence"} <= set(back.columns)


def test_cli_fix_md(spark, md_table, tmp_path):
    out = str(tmp_path / "mdfixed")
    assert main(["fix-md", "--input", md_table, "--output", out]) == 0
    back = spark.read.parquet(out)
    assert set(back.columns) == {"key", "fixed_text", "n_fixes_found",
                                 "n_fixes_applied"}
    assert back.count() == 2


def test_cli_extract_resumable(spark, pages_dir, tmp_path):
    out = str(tmp_path / "resumable")
    assert main(["extract-resumable", "--input", pages_dir,
                 "--output", out, "--batches", "3"]) == 0
    lineage = spark.read.parquet(f"{out}/_lineage")
    assert {"batch_id", "rows_in", "rows_out",
            "failure_count"} <= set(lineage.columns)
    # second run is a no-op resume (all batches done), still exit 0
    assert main(["extract-resumable", "--input", pages_dir,
                 "--output", out, "--batches", "3"]) == 0


def test_cli_convert_md(spark, pages_dir, tmp_path):
    from pdf_extractor_spark.pipeline.extract import extract_pages
    from pdf_extractor_spark.pipeline.sinks import save_envelopes
    env_dir = str(tmp_path / "envelopes")
    pages = spark.read.parquet(pages_dir).limit(5)
    extracted = extract_pages(pages, levels=("processed",))
    save_envelopes(extracted, env_dir, fmt="yaml", extraction_date="")
    out = str(tmp_path / "md_out")
    assert main(["convert-md", "--input", env_dir,
                 "--output", out]) == 0
    mds = [f for f in os.listdir(out) if f.endswith(".md")]
    assert len(mds) == 5


def test_cli_curate(spark, pages_dir, tmp_path):
    out = str(tmp_path / "curated")
    assert main(["curate", "--input", pages_dir, "--output", out,
                 "--host-cap", "5"]) == 0
    audit = spark.read.parquet(f"{out}/audit")
    assert {"url", "warc_ts", "verdict"} <= set(audit.columns)
    kept = spark.read.parquet(f"{out}/kept")
    assert 0 < kept.count() <= 60
    # kept corpus is exactly the kept-verdict captures
    n_kept_audit = audit.filter(F.col("verdict") == "kept").count()
    assert kept.count() == n_kept_audit


def test_cli_select(spark, tmp_path):
    out = str(tmp_path / "selected")
    docs_in = f"{SF}/documents.parquet"
    assert main(["select", "--input", docs_in, "--output", out]) == 0
    audit = spark.read.parquet(f"{out}/audit")
    assert {"doc_id", "verdict", "n_tokens", "dsir_u", "selected",
            "kept"} <= set(audit.columns)
    kept = spark.read.parquet(f"{out}/kept")
    assert kept.count() == audit.filter("kept").count()


def test_cli_assemble(spark, tmp_path):
    out = str(tmp_path / "assembled")
    docs_in = f"{SF}/documents.parquet"
    assert main(["assemble", "--input", docs_in, "--output", out,
                 "--budget", "5000"]) == 0
    for sub, cols in {
        "audit": {"doc_id", "kept"},
        "pack": {"doc_id", "n_tokens", "start_offset", "seq_id"},
        "seq_manifest": {"seq_id"},
        "shards": set(),
    }.items():
        back = spark.read.parquet(f"{out}/{sub}")
        assert cols <= set(back.columns), (sub, back.columns)
        assert back.count() > 0, sub
