"""Q9 promotion gate for the LINES-level JVM lane (VERDICT r03 #7):
split_lines_expr / line_stats_exprs must be value-identical to the
Python kernels, and extract_pages_lines_jvm must match the fused
Python path's parsed lines_json on the same rows.

Layers mirror tests/test_jvm_textnorm.py:
1. per-codepoint whitespace sweep in the P2 positions (line edge,
   interior run, mixed runs);
2. adversarial strings incl. >MAX_LINE_LENGTH lines exercising P3's
   greedy sentence packing (+1 accounting, overflow seeding, oversize
   single sentences, punctuation runs, empty-sentence units);
3. whole-corpus identity of the pipeline lane vs the Python path.
"""

import json

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.kernels.lines import (MAX_LINE_LENGTH,
                                               line_stats,
                                               split_lines,
                                               split_lines_expr)
from pdf_extractor_spark.pipeline.extract import (extract_pages,
                                                  extract_pages_lines_jvm)
from pdf_extractor_spark.sources.pages import synth_pages_df

pytestmark = pytest.mark.spark


def _compare(spark, cases):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], "id long, s string")
    got = {r.id: r.l for r in
           df.select("id", split_lines_expr(F.col("s")).alias("l"))
           .collect()}
    for i, s in enumerate(cases):
        assert got[i] == split_lines(s), repr(s[:120])


def test_codepoint_whitespace_sweep(spark):
    cps = [c for c in range(0x3001) if not 0xD800 <= c <= 0xDFFF]
    cases = []
    for c in cps:
        ch = chr(c)
        cases.append(f"{ch}edge{ch}\nnext")     # line strip
        cases.append(f"in{ch}{ch}side")         # interior run collapse
        cases.append(f"a{ch}b\n{ch}\nc")        # whole-WS line drop
    _compare(spark, cases)


def test_adversarial_long_lines(spark):
    sent = "This is a sentence that fills some room. "
    word = "x" * 150
    cases = [
        "",
        "one line",
        "a\n\nb\n  \nc",
        # greedy packing across many sentences
        (sent * 120).strip(),
        # a single sentence longer than the cap (no split point)
        "y" * (MAX_LINE_LENGTH + 500),
        # oversize first unit then packable tail
        "z" * (MAX_LINE_LENGTH + 10) + ". " + sent * 60,
        # punctuation runs and empty-sentence units
        ("ab!? cd! ! ef. " * 200).strip(),
        # exactly at the cap (no re-chunk)
        "q" * MAX_LINE_LENGTH,
        # one over the cap with a split point
        "p" * (MAX_LINE_LENGTH - 2) + ". tail",
        # multibyte text over the cap
        ("Ünïcödé sätz hier. " * 150).strip(),
        # whitespace soup around sentence gaps collapses BEFORE P3
        ("word\t\tmore space. " * 180).strip(),
        # sentences of wildly mixed sizes
        (". ".join([word, "a", word * 8, "b. c", word]) + "."),
    ]
    _compare(spark, cases)


def test_stats_match_python(spark):
    texts = ["alpha beta\ngamma", "", "x. " * 900, "é\n\né é"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, t string")
    from pdf_extractor_spark.kernels.lines import line_stats_exprs
    lines = split_lines_expr(F.col("t"))
    total, avg, mx = line_stats_exprs(lines)
    got = {r.id: (r.total_lines, r.avg_line_length, r.max_line_length)
           for r in df.select("id", total, avg, mx).collect()}
    for i, t in enumerate(texts):
        st = line_stats(split_lines(t))
        assert got[i][0] == st["total_lines"], i
        assert got[i][1] == float(st["avg_line_length"]), i
        assert got[i][2] == st["max_line_length"], i


def test_pipeline_lane_matches_python_path(spark):
    """extract_pages_lines_jvm vs the fused Python lines level: every
    line and every stat equal per url, plus the raw-level columns."""
    pages = (synth_pages_df(spark, 80, partitions=4)
             .withColumn("html", F.lit(None).cast("binary"))
             .withColumn("text", F.coalesce(
                 "text", F.concat_ws(
                     " ", F.lit("Pre extracted body. Next sentence"
                                " here to split."), "url"))))
    want = {}
    py = extract_pages(pages, levels=("raw", "lines")) \
        .select("url", "doctype", "text", "n_chars", "n_lines",
                "failure_reason", "lines_json").collect()
    for r in py:
        parsed = json.loads(r.lines_json) if r.lines_json else None
        want[r.url] = (r.doctype, r.text, r.n_chars, r.n_lines,
                       r.failure_reason, parsed)
    got = extract_pages_lines_jvm(pages).collect()
    assert {r.url for r in got} == set(want)
    for r in got:
        doctype, text, n_chars, n_lines, fail, parsed = want[r.url]
        assert (r.doctype, r.text, r.n_chars, r.n_lines,
                r.failure_reason) == (doctype, text, n_chars, n_lines,
                                      fail), r.url
        assert parsed is not None
        assert list(r.lines) == parsed["lines"], r.url
        assert r.n_lines == parsed["stats"]["total_lines"]
        assert r.avg_line_length == float(
            parsed["stats"]["avg_line_length"])
        assert r.max_line_length == parsed["stats"]["max_line_length"]


def test_lane_plan_has_no_python_stage(spark, tmp_path):
    src = str(tmp_path / "pages")
    synth_pages_df(spark, 10).withColumn(
        "html", F.lit(None).cast("binary")).write.parquet(src)
    df = extract_pages_lines_jvm(spark.read.parquet(src))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "MapInPandas" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_lines_hybrid_matches_python_path(spark, tmp_path):
    """Mixed payload/text table: the lines-level hybrid router must
    equal the all-Python path row for row on the unified typed
    schema, and actually take the JVM lane for payload-less rows."""
    from pdf_extractor_spark.pipeline.extract import \
        extract_pages_lines_hybrid

    pages = synth_pages_df(spark, 90, partitions=5).withColumn(
        "html",
        F.when(F.pmod(F.xxhash64("url"), F.lit(3)) == 0, F.lit(None))
         .otherwise(F.col("html")))
    want = {}
    for r in extract_pages(pages, levels=("raw", "lines")).collect():
        parsed = json.loads(r.lines_json) if r.lines_json else None
        want[r.url] = (
            r.doctype, r.text, r.n_chars, r.n_lines, r.failure_reason,
            parsed["lines"] if parsed else None,
            parsed["stats"]["avg_line_length"] if parsed else None,
            parsed["stats"]["max_line_length"] if parsed else None)
    got = extract_pages_lines_hybrid(pages).collect()
    assert {r.url for r in got} == set(want)
    n_text_lane = 0
    for r in got:
        (doctype, text, n_chars, n_lines, fail,
         lines, avg, mx) = want[r.url]
        assert (r.doctype, r.text, r.n_chars, r.n_lines,
                r.failure_reason) == (doctype, text, n_chars,
                                      n_lines, fail), r.url
        got_lines = list(r.lines) if r.lines is not None else None
        assert got_lines == lines, r.url
        if avg is None:
            assert r.avg_line_length is None and \
                r.max_line_length is None
        else:
            assert r.avg_line_length == float(avg)
            assert r.max_line_length == mx
        if r.doctype == "text":
            n_text_lane += 1
    assert n_text_lane > 0  # the JVM lane actually fired
