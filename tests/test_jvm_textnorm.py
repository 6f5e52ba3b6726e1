"""Q9 promotion gate: the JVM normalize/raw-lane must be byte-identical
to the Python kernel (VERDICT r02 #2 — promote to JVM regexp only
behind an equivalence proof; SURVEY §5.2 item 4).

Three layers of proof:
1. per-codepoint whitespace sweep U+0000..U+3000 (the entire range where
   Unicode whitespace exists) in the three grammatical positions where
   whitespace matters (sentence gap, line edge, line middle);
2. adversarial composed strings (literal backslash-n, CRLF, bullets,
   NEL/LS/PS terminators, space runs, blank-line stripping);
3. whole-corpus byte-identity of extract_pages_hybrid vs the fused
   Python path on a mixed payload/text table.
"""

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.kernels.textnorm import (normalize_raw_text,
                                                  normalize_raw_text_expr)
from pdf_extractor_spark.pipeline.extract import (extract_pages,
                                                  extract_pages_hybrid)
from pdf_extractor_spark.sources.pages import synth_pages_df

pytestmark = pytest.mark.spark


def _compare(spark, cases):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], "id long, s string")
    got = {r.id: r.n for r in
           df.select("id", normalize_raw_text_expr(F.col("s")).alias("n"))
           .collect()}
    for i, s in enumerate(cases):
        assert got[i] == normalize_raw_text(s), repr(s)


def test_codepoint_whitespace_sweep(spark):
    # surrogates U+D800-DFFF cannot ride UTF-8; everything else goes.
    cps = [c for c in range(0x3001) if not 0xD800 <= c <= 0xDFFF]
    cases = []
    for c in cps:
        ch = chr(c)
        cases.append(f"End.{ch}Next sentence")   # sentence-break \s*
        cases.append(f"{ch}edge{ch}")            # line strip
        cases.append(f"mid{ch}dle")              # inert position
    _compare(spark, cases)


def test_adversarial_strings(spark):
    cases = [
        "",
        "plain",
        "a\\nb\\n\\nc",                  # literal backslash-n fix
        "x\r\ny\rz",
        "a\n\n\n\n\nb",
        "too    many     spaces",
        "item one • item two • three",
        "Done. Next! Go? Yes. no caps",
        "  \t leading and trailing \t ",
        "\n\n\n",
        "only separators here\x85ok",
        "End.\xa0\xa0Next",               # NBSP run in sentence gap
        "End.\x1c\x1dNext",               # FS/GS controls (python \s)
        "a 　 b　",               # ideographic space
        "U. S. A. Mixed. case",
        "trail. ",
        ". Start",
        "• bullet first",
        "Multi.\nLine. Input\r\nwith\rall \\n kinds",
        "  \x85",
    ]
    _compare(spark, cases)


def test_hybrid_lane_byte_identical(spark):
    """Mixed table: a deterministic third of the rows lose their binary
    payload (becoming text-lane rows), the rest keep it. The hybrid
    plan's output must equal the all-Python fused path row for row."""
    pages = synth_pages_df(spark, 90, partitions=5).withColumn(
        "html",
        F.when(F.pmod(F.xxhash64("url"), F.lit(3)) == 0, F.lit(None))
         .otherwise(F.col("html")))
    cols = ["url", "doctype", "text", "n_chars", "n_lines",
            "failure_reason"]
    want = {r.url: r for r in
            extract_pages(pages, levels=("raw",)).select(cols).collect()}
    got = {r.url: r for r in
           extract_pages_hybrid(pages).select(cols).collect()}
    assert set(got) == set(want)
    assert any(  # the JVM lane actually fired
        want[u].doctype in ("text", "empty") for u in want)
    for u in want:
        assert tuple(got[u]) == tuple(want[u]), u


def test_jvm_lane_plan_has_no_python(spark):
    """The text lane must stay inside codegen: no MapInPandas / no
    Python eval anywhere in its physical plan, and the scan must not
    read the html column (column pruning proof)."""
    import datetime as dt

    from pdf_extractor_spark.pipeline.extract import extract_pages_text_jvm
    pages = spark.createDataFrame(
        [("u1", dt.datetime(2025, 6, 1), None, "Some text. Here", "en")],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string")
    plan = (extract_pages_text_jvm(pages)
            ._jdf.queryExecution().executedPlan().toString())
    assert "MapInPandas" not in plan
    assert "PythonUDF" not in plan
