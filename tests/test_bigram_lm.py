"""Semantics of the self-trained bigram-LM quality score
(queries/textstats.py::q_bigram_logprob) on a crafted corpus with a
hand-computable language model.
"""

import math

import pytest

from pdf_extractor_spark.queries import textstats

pytestmark = pytest.mark.spark


def _write_docs(spark, tmp_path, texts):
    rows = [(i, t, "en", f"src{i}", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    df.coalesce(1).write.mode("overwrite") \
        .parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def _half_up_u(x: float) -> int:
    return int(math.floor(x * 1_000_000 + 0.5))


def test_rare_continuation_scores_high(spark, tmp_path):
    # LM over bigram events: c(x a) = 9, c(x b) = 1, c(x ·) = 10.
    # The dominant continuation costs ln(10/9); the rare one ln(10).
    sf = _write_docs(spark, tmp_path, ["x a"] * 9 + ["x b"])
    rows = {r.doc_id: r for r in
            textstats.q_bigram_logprob(spark, sf).collect()}
    common = _half_up_u(math.log(10 / 9))
    rare = _half_up_u(math.log(10))
    assert all(rows[i].avg_neg_ln_u == common for i in range(9))
    assert rows[9].avg_neg_ln_u == rare
    assert rows[9].n_bigrams == 1


def test_short_and_empty_docs_score_zero(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, ["a b a b", "single", ""])
    rows = {r.doc_id: r for r in
            textstats.q_bigram_logprob(spark, sf).collect()}
    # <2 words ⇒ no bigrams ⇒ zero score, still present in the output
    assert rows[1].n_bigrams == 0 and rows[1].avg_neg_ln_u == 0
    assert rows[2].n_bigrams == 0 and rows[2].avg_neg_ln_u == 0
    # singleton heads with a single continuation are "certain" under
    # the self-trained MLE: every bigram of doc 0 has c12 = c1
    # ("a b" twice of c(a ·)=2; "b a" once of c(b ·)=1... c("b a")=1,
    # c(b ·)=2? No: bigrams of "a b a b" are (a b),(b a),(a b) —
    # c(a b)=2=c(a ·), c(b a)=1, c(b ·)=1) ⇒ all logp = 0
    assert rows[0].avg_neg_ln_u == 0
