"""Semantics of the BM25 retrieval operator (queries/search.py) on a
crafted corpus: scores match a pure-Python mirror of the same integer
formulation, ranking behaves (more query-term mass => higher score),
and the plan broadcasts the tiny sides.
"""

import math

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.queries import search

pytestmark = pytest.mark.spark


def _write_docs(spark, tmp_path, texts):
    rows = [(i, t, "en", f"src{i}", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    df.coalesce(1).write.mode("overwrite") \
        .parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def _corpus():
    # term mix: doc i holds i%4 'spark', i%3 'vector', i%5 'stream'
    # occurrences plus filler — varied tf, dl, and term coverage
    texts = []
    for i in range(30):
        words = (["spark"] * (i % 4) + ["vector"] * (i % 3)
                 + ["stream"] * (i % 5) + ["filler"] * (5 + i % 7))
        texts.append(" ".join(words))
    texts.append("")          # excluded by the trim filter
    texts.append("   ")       # likewise
    return texts


def _python_bm25(texts):
    """Integer BM25 mirror: same micro-nat idf (half-up round of the
    double ln), same folded k1/b floor division, same tie-break."""
    docs = {i: [x for x in t.split(" ") if x != ""]
            for i, t in enumerate(texts) if t.strip() != ""}
    dl = {i: len(w) for i, w in docs.items()}
    n = len(docs)
    avgdl = sum(dl.values()) // n
    tf = {}
    for i, w in docs.items():
        for term in search.TERMS:
            c = w.count(term)
            if c:
                tf[(i, term)] = c
    dfreq = {}
    for (_, term) in tf:
        dfreq[term] = dfreq.get(term, 0) + 1
    idf_u = {t: math.floor(
        math.log(1 + (2 * n - 2 * d + 1) / (2 * d + 1)) * 1000000 + 0.5)
        for t, d in dfreq.items()}
    scored = {}
    for (i, term), c in tf.items():
        c_u = (idf_u[term] * 44 * avgdl * c) \
            // (20 * avgdl * c + 6 * avgdl + 18 * dl[i])
        nt, s = scored.get(i, (0, 0))
        scored[i] = (nt + 1, s + c_u)
    ranked = sorted(scored.items(), key=lambda kv: (-kv[1][1], kv[0]))
    return [(i, nt, s, rk + 1)
            for rk, (i, (nt, s)) in enumerate(ranked)][:search.TOP_K]


class TestBm25:
    def test_matches_integer_reference(self, spark, tmp_path):
        texts = _corpus()
        sf = _write_docs(spark, tmp_path, texts)
        got = [(r.doc_id, r.n_terms, r.score_u, r.rk)
               for r in search.q_bm25_topk(spark, sf).collect()]
        assert got == _python_bm25(texts)

    def test_docs_without_query_terms_are_absent(self, spark, tmp_path):
        sf = _write_docs(spark, tmp_path, [
            "spark stream spark", "filler only words here", "vector",
        ])
        ids = {r.doc_id
               for r in search.q_bm25_topk(spark, sf).collect()}
        assert ids == {0, 2}

    def test_plan_shape(self, spark, tmp_path):
        # zero-explode wide-aggregate: no Generate (explode) node, the
        # 1-row stats side broadcast, and the top-k as a distributed
        # TakeOrderedAndProject — never a global row_number window over
        # the full scored set (the measured serial tail)
        sf = _write_docs(spark, tmp_path, _corpus())
        plan = (search.q_bm25_topk(spark, sf)
                ._jdf.queryExecution().executedPlan().toString())
        assert "TakeOrderedAndProject" in plan
        assert "Generate" not in plan
        assert "CartesianProduct" not in plan
