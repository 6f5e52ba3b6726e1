"""Regression: shingle-based queries must not crash or diverge on
documents with fewer than 3 whitespace tokens (ADVICE r01: Spark's
sequence(0, size-3) is DESCENDING for size<3 and split(...)[i+1]
throws under ANSI mode; the DuckDB oracle emits no shingles at all).

Builds a tiny documents/embeddings parquet pair with 0/1/2/3/5-word
docs and runs every shingle consumer against its oracle.
"""

import duckdb
import pytest

from pdf_extractor_spark.queries.dedup import (
    ORACLE_JACCARD, q_dedup_ngram_jaccard)
from pdf_extractor_spark.queries.textstats import (
    ORACLE_WINNOW, q_doc_winnow)
from tools.check_oracles import value_hash

DOCS = [
    (0, "web", ""),                       # empty text → 1 empty token
    (1, "web", "one"),
    (2, "web", "two words"),
    (3, "web", "exactly three tokens"),
    (4, "web", "a slightly longer doc with several tokens in it"),
    (5, "web", "a slightly longer doc with several tokens in it"),
]


@pytest.fixture(scope="module")
def short_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("shortdocs")
    spark.createDataFrame(DOCS, "doc_id int, source string, text string") \
        .coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def _parity(spark, sf_dir, fn, sql):
    sdf = fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'")
    rel = con.execute(sql)
    ocols = [c[0] for c in rel.description]
    orows = rel.fetchall()
    con.close()
    assert len(srows) == len(orows)
    assert value_hash(sdf.columns, srows) == value_hash(ocols, orows)
    return srows


def test_jaccard_short_docs(spark, short_sf_dir):
    rows = _parity(spark, short_sf_dir, q_dedup_ngram_jaccard,
                   ORACLE_JACCARD)
    # docs 4 and 5 are identical → jaccard 1.0; short docs produce no
    # shingles, so no bogus '' shingle ever pairs them up
    pairs = {(r[0], r[1]) for r in rows}
    assert (4, 5) in pairs
    assert all(a >= 3 and b >= 3 for a, b in pairs)


def test_winnow_short_docs(spark, short_sf_dir):
    rows = _parity(spark, short_sf_dir, q_doc_winnow, ORACLE_WINNOW)
    # only docs with >=3 tokens get a fingerprint
    assert {r[0] for r in rows} == {3, 4, 5}
