"""Driver-contract surface: registry sanity + oracle parity on a fast
subset at sf0.001 (the full 26-query sweep runs via
tools/check_oracles.py at sf0.01 — this keeps pytest quick)."""

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tools.check_oracles import TABLES, value_hash

SF_DIR = "/root/testdata/sf0.001"

# fast, shape-diverse subset: agg, window, sessionize, joins, dedup,
# similarity, text stats, multimodal
SUBSET = [
    "pricing_summary", "events_sessionize", "top_orders_per_customer",
    "word_semi_join", "dedup_exact", "minhash_signatures",
    "simhash_signatures", "lsh_buckets", "quality_score",
    "multimodal_decode",
]


def test_registry_shape():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 25
    missing = set(oracles) - set(qs)
    assert not missing, f"oracles without queries: {missing}"
    # only kernel-semantics ops (golden/unit-tested, not SQL) are rows-only
    rows_only = set(qs) - set(oracles)
    assert rows_only == {"extract_docs_stats", "validation_report",
                         "md_errors_kernel", "fixed_docs",
                         "ann_bruteforce_numpy"}


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"lang", "docs", "failures"} <= set(df.columns)
    assert sum(r.failures for r in rows) == 0


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", SUBSET)
def test_oracle_parity(spark, duck, name):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    sdf = fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.execute(sql)
    ocols = [d[0] for d in rel.description]
    orows = rel.fetchall()
    assert len(srows) == len(orows)
    assert sorted(sdf.columns) == sorted(ocols)
    assert value_hash(sdf.columns, srows) == value_hash(ocols, orows)


class TestCurationProperties:
    def test_pii_scrub_is_idempotent_and_clean(self, spark):
        """Scrubbing twice equals scrubbing once, and no email/phone
        pattern survives a scrub — the properties a redaction pass must
        hold before anything ships."""
        import re

        from pdf_extractor_spark.queries import textstats as ts
        rows = ts.q_pii_scrub(spark, "/root/testdata/sf0.001").collect()
        email = re.compile(ts.EMAIL_RE)
        phone = re.compile(ts.PHONE_RE)
        injected = [r for r in rows if r.n_emails or r.n_phones]
        assert injected, "PII injection produced nothing"
        for r in rows:
            assert not email.search(r.scrubbed), r.doc_id
            assert not phone.search(r.scrubbed), r.doc_id
            # idempotence: a second pass changes nothing
            again = phone.sub("[PHONE]", email.sub("[EMAIL]", r.scrubbed))
            assert again == r.scrubbed, r.doc_id

    def test_curation_verdict_consistent_with_flags(self, spark):
        """Each doc gets exactly one verdict, and the verdict agrees
        with its component flags under the fixed rule order."""
        from pdf_extractor_spark.queries import dedup as ddp
        from pdf_extractor_spark.queries import textstats as ts
        rows = ts.q_curation_pipeline(
            spark, "/root/testdata/sf0.001").collect()
        assert len(rows) == len({r.doc_id for r in rows})
        for r in rows:
            if r.doc_id % ddp.BENCHMARK_MOD == 0:
                assert r.verdict == "benchmark"
            elif r.is_duplicate:
                assert r.verdict == "duplicate"
            elif r.contaminated:
                assert r.verdict == "contaminated"
            elif r.quality_bp < ts.CURATION_QUALITY_MIN:
                assert r.verdict == "low_quality"
            else:
                assert r.verdict == "kept"
