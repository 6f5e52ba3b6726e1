"""Semantics of the web-curation operators (queries/webcur.py) on
crafted corpora: duplicate-span detection finds exactly the maximal
shared token spans, span_scrub merges overlapping intervals before
counting, and URL canonicalization applies each rule.
"""

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.queries import webcur

pytestmark = pytest.mark.spark


def _write_docs(spark, tmp_path, texts):
    rows = [(i, t, "en", f"src{i}", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    df.coalesce(1).write.mode("overwrite") \
        .parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def _tok(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


class TestDuplicateSpans:
    def test_exact_shared_span_found_with_maximal_length(self, spark,
                                                         tmp_path):
        shared = _tok("dup", 20)
        sf = _write_docs(spark, tmp_path, [
            _tok("a", 10) + " " + shared + " " + _tok("b", 10),
            _tok("c", 5) + " " + shared + " " + _tok("d", 15),
            _tok("e", 40),  # no overlap
        ])
        rows = webcur.q_duplicate_spans(spark, sf).collect()
        assert len(rows) == 1
        r = rows[0]
        # maximal, not fragmented: one span of exactly 20 tokens,
        # 1-based starts just past each prefix
        assert (r.doc_a, r.doc_b, r.span_len) == (0, 1, 20)
        assert (r.start_a, r.start_b) == (11, 6)

    def test_spans_below_minimum_are_not_reported(self, spark, tmp_path):
        shared = _tok("dup", webcur.SPAN_MIN_TOKENS - 1)
        sf = _write_docs(spark, tmp_path, [
            shared + " " + _tok("a", 20),
            shared + " " + _tok("b", 20),
        ])
        assert webcur.q_duplicate_spans(spark, sf).count() == 0

    def test_two_separate_spans_stay_separate(self, spark, tmp_path):
        s1, s2 = _tok("x", 15), _tok("y", 15)
        sf = _write_docs(spark, tmp_path, [
            s1 + " " + _tok("a", 10) + " " + s2,
            s2 + " " + _tok("b", 10) + " " + s1,
        ])
        rows = webcur.q_duplicate_spans(spark, sf).collect()
        # crossed order ⇒ different diagonals ⇒ two spans of 15
        assert sorted(r.span_len for r in rows) == [15, 15]

    def test_df_cap_suppresses_universal_boilerplate(self, spark,
                                                     tmp_path):
        boiler = _tok("boiler", 20)
        sf = _write_docs(
            spark, tmp_path,
            [boiler + " " + _tok(f"u{i}_", 10)
             for i in range(webcur.SPAN_DF_CAP + 2)])
        # the 20-token block is shared by MORE than SPAN_DF_CAP docs:
        # every seed k-gram is over-frequent, so no span survives
        assert webcur.q_duplicate_spans(spark, sf).count() == 0


class TestSpanScrub:
    def test_overlapping_spans_count_union_not_sum(self, spark,
                                                   tmp_path):
        # doc 2 (junior everywhere) shares tokens 1..20 with doc 0 and
        # tokens 11..30 with doc 1: union = 30 tokens, sum = 40
        block = _tok("s", 30)
        toks = block.split(" ")
        sf = _write_docs(spark, tmp_path, [
            " ".join(toks[:20]) + " " + _tok("a", 12),
            " ".join(toks[10:30]) + " " + _tok("b", 12),
            block + " " + _tok("c", 12),
        ])
        rows = {r.doc_id: r for r in
                webcur.q_span_scrub(spark, sf).collect()}
        assert rows[2].dup_tokens == 30
        assert rows[2].n_tokens == 42
        assert rows[2].verdict == "trim"
        # seniors keep their copies: doc 0 is never a junior side
        assert rows[0].dup_tokens == 0
        assert rows[0].verdict == "keep"

    def test_scrub_text_removes_exactly_the_union(self, spark,
                                                  tmp_path):
        block = _tok("s", 30)
        toks = block.split(" ")
        pre, post = _tok("c", 3), _tok("d", 3)
        sf = _write_docs(spark, tmp_path, [
            " ".join(toks[:20]) + " " + _tok("a", 12),
            " ".join(toks[10:30]) + " " + _tok("b", 12),
            pre + " " + block + " " + post,
        ])
        rows = {r.doc_id: r for r in
                webcur.q_span_scrub_text(spark, sf).collect()}
        # junior doc 2 loses the 30 covered tokens, keeps its own
        # prefix and suffix in order
        assert rows[2].scrubbed_text == pre + " " + post
        assert rows[2].kept_tokens == 6
        # seniors keep their text verbatim
        assert rows[0].scrubbed_text.startswith(" ".join(toks[:20]))
        assert rows[0].kept_tokens == rows[0].n_tokens

    def test_clean_docs_keep(self, spark, tmp_path):
        sf = _write_docs(spark, tmp_path,
                         [_tok("a", 30), _tok("b", 30)])
        rows = webcur.q_span_scrub(spark, sf).collect()
        assert all(r.verdict == "keep" and r.dup_tokens == 0
                   for r in rows)


class TestSpanScrubStar:
    def test_counts_any_senior_shared_kgram(self, spark, tmp_path):
        # a shared block of exactly SPAN_K tokens: below the pairwise
        # SPAN_MIN_TOKENS floor, but the star coverage counts it
        shared = _tok("dup", webcur.SPAN_K)
        sf = _write_docs(spark, tmp_path, [
            shared + " " + _tok("a", 20),
            shared + " " + _tok("b", 20),
        ])
        rows = {r.doc_id: r for r in
                webcur.q_span_scrub_star(spark, sf).collect()}
        assert rows[1].dup_tokens == webcur.SPAN_K
        # the senior copy owns the k-gram: not covered
        assert rows[0].dup_tokens == 0

    def test_matches_pairwise_union_on_long_overlap(self, spark,
                                                    tmp_path):
        # same corpus as the pairwise union test: doc 2 junior to both
        # partners, union 30 tokens — star agrees with the pairwise
        # scrub when every span clears the pairwise floor
        block = _tok("s", 30)
        toks = block.split(" ")
        sf = _write_docs(spark, tmp_path, [
            " ".join(toks[:20]) + " " + _tok("a", 12),
            " ".join(toks[10:30]) + " " + _tok("b", 12),
            block + " " + _tok("c", 12),
        ])
        star = {r.doc_id: r.dup_tokens for r in
                webcur.q_span_scrub_star(spark, sf).collect()}
        pairwise = {r.doc_id: r.dup_tokens for r in
                    webcur.q_span_scrub(spark, sf).collect()}
        assert star[2] == pairwise[2] == 30
        assert star[0] == pairwise[0] == 0
        # doc 1 is junior to doc 0 on the 10-token overlap — below the
        # pairwise 12-token floor but ≥ SPAN_K, so only star counts it
        assert pairwise[1] == 0
        assert star[1] == 10


class TestUrlCanonicalize:
    def test_rules_applied_per_branch(self, spark, tmp_path):
        sf = _write_docs(spark, tmp_path, [_tok("w", 5)] * 6)
        rows = {r.doc_id: r for r in
                webcur.q_url_canonicalize(spark, sf).collect()}
        # doc 0: HTTPS + WWW. + :443 + utm + fragment all normalized
        assert rows[0].url.startswith("HTTPS://WWW.")
        assert rows[0].canonical_url == \
            "https://src0.example.com/Docs/0?a=1&b=2&ref=0"
        assert rows[0].host == "src0.example.com"
        # doc 1: no www, no port, no fragment; params still sorted,
        # utm_ stripped, path case preserved
        assert rows[1].canonical_url == \
            "https://src1.example.com/Docs/1?a=1&b=2&ref=1"
        # doc 3: explicit default :443 dropped
        assert ":443" in rows[3].url
        assert ":443" not in rows[3].canonical_url
        # fragment never survives
        assert all("#" not in r.canonical_url for r in rows.values())
        # tracking params never survive
        assert all("utm_" not in r.canonical_url for r in rows.values())


class TestDomainCap:
    def _write_hosted_docs(self, spark, tmp_path, per_host):
        # one host per `source`; doc lengths descend with doc_id so the
        # expected keep-set is the lowest doc_ids of each host
        rows = []
        did = 0
        for host_i, n_docs in enumerate(per_host):
            for j in range(n_docs):
                text = " ".join(f"w{k}" for k in range(40 - j))
                rows.append((did, text, "en", f"host{host_i}", len(text)))
                did += 1
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, "
                  "n_chars long")
        df.coalesce(1).write.mode("overwrite") \
            .parquet(f"{tmp_path}/documents.parquet")
        return str(tmp_path)

    def test_cap_applies_per_host_preferring_longer_docs(self, spark,
                                                         tmp_path):
        from pdf_extractor_spark.queries.webcur import (DOMAIN_CAP_K,
                                                        q_domain_cap)
        sf = self._write_hosted_docs(spark, tmp_path,
                                     [DOMAIN_CAP_K + 5, 3])
        rows = q_domain_cap(spark, sf).collect()
        by_host = {}
        for r in rows:
            by_host.setdefault(r.host, []).append(r)
        assert len(by_host) == 2
        big = by_host["host0.example.com"]
        small = by_host["host1.example.com"]
        # mega host truncated at exactly K; small host intact
        assert len(big) == DOMAIN_CAP_K
        assert len(small) == 3
        # longer docs win: the kept docs are the first K of the host
        # (lengths descend with doc_id) and ranks are 1..K in order
        assert [r.doc_id for r in big] == list(range(DOMAIN_CAP_K))
        assert [r.host_rank for r in big] == \
            list(range(1, DOMAIN_CAP_K + 1))
        assert big[0].n_tokens == 40

    def test_tie_on_length_breaks_by_doc_id(self, spark, tmp_path):
        from pdf_extractor_spark.queries.webcur import (DOMAIN_CAP_K,
                                                        q_domain_cap)
        text = " ".join(f"w{k}" for k in range(10))
        rows = [(i, text, "en", "same", len(text))
                for i in range(DOMAIN_CAP_K + 4)]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, "
                  "n_chars long").coalesce(1).write.mode("overwrite") \
            .parquet(f"{tmp_path}/documents.parquet")
        kept = q_domain_cap(spark, str(tmp_path)).collect()
        assert [r.doc_id for r in kept] == list(range(DOMAIN_CAP_K))


class TestMojibakeFix:
    def test_all_signature_sequences_repaired(self, spark, tmp_path):
        from pdf_extractor_spark.queries.webcur import (_MOJIBAKE_PAIRS,
                                                        q_mojibake_fix)
        sf = _write_docs(spark, tmp_path, [_tok("w", 5)] * 8)
        rows = {r.doc_id: r for r in q_mojibake_fix(spark, sf).collect()}
        assert len(rows) == 8
        for r in rows.values():
            for bad, _good in _MOJIBAKE_PAIRS:
                assert bad not in r.fixed_text, (r.doc_id, bad)
        # doc_id % 4 == 0 rows got no suffix: untouched, zero repairs
        assert rows[0].mojibake_chars == 0
        assert rows[0].fixed_text == _tok("w", 5)
        assert rows[4].mojibake_chars == 0
        # the three dirty branches each repaired something, and the
        # repaired text carries the intended codepoints
        assert rows[1].mojibake_chars > 0
        assert "naïve café" in rows[1].fixed_text
        assert "résumé…" in rows[1].fixed_text
        assert "’" in rows[1].fixed_text
        assert rows[2].mojibake_chars > 0
        assert "“bonjour" in rows[2].fixed_text
        assert "ça va" in rows[2].fixed_text
        assert rows[3].mojibake_chars > 0
        assert "Très süper" in rows[3].fixed_text

    def test_char_accounting_matches_pair_arithmetic(self, spark,
                                                     tmp_path):
        # suffix 1 contains: â€™ ×1, â€” ×1, â€¦ ×1 (3→1: -2 each) and
        # Ã¯ Ã© Ã© Ã© ×4 total (2→1: -1 each)... count from the literal
        from pdf_extractor_spark.queries import webcur
        sf = _write_docs(spark, tmp_path, [_tok("w", 5)] * 2)
        rows = {r.doc_id: r for r in
                webcur.q_mojibake_fix(spark, sf).collect()}
        suffix = webcur._MOJI_SUFFIXES[1]
        expected = 0
        s = suffix
        for bad, good in webcur._MOJIBAKE_PAIRS:
            expected += s.count(bad) * (len(bad) - len(good))
            s = s.replace(bad, good)
        assert expected > 0
        assert rows[1].mojibake_chars == expected


class TestUrlCanonicalizeProperties:
    """Seeded-random property corpus for the canonicalization algebra
    (canonicalize_urls): idempotence and the per-rule invariants on
    arbitrary messy URLs, not just the registry query's synthesized
    shape; plus agreement with the streaming quota's host expression."""

    def _messy_urls(self, n=250, seed=1234):
        import random
        rng = random.Random(seed)
        urls = []
        for i in range(n):
            scheme = rng.choice(["http", "https", "HTTP", "HTTPS",
                                 "hTtPs"])
            www = rng.choice(["", "www.", "WWW.", "WwW."])
            host = rng.choice(["example.com", "Sub.Domain.ORG",
                               "x-y.net", "a.b.c.io"])
            port = rng.choice(["", ":443", ":80", ":8080", ":8443"])
            path = rng.choice(["", "/", "/A/b/C", "/Docs/9",
                               "/p%20q/R"])
            params = rng.sample(
                ["a=1", "B=2", "utm_source=x", "utm_medium=y",
                 "ref=7", "z=", "q=Hello"], k=rng.randint(0, 5))
            query = "?" + "&".join(params) if params else \
                rng.choice(["", "?"])
            frag = rng.choice(["", "#top", "#Sec-2"])
            urls.append((i, f"{scheme}://{www}{host}{port}"
                            f"{path}{query}{frag}"))
        return urls

    def test_idempotent_and_invariants(self, spark):
        from pdf_extractor_spark.queries.webcur import canonicalize_urls
        df = spark.createDataFrame(self._messy_urls(),
                                   "doc_id long, url string")
        once = canonicalize_urls(df).select("doc_id", "canonical_url",
                                            "host")
        rows = {r.doc_id: r for r in once.collect()}
        # re-enter the chain with the canonical URL as the input
        twice = canonicalize_urls(
            once.select("doc_id",
                        once.canonical_url.alias("url"))).collect()
        for r in twice:
            assert r.canonical_url == rows[r.doc_id].canonical_url, \
                (r.url, r.canonical_url)
            assert r.host == rows[r.doc_id].host
        for r in rows.values():
            cu = r.canonical_url
            assert "#" not in cu
            assert "utm_" not in cu
            assert not cu.split("://")[1].startswith("www.")
            scheme, rest = cu.split("://", 1)
            assert scheme in ("http", "https")
            hostpart = rest.split("?")[0].split("/")[0]
            assert hostpart == hostpart.lower()
            # only the scheme's DEFAULT port is dropped; e.g.
            # http://h:443 legitimately keeps its port
            assert not (scheme == "https" and hostpart.endswith(":443"))
            assert not (scheme == "http" and hostpart.endswith(":80"))
            if "?" in cu:
                ps = cu.split("?", 1)[1].split("&")
                assert ps == sorted(ps) and all(p for p in ps)

    def test_host_agrees_with_streaming_quota_expr(self, spark):
        from pyspark.sql import functions as F

        from pdf_extractor_spark.queries.webcur import canonicalize_urls
        from pdf_extractor_spark.streaming.stateful import HOST_EXPR
        df = spark.createDataFrame(self._messy_urls(seed=77),
                                   "doc_id long, url string")
        got = (canonicalize_urls(df)
               .withColumn("stream_host", F.expr(HOST_EXPR))
               .filter(F.col("host") != F.col("stream_host")))
        assert got.count() == 0


class TestCrawlDeltas:
    def test_crawl_deltas_semantics(self, spark):
        """Recrawl dedup at sf0.01 (500 docs → 100 pages × 5 captures):
        capture grouping by canonical URL, rank contiguity, the
        changed-iff-hash-changed flag, and exactly one is_latest per
        page."""
        from pdf_extractor_spark.queries.webcur import q_crawl_deltas
        rows = q_crawl_deltas(spark, "/root/testdata/sf0.01").collect()
        assert len(rows) == 500
        assert sum(r.capture_rank > 1 for r in rows) == 400
        by_url = {}
        for r in rows:
            by_url.setdefault(r.canonical_url, []).append(r)
        for url, caps in by_url.items():
            # canonicalization collapsed every capture variant
            assert "utm_" not in url and "#" not in url
            assert "www." not in url.split("://")[1].split("/")[0]
            caps.sort(key=lambda r: r.capture_rank)
            assert [c.capture_rank for c in caps] == \
                list(range(1, len(caps) + 1))
            assert sum(c.is_latest for c in caps) == 1
            assert caps[-1].is_latest
            assert caps[0].changed  # first capture is always new
            for prev, cur in zip(caps, caps[1:]):
                # body version bumps every SECOND capture (v = idx
                # rounded down to even), so changed follows the hash
                assert cur.changed == \
                    (cur.content_hash != prev.content_hash)



class TestWebPipeline:
    def test_every_capture_gets_exactly_one_verdict(self, spark):
        sf = "/root/testdata/sf0.001"
        n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
        rows = webcur.q_web_pipeline(spark, sf).collect()
        assert len(rows) == n_docs
        assert len({r.doc_id for r in rows}) == n_docs

    def test_verdict_semantics(self, spark):
        sf = "/root/testdata/sf0.001"
        rows = webcur.q_web_pipeline(spark, sf).collect()
        by_verdict = {}
        for r in rows:
            by_verdict.setdefault(r.verdict, []).append(r)
        assert set(by_verdict) <= {"kept", "unchanged_recrawl",
                                   "host_quota"}
        # unchanged recaptures never enter the quota ranking
        assert all(r.host_rank is None
                   for r in by_verdict["unchanged_recrawl"])
        # the quota binds per host: at most CAP kept rows per host,
        # and every kept row outranks every quota-dropped row there
        kept, dropped = {}, {}
        for r in by_verdict.get("kept", []):
            kept.setdefault(r.host, []).append(r.host_rank)
        for r in by_verdict.get("host_quota", []):
            dropped.setdefault(r.host, []).append(r.host_rank)
        for host, ranks in kept.items():
            assert len(ranks) <= webcur.WEB_PIPE_CAP
            assert max(ranks) <= webcur.WEB_PIPE_CAP
            for dr in dropped.get(host, []):
                assert dr > max(ranks)
        # crawl synthesis guarantees both collapse stages fire
        assert by_verdict["unchanged_recrawl"]
        assert by_verdict.get("host_quota")


class TestUrlBlocklist:
    def test_blocked_hosts_dropped_others_kept(self, spark):
        sf = "/root/testdata/sf0.001"
        n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
        rows = webcur.q_url_blocklist(spark, sf).collect()
        hosts = {r.host for r in rows}
        assert not (hosts & set(webcur.BLOCKED_HOSTS))
        # exactly the docs whose canonical host is listed disappear
        # (sources repeat mod 20, so several docs share each host)
        all_rows = webcur.q_url_canonicalize(spark, sf).collect()
        blocked = {r.doc_id for r in all_rows
                   if r.host in webcur.BLOCKED_HOSTS}
        assert blocked, "fixture must exercise the blocklist"
        assert len(rows) == n_docs - len(blocked)
        assert {r.doc_id for r in rows}.isdisjoint(blocked)

    def test_plan_is_broadcast_anti_join(self, spark):
        plan = (webcur.q_url_blocklist(spark, "/root/testdata/sf0.001")
                ._jdf.queryExecution().executedPlan().toString())
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


class TestLigatureFix:
    def test_expansion_and_count(self, spark, tmp_path):
        sf = _write_docs(spark, tmp_path, ["eﬀort ﬁeld", "plain", "ﬃx",
                                           "workﬂow ﬆream"])
        rows = {r.doc_id: r for r in
                webcur.q_ligature_fix(spark, sf).collect()}
        # doc 0: %4==0 -> no suffix; base text still expands
        assert rows[0].fixed_text.startswith("effort field")
        assert rows[1].fixed_text.startswith("plain")
        assert rows[2].fixed_text.startswith("ffix")
        for r in rows.values():
            for lig, _ in webcur._LIGATURE_PAIRS:
                assert lig not in r.fixed_text
            # expanded_chars == growth in codepoints
            assert r.expanded_chars >= 0

    def test_default_extraction_chain_preserves_ligatures(self):
        # byte-identity policy: the reference does no unicode
        # normalization, so the golden-path normalize must NOT expand
        from pdf_extractor_spark.kernels import textnorm
        assert textnorm.normalize_raw_text("eﬀort ﬁeld") == "eﬀort ﬁeld"


class TestSitemapDiscovery:
    def test_only_truly_new_urls_emitted(self, spark, tmp_path):
        n_docs = 120
        sf = _write_docs(spark, tmp_path, ["w"] * n_docs)
        rows = webcur.q_sitemap_discovery(spark, sf).collect()
        # known and canonicalization-duplicate locs collapse onto the
        # crawl's canonical URLs; only the /new/ paths survive
        expected = {(f"https://site-{d % 10}.example.com/new/{d % 40}",
                     f"site-{d % 10}.example.com")
                    for d in range(n_docs)}
        assert {(r.canonical_url, r.host) for r in rows} == expected
        assert all("/new/" in r.canonical_url for r in rows)
        assert all("utm" not in r.canonical_url
                   and "WWW" not in r.canonical_url for r in rows)
