"""Semantics of the link-graph operators (queries/webgraph.py) on
crafted corpora: outlink extraction canonicalizes messy hrefs into
host-level edges, and host PageRank matches a pure-Python integer
reference implementation of the same fixed-point arithmetic.
"""

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.queries import webgraph

pytestmark = pytest.mark.spark


def _write_docs(spark, tmp_path, n_docs):
    rows = [(i, f"doc {i}", "en", f"src{i}", 10) for i in range(n_docs)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    df.coalesce(1).write.mode("overwrite") \
        .parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def _expected_edges(n_docs):
    """The synthesized corpus's edges, recomputed in plain Python from
    the same doc_id arithmetic (module doc: link1 always, link2 iff
    doc_id even, link3 iff doc_id % 3 == 0)."""
    n = webgraph.N_SITES
    edges = {}
    for d in range(n_docs):
        s = d % n
        src = f"site-{s}.example.com"
        targets = [(s + 1) % n]
        if d % 2 == 0:
            targets.append((s + 3) % n)
        if d % 3 == 0:
            targets.append((d * 7) % n)
        for t in targets:
            key = (src, f"site-{t}.example.com")
            edges[key] = edges.get(key, 0) + 1
    return edges


class TestOutlinks:
    def test_edges_match_python_recomputation(self, spark, tmp_path):
        sf = _write_docs(spark, tmp_path, 60)
        rows = webgraph.q_outlinks(spark, sf).collect()
        got = {(r.src_host, r.dst_host): r.n_links for r in rows}
        assert got == _expected_edges(60)

    def test_hosts_are_canonical(self, spark, tmp_path):
        # the synthesis deliberately emits www., :80, UPPERCASE scheme
        # and host, utm queries with no path, and #fragments — none may
        # survive canonicalization
        sf = _write_docs(spark, tmp_path, 30)
        for r in webgraph.q_outlinks(spark, sf).collect():
            for h in (r.src_host, r.dst_host):
                assert h == h.lower()
                assert not h.startswith("www.")
                assert ":" not in h and "?" not in h and "#" not in h
                assert h.endswith(".example.com")


class TestAnchorTexts:
    def test_topk_matches_python_recomputation(self, spark, tmp_path):
        n_docs, n = 60, webgraph.N_SITES
        sf = _write_docs(spark, tmp_path, n_docs)
        counts = {}
        for d in range(n_docs):
            s = d % n
            pairs = [(f"site-{(s + 1) % n}.example.com",
                      f"visit site {(s + 1) % n}")]
            if d % 2 == 0:
                pairs.append((f"site-{(s + 3) % n}.example.com",
                              "best docs"))
            if d % 3 == 0:
                t = (d * 7) % n
                pairs.append((f"site-{t}.example.com",
                              f"site {t} reference"))
            for key in pairs:
                counts[key] = counts.get(key, 0) + 1
        expected = {}
        by_host = {}
        for (h, a), c in counts.items():
            by_host.setdefault(h, []).append((-c, a))
        for h, lst in by_host.items():
            for rk, (negc, a) in enumerate(sorted(lst)[:3], start=1):
                expected[(h, a)] = (-negc, rk)
        got = {(r.dst_host, r.anchor): (r.n_refs, r.rk)
               for r in webgraph.q_anchor_texts(spark, sf).collect()}
        assert got == expected


def _python_pagerank(edges):
    """Integer PageRank mirror: same ppb units, floor divisions, and
    iteration count as q_host_pagerank."""
    adj = sorted({(s, d) for (s, d) in edges if s != d})
    hosts = sorted({h for e in adj for h in e})
    n = len(hosts)
    outdeg = {}
    for s, _ in adj:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {h: webgraph.PR_UNIT // n for h in hosts}
    teleport = webgraph.PR_TELEPORT_PPB // n
    for _ in range(webgraph.PR_ITERS):
        inflow = {h: 0 for h in hosts}
        for s, d in adj:
            inflow[d] += rank[s] // outdeg[s]
        rank = {h: teleport + 85 * inflow[h] // 100 for h in hosts}
    return rank


class TestHostPagerank:
    def test_matches_integer_reference(self, spark, tmp_path):
        sf = _write_docs(spark, tmp_path, 60)
        got = {r.host: r.rank_ppb
               for r in webgraph.q_host_pagerank(spark, sf).collect()}
        assert got == _python_pagerank(_expected_edges(60))

    def test_mass_bounded_by_unit(self, spark, tmp_path):
        # floor divisions only ever lose mass: total rank stays in
        # (0, PR_UNIT], which guards against double-counted inflow
        sf = _write_docs(spark, tmp_path, 60)
        total = (webgraph.q_host_pagerank(spark, sf)
                 .agg(F.sum("rank_ppb")).collect()[0][0])
        assert 0 < total <= webgraph.PR_UNIT

    def test_sample_weights_compose_rank_and_counts(self, spark,
                                                    tmp_path):
        n_docs, n = 60, webgraph.N_SITES
        sf = _write_docs(spark, tmp_path, n_docs)
        rank = _python_pagerank(_expected_edges(n_docs))
        per_host = {}
        for d in range(n_docs):
            h = f"site-{d % n}.example.com"
            per_host[h] = per_host.get(h, 0) + 1
        expected = {h: (per_host[h], rank[h],
                        rank[h] * 1000000 // per_host[h])
                    for h in rank}
        got = {r.host: (r.n_docs, r.rank_ppb, r.per_doc_weight_ppb)
               for r in webgraph.q_host_sample_weights(spark,
                                                       sf).collect()}
        assert got == expected

    def test_degrees_match_python_recomputation(self, spark, tmp_path):
        n_docs = 60
        sf = _write_docs(spark, tmp_path, n_docs)
        adj = {(s, d) for (s, d) in _expected_edges(n_docs) if s != d}
        hosts = {h for e in adj for h in e}
        expected = {}
        for h in hosts:
            out_n = {d for (s, d) in adj if s == h}
            in_n = {s for (s, d) in adj if d == h}
            recip = sum(1 for d in out_n if (d, h) in adj)
            expected[h] = (len(out_n), len(in_n), recip)
        got = {r.host: (r.outdeg, r.indeg, r.reciprocal)
               for r in webgraph.q_host_degrees(spark, sf).collect()}
        assert got == expected

    def test_hits_matches_integer_reference(self, spark, tmp_path):
        n_docs = 60
        sf = _write_docs(spark, tmp_path, n_docs)
        adj = sorted({(s, d) for (s, d) in _expected_edges(n_docs)
                      if s != d})
        hosts = sorted({h for e in adj for h in e})
        n, U = len(hosts), webgraph.HITS_UNIT
        hub = {h: U // n for h in hosts}
        auth = {}
        for _ in range(webgraph.HITS_ITERS):
            auth = {h: 0 for h in hosts}
            for s, d in adj:
                auth[d] += hub[s]
            tot = sum(auth.values())
            auth = {h: v * U // tot for h, v in auth.items()}
            hub = {h: 0 for h in hosts}
            for s, d in adj:
                hub[s] += auth[d]
            tot = sum(hub.values())
            hub = {h: v * U // tot for h, v in hub.items()}
        got = {r.host: (r.auth_u, r.hub_u)
               for r in webgraph.q_host_hits(spark, sf).collect()}
        assert got == {h: (auth[h], hub[h]) for h in hosts}

    def test_frontier_priority_semantics(self, spark, tmp_path):
        sf = _write_docs(spark, tmp_path, 60)
        rows = webgraph.q_frontier_priority(spark, sf).collect()
        assert 0 < len(rows) <= webgraph.TOP_FRONTIER
        # rank column is a contiguous 1..n in priority order
        assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
        pri = [(r.priority, r.canonical_url) for r in rows]
        assert pri == sorted(pri, key=lambda t: (-t[0], t[1]))
        # arithmetic consistency per row
        for r in rows:
            assert r.priority == r.staleness_min * r.rank_ppb // 1000
            assert r.host in r.canonical_url

    def test_rank_joins_are_broadcast(self, spark, tmp_path):
        # the per-iteration rank ⋈ edges must broadcast the rank side —
        # a sort-merge join here would shuffle the edge set K times.
        # The full query checkpoints each round (lineage truncated), so
        # pin the plan of one iteration built exactly as the loop does.
        from pyspark.sql import functions as F

        sf = _write_docs(spark, tmp_path, 60)
        edges = (webgraph._edges(spark, sf)
                 .filter(F.col("src_host") != F.col("dst_host"))
                 .select("src_host", "dst_host"))
        deg = edges.groupBy("src_host").agg(
            F.count("*").alias("outdeg"))
        hosts = (edges.select(F.col("src_host").alias("host"))
                 .union(edges.select(F.col("dst_host").alias("host")))
                 .distinct())
        rank = hosts.select(
            "host", F.lit(1).cast("long").alias("rank_ppb"))
        one_round = webgraph._pr_iterate(edges, deg, hosts, rank, 1)
        plan = (one_round
                ._jdf.queryExecution().executedPlan().toString())
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestPrecomputedRank:
    def test_frontier_precomputed_rank_identical(self, spark, tmp_path):
        """The deployed shape (rank materialized once, passed in) must
        be row-identical to the inline-recompute oracle form — for
        BOTH consumers of the rank table."""
        sf = _write_docs(spark, tmp_path, 60)
        rank = webgraph.q_host_pagerank(spark, sf).localCheckpoint()
        inline = webgraph.q_frontier_priority(spark, sf).collect()
        pre = webgraph.q_frontier_priority(spark, sf,
                                           rank=rank).collect()
        assert pre == inline
        w_inline = webgraph.q_host_sample_weights(spark, sf).collect()
        w_pre = webgraph.q_host_sample_weights(spark, sf,
                                               rank=rank).collect()
        assert w_pre == w_inline


class TestTriangles:
    def test_triangle_counts_star_and_clique(self, spark):
        """Adversarial shapes: a star hub has NO triangles (and under
        degree ordering generates no wedges at itself — every incident
        edge points into it); a 4-clique puts every member in C(3,2)=3
        triangles; a pendant edge contributes nothing."""
        from pdf_extractor_spark.queries.webgraph import triangle_counts
        star = [("hub", f"s{i}") for i in range(1, 6)]
        k4 = [("k1", "k2"), ("k1", "k3"), ("k1", "k4"),
              ("k2", "k3"), ("k2", "k4"), ("k3", "k4")]
        pendant = [("k4", "tail")]
        und = spark.createDataFrame(
            [(min(x), max(x)) for x in star + k4 + pendant],
            "a string, b string")
        got = {r.host: r.n_triangles
               for r in triangle_counts(und).collect()}
        assert got == {"hub": 0, "s1": 0, "s2": 0, "s3": 0, "s4": 0,
                       "s5": 0, "k1": 3, "k2": 3, "k3": 3, "k4": 3,
                       "tail": 0}

    def test_triangle_counts_match_bruteforce(self, spark):
        """Random-ish deterministic graph: degree-ordered counts equal
        a brute-force closure over all vertex triples."""
        from itertools import combinations
        from pdf_extractor_spark.queries.webgraph import triangle_counts
        hosts = [f"h{i}" for i in range(12)]
        edges = sorted({tuple(sorted((hosts[(i * 7 + j) % 12],
                                      hosts[(j * 5 + 1) % 12])))
                        for i in range(12) for j in range(1, 4)
                        if hosts[(i * 7 + j) % 12]
                        != hosts[(j * 5 + 1) % 12]})
        eset = set(edges)
        want = {h: 0 for h in {v for e in edges for v in e}}
        for tri in combinations(sorted(want), 3):
            if all(tuple(sorted(p)) in eset
                   for p in combinations(tri, 2)):
                for v in tri:
                    want[v] += 1
        und = spark.createDataFrame(edges, "a string, b string")
        got = {r.host: r.n_triangles
               for r in triangle_counts(und).collect()}
        assert got == want


class TestCrawlBudget:
    def test_quotas_sum_exactly_to_budget(self, spark):
        """Hamilton largest-remainder invariant: integer quotas sum to
        EXACTLY the budget (floor-only allocation under-shoots; naive
        rounding can over-shoot), and every quota is within 1 of its
        exact proportional share."""
        from pdf_extractor_spark.queries.webgraph import (CRAWL_BUDGET,
                                                          q_crawl_budget)
        rows = q_crawl_budget(spark, "/root/testdata/sf0.001").collect()
        assert sum(r.quota for r in rows) == CRAWL_BUDGET
        tot = sum(r.rank_ppb for r in rows)
        for r in rows:
            exact = CRAWL_BUDGET * r.rank_ppb / tot
            assert exact - 1 < r.quota < exact + 1
