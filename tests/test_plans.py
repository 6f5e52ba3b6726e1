"""Physical-plan quality gates (.explain-based).

At 100 TB the *plan* is the product: these tests pin the properties
that make each query scale — predicate pushdown into the parquet scan,
column pruning, broadcast joins for dimensions, partial (map-side)
aggregation, and a shuffle-free fused extraction stage. A regression
that silently turns a broadcast join into a sort-merge join or drops a
pushed filter fails here, not in a 1000-executor postmortem.
"""

import re

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.pipeline.extract import extract_pages
from pdf_extractor_spark.queries import dedup, relational, simsearch
from pdf_extractor_spark.sources.pages import synth_pages_df

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def nodes(plan: str, name: str) -> int:
    """Count physical nodes in the details section — each appears once
    as '(N) NodeName' (the tree section would double-count)."""
    return len(re.findall(rf"^\(\d+\) {name}\b", plan, re.M))


class TestPushdownAndPruning:
    def test_filter_pushed_to_scan(self, spark):
        plan = plan_of(relational.q_order_priority(spark, SF_DIR))
        assert "PushedFilters" in plan
        assert re.search(r"PushedFilters: \[.*GreaterThan\(o_totalprice",
                         plan), plan

    def test_column_pruning_reads_only_needed(self, spark):
        plan = plan_of(relational.q_order_priority(spark, SF_DIR))
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m, plan
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        assert cols == {"o_orderpriority", "o_totalprice"}, cols

    def test_shipdate_filter_pushed(self, spark):
        plan = plan_of(relational.q_pricing_summary(spark, SF_DIR))
        assert "PushedFilters" in plan and "l_shipdate" in plan

    def test_docs_scan_prunes_text_stats(self, spark):
        # doc_word_stats needs only doc_id + text, not lang/source/n_chars
        plan = plan_of(relational.q_doc_word_stats(spark, SF_DIR))
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        assert cols == {"doc_id", "text"}, cols


class TestJoinStrategies:
    def test_dims_broadcast(self, spark):
        plan = plan_of(relational.q_market_revenue(spark, SF_DIR))
        assert nodes(plan, "BroadcastHashJoin") == 2, plan
        assert "SortMergeJoin" not in plan

    def test_semi_and_anti_broadcast(self, spark):
        semi = plan_of(relational.q_word_semi_join(spark, SF_DIR))
        anti = plan_of(relational.q_word_anti_join(spark, SF_DIR))
        assert "BroadcastHashJoin" in semi and "LeftSemi" in semi
        assert "BroadcastHashJoin" in anti and "LeftAnti" in anti

    def test_ann_query_side_broadcast(self, spark):
        plan = plan_of(simsearch.q_ann_bruteforce_topk(spark, SF_DIR))
        assert "BroadcastNestedLoopJoin" in plan or \
               "BroadcastHashJoin" in plan

    def test_lsh_candidates_are_window_not_join(self, spark):
        # star-shaped LSH candidates: bucket representative via a
        # window over (band, band_key) — NO pair join exists at all
        # (the all-pairs bucket join was the measured 0.28-efficiency
        # straggler on mega-buckets; see q_dedup_minhash_lsh docstring)
        plan = plan_of(dedup.q_dedup_minhash_lsh(spark, SF_DIR))
        assert nodes(plan, "Window") >= 1, plan
        assert "SortMergeJoin" not in plan and \
            "ShuffledHashJoin" not in plan, plan
        # the only joins allowed are the broadcast perm-table builds
        assert "BroadcastNestedLoopJoin" in plan or \
            "BroadcastHashJoin" in plan or nodes(plan, "Join") == 0

    def test_simhash_bands_window_not_join(self, spark):
        plan = plan_of(dedup.q_simhash_bands(spark, SF_DIR))
        assert nodes(plan, "Window") >= 1, plan
        assert "SortMergeJoin" not in plan and \
            "ShuffledHashJoin" not in plan, plan


class TestFactToFactJoins:
    def test_semi_join_never_nested_loop(self, spark):
        plan = plan_of(relational.q_orders_with_returns(spark, SF_DIR))
        assert "LeftSemi" in plan, plan
        assert "NestedLoop" not in plan, plan

    def test_anti_join_never_nested_loop(self, spark):
        plan = plan_of(relational.q_orders_fully_discounted(spark, SF_DIR))
        assert "LeftAnti" in plan, plan
        assert "NestedLoop" not in plan, plan

    def test_rolling_window_single_shuffle(self, spark):
        # RANGE-frame window: one hash exchange on event_type, one
        # range exchange for the final orderBy — nothing else
        plan = plan_of(relational.q_events_rolling_hour(spark, SF_DIR))
        assert nodes(plan, "Window") == 1, plan
        assert nodes(plan, "Exchange") <= 2, plan


class TestTemporalOps:
    def test_asof_join_is_pure_window(self, spark):
        from pdf_extractor_spark.queries import temporal
        plan = plan_of(temporal.q_events_asof_join(spark, SF_DIR))
        # the as-of rewrite must compile to a window, never a join
        assert "Join" not in plan, plan
        assert nodes(plan, "Window") >= 1, plan

    def test_range_join_is_equi_keyed(self, spark):
        from pdf_extractor_spark.queries import temporal
        plan = plan_of(temporal.q_events_range_join(spark, SF_DIR))
        assert "NestedLoop" not in plan, plan  # bucketed equi-join only

    def test_salted_agg_two_phases(self, spark):
        from pdf_extractor_spark.queries import temporal
        plan = plan_of(temporal.q_salted_type_counts(spark, SF_DIR))
        # (salt,key) partial+final, then key partial+final ⇒ ≥4 nodes
        assert nodes(plan, "HashAggregate") >= 4, plan


class TestAggregation:
    def test_partial_aggregation(self, spark):
        # map-side combine: partial + final HashAggregate pairs
        plan = plan_of(relational.q_pricing_summary(spark, SF_DIR))
        assert nodes(plan, "HashAggregate") >= 2
        assert "partial_" in plan.lower() or "merge_" in plan.lower()

    def test_single_shuffle_for_groupby(self, spark):
        plan = plan_of(relational.q_pattern_profile(spark, SF_DIR))
        # one shuffle for the groupBy, one for the final orderBy — no more
        assert nodes(plan, "Exchange") <= 2, plan


class TestMarkdownValidatorPlan:
    def test_single_doc_shuffle_feeds_both_windows(self, spark):
        """markdown_errors runs TWO windows (fence sessionization on
        doc_id; per-section cap on doc_id+section_id) off ONE
        hashpartitioning exchange — the cap window's requirement is
        satisfied by the doc_id partitioning (subset rule), so no
        second data shuffle exists; the only other Exchange is the
        rangepartitioning for the final orderBy."""
        from pdf_extractor_spark.queries import mdvalidate
        plan = plan_of(mdvalidate.q_markdown_errors(spark, SF_DIR))
        assert nodes(plan, "Exchange") == 2, plan
        assert len(re.findall(r"Arguments: hashpartitioning", plan)) == 1, \
            plan
        assert len(re.findall(r"Arguments: rangepartitioning", plan)) == 1, \
            plan
        assert nodes(plan, "Window") == 2, plan

    def test_cap_uses_window_group_limit(self, spark):
        # the row_number <= K filter must push into WindowGroupLimit
        # (top-k per group before the full sort, bounded state)
        from pdf_extractor_spark.queries import mdvalidate
        plan = plan_of(mdvalidate.q_markdown_errors(spark, SF_DIR))
        assert nodes(plan, "WindowGroupLimit") >= 1, plan

    def test_md_scan_prunes_columns(self, spark):
        from pdf_extractor_spark.queries import mdvalidate
        plan = plan_of(mdvalidate.q_markdown_errors(spark, SF_DIR))
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        assert cols == {"doc_id", "text"}, cols


class TestExtractionStage:
    def test_fused_single_python_stage(self, spark):
        pages = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"),
            F.lit(None).cast("timestamp").alias("warc_ts"),
            F.lit(None).cast("binary").alias("html"),
            "text", "lang").limit(8)
        df = extract_pages(pages,
                           levels=("raw", "lines", "chapters",
                                   "processed", "markdown"))
        plan = plan_of(df)
        # all five levels run in exactly ONE Arrow crossing
        assert nodes(plan, "MapInPandas") == 1, plan

    def test_no_shuffle_in_extraction(self, spark):
        df = extract_pages(synth_pages_df(spark, n=8))
        plan = plan_of(df)
        assert nodes(plan, "Exchange") == 0, plan

    def test_stats_rollup_is_partial_agg(self, spark):
        from pdf_extractor_spark.pipeline.extract import extraction_stats
        df = extraction_stats(extract_pages(synth_pages_df(spark, n=8)))
        plan = plan_of(df)
        # generation stage + extraction stage, still fused: no extra crossing
        assert nodes(plan, "MapInPandas") == 2
        assert nodes(plan, "HashAggregate") >= 2  # partial + final


class TestRound3Plans:
    def test_contamination_benchmark_broadcast(self, spark):
        """r05 staged-build form: the held-out shingle set broadcasts
        into a real hash join; the corpus side never shuffles by
        shingle value, the hit groupBy(doc_id) partial-aggregates
        map-side (≤1 row/doc crosses even at a 100% hit rate), and —
        the r05 fixes — the shingle hash pipeline binds split(text)
        ONCE (staged projections, no O(words²) lambda re-evaluation)
        and the emptiness filter is the scan-cheap
        size(split(...)) >= 3 form, never the computed shingle column
        (predicate pushdown would inline the whole hash pipeline into
        the Filter and evaluate it twice per row)."""
        plan = plan_of(dedup.q_benchmark_contamination(spark, SF_DIR))
        assert nodes(plan, "BroadcastHashJoin") == 1, plan  # LEFT probe
        assert nodes(plan, "SortMergeJoin") == 0, plan
        # 3 hash/range exchanges: bench distinct, doc groupBy (carrying
        # BOTH n_shingles and the hit count), presentation sort
        assert nodes(plan, "Exchange") <= 3, plan
        # bench distinct + the one doc aggregate, each partial+final
        assert nodes(plan, "HashAggregate") == 4, plan
        # staged-build invariants: no fresh split(text) is ever indexed
        # by a lambda variable (the O(words²) signature — shingle
        # lambdas must index the STAGED w column), and the hash
        # pipeline never rides a Filter condition (pushdown inlining)
        import re
        assert not re.search(r"split\(text[^]]*\)\[lambda", plan), plan
        for line in plan.splitlines():
            if "Filter" in line and "md5" in line:
                raise AssertionError(f"hash pipeline inlined into a "
                                     f"Filter: {line[:200]}")

    def test_pii_scrub_is_scan_project_sort(self, spark):
        """PII redaction is a pure projection: the only exchange is the
        final presentation sort; no join, no Python."""
        from pdf_extractor_spark.queries import textstats
        plan = plan_of(textstats.q_pii_scrub(spark, SF_DIR))
        assert nodes(plan, "MapInPandas") == 0
        assert nodes(plan, "BroadcastHashJoin") == 0
        assert nodes(plan, "SortMergeJoin") == 0
        # rangepartitioning for the orderBy is the single exchange
        assert plan.count("Exchange") <= 2, plan

    def test_kmeans_assign_no_window(self, spark):
        """The argmax is a struct-max AGGREGATE (map-side combinable),
        not a row_number window — no per-vector sort."""
        plan = plan_of(simsearch.q_kmeans_assign(spark, SF_DIR))
        assert nodes(plan, "Window") == 0, plan


class TestCurationPlans:
    def test_ngram_is_zero_shuffle_projection(self, spark):
        """The whole repetition profile (grams, distinct count, mode
        fold) is array expressions over (doc_id, text) — no Python
        stage, no join, no aggregate; the ONLY exchange is the
        presentation sort."""
        from pdf_extractor_spark.queries import curation
        plan = plan_of(curation.q_ngram_repetition(spark, SF_DIR))
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        assert cols == {"doc_id", "text"}, cols
        assert nodes(plan, "MapInPandas") == 0
        assert nodes(plan, "SortMergeJoin") == 0
        assert nodes(plan, "BroadcastHashJoin") == 0
        assert nodes(plan, "HashAggregate") == 0, plan
        assert plan.count("Exchange") <= 2, plan  # rangepartition sort

    def test_gopher_is_zero_shuffle_projection(self, spark):
        """The composite filter shares the same shape: one projection,
        no join between the word stats and the bigram signals."""
        from pdf_extractor_spark.queries import curation
        plan = plan_of(curation.q_gopher_quality_filter(spark, SF_DIR))
        assert nodes(plan, "MapInPandas") == 0
        assert nodes(plan, "SortMergeJoin") == 0
        assert nodes(plan, "BroadcastHashJoin") == 0
        assert nodes(plan, "HashAggregate") == 0, plan
        assert plan.count("Exchange") <= 2, plan

    def test_pack_sequences_no_full_table_global_window(self, spark):
        """The hierarchy: exactly three Window nodes (within-bucket,
        bucket-offset, superbucket-offset), offsets re-attached via
        broadcast — never a sort-merge join, never a cartesian."""
        from pdf_extractor_spark.queries import curation
        plan = plan_of(curation.q_pack_sequences(spark, SF_DIR))
        assert nodes(plan, "Window") == 3, plan
        assert nodes(plan, "BroadcastHashJoin") == 2, plan
        assert nodes(plan, "SortMergeJoin") == 0, plan
        assert nodes(plan, "CartesianProduct") == 0, plan

    def test_temperature_rates_broadcast(self, spark):
        """The per-language rate table is a tiny aggregate broadcast
        back onto the corpus — the big side never shuffles by lang
        for the join."""
        from pdf_extractor_spark.queries import curation
        plan = plan_of(curation.q_temperature_sample(spark, SF_DIR))
        assert nodes(plan, "BroadcastHashJoin") >= 1, plan
        assert nodes(plan, "SortMergeJoin") == 0, plan

    def test_semantic_dedup_pairs_never_cartesian(self, spark):
        """Candidate pairs are generated ONLY within a cluster (equi
        join on k) — a cartesian/nested-loop here would be the
        quadratic blowup the method exists to avoid."""
        from pdf_extractor_spark.queries import curation
        plan = plan_of(curation.q_semantic_dedup(spark, SF_DIR))
        assert nodes(plan, "CartesianProduct") == 0, plan
        assert nodes(plan, "BroadcastNestedLoopJoin") == 0, plan

    def test_boilerplate_vocab_broadcasts_for_removal(self, spark):
        """The boilerplate vocabulary is tiny — it must broadcast back
        onto the exploded corpus (anti join), so the corpus never
        shuffles by word for the removal step."""
        from pdf_extractor_spark.queries import curation
        plan = plan_of(curation.q_boilerplate_strip(spark, SF_DIR))
        assert re.search(r"BroadcastHashJoin .*LeftAnti", plan), plan
        assert nodes(plan, "SortMergeJoin") == 0, plan


class TestTextstatsPlans:
    """Round 3 rewrote the five per-document text-analysis queries
    from explode→groupBy (one shuffled row per WORD — ~2×10^14 shuffle
    rows at 10^12 docs) into doc-local array folds.  Pin that shape:
    no aggregate, no explode/Generate, no Python stage; the only
    exchange left is the presentation sort."""

    @pytest.mark.parametrize("name", [
        "q_lang_id", "q_quality_score", "q_token_count",
        "q_doc_fingerprint", "q_doc_winnow"])
    def test_zero_shuffle_array_fold(self, spark, name):
        from pdf_extractor_spark.queries import textstats
        plan = plan_of(getattr(textstats, name)(spark, SF_DIR))
        assert nodes(plan, "HashAggregate") == 0, plan
        assert nodes(plan, "ObjectHashAggregate") == 0, plan
        assert nodes(plan, "SortAggregate") == 0, plan
        assert nodes(plan, "Generate") == 0, plan  # no explode
        assert nodes(plan, "MapInPandas") == 0, plan
        assert nodes(plan, "SortMergeJoin") == 0, plan
        assert nodes(plan, "BroadcastHashJoin") == 0, plan
        assert nodes(plan, "Window") == 0, plan
        assert plan.count("Exchange") <= 2, plan  # presentation sort

    def test_textstats_reads_only_needed_columns(self, spark):
        """The word-array projection must not drag the full documents
        schema through the scan."""
        from pdf_extractor_spark.queries import textstats
        plan = plan_of(textstats.q_token_count(spark, SF_DIR))
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        assert cols == {"doc_id", "text"}, cols


class TestWebcurPlans:
    """Web-curation operators (queries/webcur.py): the span join must
    stay an equi-join on the k-gram hash (never a nested loop — the
    DF cap exists so the hash key is joinable at scale), and URL
    canonicalization must stay pure codegen string algebra."""

    def test_duplicate_spans_equi_join_only(self, spark):
        from pdf_extractor_spark.queries import webcur
        plan = plan_of(webcur.q_duplicate_spans(spark, SF_DIR))
        assert nodes(plan, "BroadcastNestedLoopJoin") == 0, plan
        assert nodes(plan, "CartesianProduct") == 0, plan
        assert nodes(plan, "MapInPandas") == 0, plan
        # islands assembly is ONE window keyed by the doc pair
        assert nodes(plan, "Window") == 1, plan

    def test_span_scrub_star_no_pair_join(self, spark):
        """The star scrub must stay Θ(postings): equi-joins only, and
        no self-join of postings with postings (the owners side is an
        aggregate, so a second Generate-fed scan would betray a pair
        join shape)."""
        from pdf_extractor_spark.queries import webcur
        plan = plan_of(webcur.q_span_scrub_star(spark, SF_DIR))
        assert nodes(plan, "BroadcastNestedLoopJoin") == 0, plan
        assert nodes(plan, "CartesianProduct") == 0, plan
        assert nodes(plan, "MapInPandas") == 0, plan
        # islands = lag + running sum: two Window passes (different
        # frames) off ONE doc_id exchange/sort — not a second shuffle
        assert nodes(plan, "Window") == 2, plan

    def test_url_canonicalize_is_scan_project_sort(self, spark):
        from pdf_extractor_spark.queries import webcur
        plan = plan_of(webcur.q_url_canonicalize(spark, SF_DIR))
        assert nodes(plan, "HashAggregate") == 0, plan
        assert nodes(plan, "SortMergeJoin") == 0, plan
        assert nodes(plan, "BroadcastHashJoin") == 0, plan
        assert nodes(plan, "Window") == 0, plan
        assert nodes(plan, "Generate") == 0, plan
        assert nodes(plan, "MapInPandas") == 0, plan
        assert plan.count("Exchange") <= 2, plan  # presentation sort
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        assert cols == {"doc_id", "source"}, cols

    def test_domain_cap_partial_window_group_limit(self, spark):
        """The host cap must ship ≤ K rows per host per input partition
        into the shuffle: row_number <= K compiles to WindowGroupLimit
        in Partial mode BEFORE the exchange and Final after — that pair
        is the whole skew defense (a mega-host never concentrates in
        one reducer), so its disappearance is a scale regression."""
        from pdf_extractor_spark.queries import webcur
        plan = plan_of(webcur.q_domain_cap(spark, SF_DIR))
        assert nodes(plan, "WindowGroupLimit") == 2, plan
        assert re.search(r"row_number\(\), 10, Partial", plan), plan
        assert re.search(r"row_number\(\), 10, Final", plan), plan
        # the Partial limit sits BELOW the host exchange in the tree:
        # in the tree section (root printed first, leaves last) the
        # Partial node's id is smaller than the host Exchange's id
        m = re.search(r"WindowGroupLimit \((\d+)\)\n\s+\+- Sort \(\d+\)\n"
                      r"\s+\+- Project", plan)
        assert m, plan  # leaf-side Partial directly above the projections

    def test_crawl_deltas_single_data_exchange(self, spark):
        """Recrawl dedup must compute all three window quantities
        (capture rank, lag hash, capture count) off ONE exchange keyed
        on canonical_url — the unordered count window reuses the rank
        window's sort, so there is exactly one data Exchange plus the
        presentation sort, one Sort, and the scan reads doc_id only
        (url/ts/body are synthesized)."""
        from pdf_extractor_spark.queries import webcur
        plan = plan_of(webcur.q_crawl_deltas(spark, SF_DIR))
        assert nodes(plan, "Window") == 2, plan
        assert nodes(plan, "Exchange") <= 2, plan
        assert nodes(plan, "SortMergeJoin") == 0, plan
        assert nodes(plan, "HashAggregate") == 0, plan
        assert nodes(plan, "Generate") == 0, plan
        assert nodes(plan, "MapInPandas") == 0, plan
        # exactly one Sort under the windows (the count window must
        # not re-sort) + the presentation sort
        assert nodes(plan, "Sort") <= 2, plan
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        assert cols == {"doc_id"}, cols

    def test_mojibake_fix_is_scan_project_sort(self, spark):
        """The encoding repair must stay a pure codegen projection: no
        UDF, no regex... just literal StaticInvoke replaces riding the
        scan — the only Exchange is the presentation sort."""
        from pdf_extractor_spark.queries import webcur
        plan = plan_of(webcur.q_mojibake_fix(spark, SF_DIR))
        assert nodes(plan, "HashAggregate") == 0, plan
        assert nodes(plan, "Window") == 0, plan
        assert nodes(plan, "Generate") == 0, plan
        assert nodes(plan, "MapInPandas") == 0, plan
        assert nodes(plan, "BatchEvalPython") == 0, plan
        assert nodes(plan, "Exchange") <= 1, plan  # presentation sort
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        assert cols == {"doc_id", "text"}, cols


class TestRound4Plans:
    def test_tfidf_topk_window_is_doc_partitioned(self, spark):
        """Key-term top-k must rank within doc partitions — a global
        (empty-partitionBy) window would serialize the whole corpus
        onto one task. The ONE window in the plan is partitioned by
        doc_id, and the pair stream reaches it via keyed exchanges of
        distinct (doc, word) pairs, never the raw token stream."""
        from pdf_extractor_spark.queries import search
        plan = plan_of(search.q_tfidf_keyterms(spark, SF_DIR))
        assert "windowspecdefinition(doc_id" in plan, plan
        # the rank is pruned to k rows per doc BEFORE the doc_id
        # exchange (Partial WindowGroupLimit), so the shuffle carries
        # <=k rows per doc, not the full scored pair stream
        assert "WindowGroupLimit" in plan, plan
        assert plan.count("Partial") >= 1 and \
            plan.index("WindowGroupLimit") < len(plan), plan

    def test_robots_verdict_is_broadcast_fold(self, spark):
        """The corpus-touching pass of robots_filter must be a
        doc-local fold over the broadcast rules map — no window, no
        sort-merge join, no corpus exchange; the only aggregates build
        the tiny host→rules map."""
        from pdf_extractor_spark.queries import webcur
        plan = plan_of(webcur.q_robots_filter(spark, SF_DIR))
        assert nodes(plan, "Window") == 0, plan
        assert nodes(plan, "SortMergeJoin") == 0, plan
        assert "element_at" in plan, plan
        assert "BroadcastNestedLoopJoin" in plan or \
            "BroadcastExchange" in plan, plan

    def test_dedup_sentences_window_and_hot_join_free(self, spark):
        """First-wins sentence dedup must survive the universal-
        boilerplate hot key: the winner per unit is a hash AGGREGATE
        (map-side combinable), never a window or a join keyed on the
        unit hash; per-doc totals fold doc-locally in the scan."""
        plan = plan_of(dedup.q_dedup_sentences(spark, SF_DIR))
        assert nodes(plan, "Window") == 0, plan
        assert nodes(plan, "SortMergeJoin") == 0, plan
        # partial+final pairs for winners and kept; the only joins are
        # the small per-doc (totals x kept) assembly
        assert nodes(plan, "HashAggregate") >= 4, plan

    def test_dedup_sentences_first_wins_semantics(self, spark,
                                                  tmp_path):
        rows = [
            (1, "alpha beta. common line. gamma"),
            (2, "common line. delta. common line"),  # cross- and
            (3, "common line"),                      # within-doc dups
            (4, "   "),                              # no units -> absent
        ]
        sf = str(tmp_path)
        spark.createDataFrame(rows, "doc_id long, text string") \
            .write.parquet(f"{sf}/documents.parquet")
        got = {r.doc_id: (r.n_units, r.n_kept, r.kept_bp)
               for r in dedup.q_dedup_sentences(spark, sf).collect()}
        # doc 1 keeps all 3 (first sighting of 'common line');
        # doc 2 keeps 'delta' only (both 'common line' copies lose,
        # including its own second copy); doc 3 keeps nothing
        assert got == {1: (3, 3, 10000), 2: (3, 1, 3333),
                       3: (1, 0, 0)}
        assert 4 not in got

    def test_dsir_scoring_is_broadcast_fold(self, spark):
        """DSIR's corpus-touching pass must be the same zero-shuffle
        broadcast-map fold as NB scoring; the hashed-bucket training
        aggregate (<=512 keys, map-side combined) and the presentation
        sort are the only exchanges. No window, no sort-merge join."""
        from pdf_extractor_spark.queries import curation
        plan = plan_of(curation.q_dsir_weights(spark, SF_DIR))
        assert nodes(plan, "Window") == 0, plan
        assert nodes(plan, "SortMergeJoin") == 0, plan
        assert "element_at" in plan, plan        # the per-doc map fold
        assert "BroadcastNestedLoopJoin" in plan or \
            "BroadcastExchange" in plan, plan
        # training side: exactly one hashaggregate pair keyed on the
        # bucket column (exchange carries <=512 rows per partition)
        assert "b#" in plan or "hashpartitioning" in plan, plan

    def test_nb_quality_scoring_is_broadcast_fold(self, spark):
        """The corpus-touching pass of the NB classifier (scoring all
        docs) must be a broadcast map fold — no window, no sort-merge
        join anywhere, and the trained-vocab map reaches the doc scan
        via broadcast; training aggregates are the only exchanges
        besides the presentation sort."""
        from pdf_extractor_spark.queries import curation
        plan = plan_of(curation.q_nb_quality_score(spark, SF_DIR))
        assert nodes(plan, "Window") == 0, plan
        assert nodes(plan, "SortMergeJoin") == 0, plan
        assert "element_at" in plan, plan        # the per-doc map fold
        assert "BroadcastNestedLoopJoin" in plan or \
            "BroadcastExchange" in plan, plan


class TestTrainingPlans:
    def test_badwords_is_zero_shuffle_projection(self, spark):
        """Blocklist membership is a doc-local array filter — no join
        against a list table, no aggregate; the only exchange is the
        presentation sort."""
        from pdf_extractor_spark.queries import training
        plan = plan_of(training.q_badwords_filter(spark, SF_DIR))
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        assert cols == {"doc_id", "text"}, cols
        assert nodes(plan, "HashAggregate") == 0, plan
        assert nodes(plan, "SortMergeJoin") == 0, plan
        assert nodes(plan, "BroadcastHashJoin") == 0, plan
        assert plan.count("Exchange") <= 2, plan  # rangepartition sort

    def test_host_reputation_broadcast_rollup(self, spark):
        """The host table (one row per source) joins back to the doc
        stream via BROADCAST — the doc side must never shuffle by
        source for the join; the rollup itself is a partial-agged
        exchange on the host key."""
        from pdf_extractor_spark.queries import training
        plan = plan_of(training.q_host_reputation(spark, SF_DIR))
        assert nodes(plan, "BroadcastHashJoin") == 1, plan
        assert nodes(plan, "SortMergeJoin") == 0, plan
        assert nodes(plan, "Window") == 0, plan
        assert re.search(r"HashAggregate.*\n.*Keys \[1\]: \[source",
                         plan) or "partial_count" in plan, plan

    def test_chunk_windows_is_doc_local_fanout(self, spark):
        """The doc→window fan-out is explode(sequence) + slice inside
        one projection — no window function, no join, no aggregate;
        only the presentation sort exchanges."""
        from pdf_extractor_spark.queries import training
        plan = plan_of(training.q_chunk_windows(spark, SF_DIR))
        assert nodes(plan, "Generate") >= 1, plan   # the explode
        assert nodes(plan, "Window") == 0, plan
        assert nodes(plan, "HashAggregate") == 0, plan
        assert nodes(plan, "SortMergeJoin") == 0, plan
        assert nodes(plan, "BroadcastHashJoin") == 0, plan
        assert plan.count("Exchange") <= 2, plan

    def test_shard_export_partial_agg(self, spark):
        """The manifest aggregate must combine map-side: partial
        HashAggregate below the shard-key exchange, final above — the
        reduce side sees N_SHARDS x n_partitions rows, not the
        corpus."""
        from pdf_extractor_spark.queries import training
        plan = plan_of(training.q_shard_export(spark, SF_DIR))
        assert nodes(plan, "HashAggregate") == 2, plan
        assert "partial_count" in plan, plan
        assert nodes(plan, "SortMergeJoin") == 0, plan

    def test_training_verdicts(self, spark):
        """Value semantics on a pinned micro-corpus: badwords tiers,
        host rollup, window fan-out edge (len == stride boundary)."""
        import pyspark.sql.functions as F

        from pdf_extractor_spark.queries import training
        rows = [(1, "clean text only here", "h1"),
                (2, "slow dup slow dup slow", "h1"),       # dense
                (3, "one slow word among nineteen " +
                    " ".join(["filler"] * 15), "h2")]      # 1/20 words
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string") \
            .withColumn("n_chars", F.length("text").cast("long"))
        got = {r.doc_id: (r.n_bad, r.verdict)
               for r in training.badwords_verdicts(docs).collect()}
        assert got == {1: (0, "kept"), 2: (5, "blocked"),
                       3: (1, "flagged")}, got

    def test_chunk_windows_boundary(self, spark, tmp_path):
        """A doc with exactly WIN_STRIDE tokens yields ONE window (the
        second start would be empty); WIN_STRIDE+1 tokens yield two,
        the second with exactly 1 token."""
        from pdf_extractor_spark.queries import training
        sf = str(tmp_path)
        n1, n2 = training.WIN_STRIDE, training.WIN_STRIDE + 1
        rows = [(1, " ".join(["a"] * n1)), (2, " ".join(["b"] * n2))]
        spark.createDataFrame(rows, "doc_id long, text string") \
            .write.parquet(f"{sf}/documents.parquet")
        got = [(r.doc_id, r.win_id, r.win_tokens)
               for r in training.q_chunk_windows(spark, sf).collect()]
        assert got == [(1, 0, n1), (2, 0, n2), (2, 1, 1)], got

    def test_select_to_budget_no_corpus_sort(self, spark):
        """Budget selection must never globally sort the corpus: the
        only unpartitioned window runs over the per-score HISTOGRAM
        (post-aggregate), the within-score window is partitioned by
        quality_bp and fed by the pre-filtered boundary branch, and the
        histogram reaches both branches via broadcast."""
        from pdf_extractor_spark.queries import training
        plan = plan_of(training.q_select_to_budget(spark, SF_DIR))
        # normal corpus -> the ADAPTIVE body picks the window boundary
        # (tiny straddling score): histogram cum windows run over the
        # checkpointed snapshot (one per branch broadcast), plus the
        # one within-score window; exactly two corpus scans (decided +
        # boundary branches) — the histogram never re-scans
        assert nodes(plan, "Window") == 3, plan
        assert len(re.findall(
            r"windowspecdefinition\(quality_bp#\d+L, doc_id#", plan)) \
            == 1, plan
        assert nodes(plan, "Scan parquet") == 2, plan
        assert nodes(plan, "SortMergeJoin") == 0, plan
        # (the histogram's map-side-combined aggregate ran at snapshot
        # build time — it is not part of this plan by design)

    def test_select_to_budget_adaptive_paths_agree(self, spark,
                                                   tmp_path):
        """Forcing the hierarchy boundary (window_max=0) must produce
        exactly the window path's rows — the adaptive choice changes
        the plan, never the result. The forced plan must contain the
        doc_id-bucketed hierarchy and no score-partitioned window."""
        import pyspark.sql.functions as F

        from pdf_extractor_spark.queries import training
        docs = spark.read.parquet(
            f"{SF_DIR}/documents.parquet")
        want = {tuple(r) for r in
                training.budget_select(docs).collect()}
        forced = training.budget_select(docs, window_max=0)
        plan = plan_of(forced)
        assert re.search(r"windowspecdefinition\(bucket#", plan), plan
        assert not re.search(
            r"windowspecdefinition\(quality_bp#\d+L, doc_id#", plan), \
            plan
        assert {tuple(r) for r in forced.collect()} == want

    def test_select_to_budget_boundary_semantics(self, spark,
                                                 tmp_path):
        """Two score tiers; the budget line falls inside the low tier:
        a doc is kept iff tokens selected before it are under budget,
        ties within a score resolve by doc_id."""
        from pdf_extractor_spark.queries import training
        sf = str(tmp_path)
        hi = [(i, " ".join(["abcde"] * 50)) for i in range(100)]
        lo = [(100 + i, " ".join(["abcde"] * 10)) for i in range(600)]
        spark.createDataFrame(hi + lo, "doc_id long, text string") \
            .write.parquet(f"{sf}/documents.parquet")
        rows = training.q_select_to_budget(spark, sf).collect()
        kept = {r.doc_id for r in rows if r.kept}
        scores = {r.doc_id: r.quality_bp for r in rows}
        assert scores[0] == 7000 and scores[100] == 3800
        # hi tier: 100 docs x 50 tokens = 5000, all funded; lo tier:
        # pe(k-th lo doc) = 5000 + 10k < 10000 -> k <= 499
        assert kept == set(range(100)) | set(range(100, 600 + 0)), \
            (len(kept), min(kept), max(kept))

    def test_quality_confusion_no_doc_join(self, spark):
        """Both verdicts are doc-local scoring passes landing in ONE
        projection — the eval must never shuffle the corpus by doc_id
        to co-locate prediction with label (the naive score⋈label
        shape). Training's tiny aggregates are the only keyed work."""
        from pdf_extractor_spark.queries import curation
        plan = plan_of(curation.q_quality_confusion(spark, SF_DIR))
        assert nodes(plan, "SortMergeJoin") == 0, plan
        assert nodes(plan, "Window") == 0, plan
        # the corpus-touching pass: no exchange hash-partitioned on
        # doc_id anywhere (training joins labels doc_id-keyed but
        # BROADCAST, never a doc_id shuffle)
        assert not re.search(r"hashpartitioning\(doc_id#", plan), plan
        assert "element_at" in plan, plan  # the broadcast-map fold

    def test_pack_manifest_hierarchy_and_local_fanout(self, spark):
        """The manifest inherits pack_sequences' hierarchical prefix
        sum (3 windows, offsets re-attached via broadcast — never a
        corpus-wide unbounded window), then fans out doc-locally
        (Generate) into a seq_id-keyed partial-agged rollup."""
        from pdf_extractor_spark.queries import curation
        plan = plan_of(curation.q_pack_manifest(spark, SF_DIR))
        assert nodes(plan, "Window") == 3, plan
        assert nodes(plan, "BroadcastHashJoin") == 2, plan
        assert nodes(plan, "SortMergeJoin") == 0, plan
        assert nodes(plan, "Generate") == 1, plan
        assert "partial_count" in plan, plan

    def test_pmi_corpus_once_topk_heap(self, spark):
        """PMI touches the corpus ONCE (one explode into one
        map-side-combined aggregate); marginals and the total join
        back as broadcasts onto the vocab table, and the top-K is a
        TakeOrderedAndProject heap, not a global sort."""
        from pdf_extractor_spark.queries import search
        plan = plan_of(search.q_pmi_collocations(spark, SF_DIR))
        # the bigram table is checkpointed, so the plan reads the
        # snapshot (ExistingRDD) — zero parquet scans, zero explodes
        # (without the cut: four of each, one per marginal consumer)
        assert nodes(plan, "Generate") == 0, plan
        assert nodes(plan, "Scan parquet") == 0, plan
        assert "TakeOrderedAndProject" in plan, plan
        assert nodes(plan, "SortMergeJoin") == 0, plan
        assert nodes(plan, "BroadcastHashJoin") == 2, plan

    def test_eval_holdout_partial_window_group_limit(self, spark):
        """The exact-k holdout must prune to K rows per language
        BEFORE the lang exchange (Partial WindowGroupLimit) — a
        one-language corpus ships K rows per input partition, never
        the corpus."""
        from pdf_extractor_spark.queries import textstats
        plan = plan_of(textstats.q_eval_holdout(spark, SF_DIR))
        assert "WindowGroupLimit" in plan, plan
        assert re.search(r"WindowGroupLimit.*\n.*Partial", plan,
                         ) or plan.count("WindowGroupLimit") >= 2, plan
        assert nodes(plan, "SortMergeJoin") == 0, plan

    def test_text_metrics_zero_shuffle(self, spark):
        """All three A4 signals are doc-local folds in one projection
        — no explode, no aggregate, no join; only the presentation
        sort exchanges (the first cut shuffled the full word AND char
        streams through two keyed aggregates + a doc_id join)."""
        plan = plan_of(relational.q_text_metrics(spark, SF_DIR))
        assert nodes(plan, "Generate") == 0, plan
        assert nodes(plan, "HashAggregate") == 0, plan
        assert nodes(plan, "SortMergeJoin") == 0, plan
        assert nodes(plan, "BroadcastHashJoin") == 0, plan
        assert plan.count("Exchange") <= 2, plan

    def test_curation_pipeline_quality_rides_base_scan(self, spark):
        """The quality fold lands in the same projection as the
        repetition fold — the assembly joins only the two genuinely
        keyed signals (dedup winner, contamination); no third doc_id
        join exists for quality."""
        from pdf_extractor_spark.queries import textstats
        plan = plan_of(textstats.q_curation_pipeline(spark, SF_DIR))
        # 5 joins = 2 assembly (dup, contam) + 3 internal to those
        # keyed signals; before the fusion quality was a 3rd assembly
        # join with its own corpus scan (6 joins, 7 scans)
        assert nodes(plan, "SortMergeJoin") == 0, plan
        assert nodes(plan, "BroadcastHashJoin") <= 5, plan
        assert nodes(plan, "Scan parquet") <= 6, plan

    def test_datacard_rollup_single_pass(self, spark):
        """All three grouping levels come from ONE aggregate (Expand +
        partial/final HashAggregate pair) over one scan — never a
        union of three separate aggregations."""
        plan = plan_of(relational.q_corpus_datacard(spark, SF_DIR))
        assert nodes(plan, "Expand") == 1, plan
        assert nodes(plan, "Scan parquet") == 1, plan
        assert nodes(plan, "Union") == 0, plan
        assert "partial_count" in plan, plan


class TestRegistryWidePlanInvariants:
    def test_no_query_carries_quadratic_or_filter_inlined_heavy_exprs(
            self, spark):
        """Registry-wide sweep of every query's physical plan for the
        two pathologies the round-5 contamination A/B uncovered
        (BENCH/BASELINE.md round-5 section):

        1. a fresh split() indexed by a lambda variable — O(words²)
           per doc, re-evaluating the split per element; appears when
           an optimizer rule (predicate pushdown, the size()>0
           constraint InferFiltersFromGenerate derives for explodes)
           substitutes a staged alias chain back into a lambda context;
        2. an md5/transform-bearing expression inside a Filter
           condition — the computed-column-filter pushdown inlining
           that evaluates a projection-heavy pipeline twice per row.

        Plans only (sf0.001 paths, nothing executes), so the sweep
        stays cheap; a new query regressing either invariant fails by
        name."""
        import re

        from pdf_extractor_spark.queries import queries as qreg

        quadratic = re.compile(r"split\((text|ws)[^]]*\)\[lambda")
        offenders = {}
        for name, fn in qreg().items():
            plan = plan_of(fn(spark, SF_DIR))
            hits = []
            if quadratic.search(plan):
                hits.append("lambda-indexed fresh split (O(words^2))")
            for line in plan.splitlines():
                if "Filter" in line and ("md5" in line
                                         or "transform(" in line):
                    hits.append(f"heavy expr in Filter: {line[:120]}")
                    break
            if hits:
                offenders[name] = hits
        assert not offenders, offenders
