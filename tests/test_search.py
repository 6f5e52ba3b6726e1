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


def _python_bpe(texts, k):
    """Mirror of q_bpe_merges: word-frequency BPE, one left-to-right
    non-overlapping replace pass per round, ties (lhs, rhs) asc."""
    words = {}
    for t in texts:
        if t.strip() == "":
            continue
        for w in t.split(" "):
            if w:
                words[w] = words.get(w, 0) + 1
    segs = {f" {' '.join(w)} ": c for w, c in words.items()}
    merges = []
    for rank in range(1, k + 1):
        pairs = {}
        for seg, c in segs.items():
            ws = seg.split()
            for a, b in zip(ws, ws[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        (lhs, rhs), cnt = sorted(pairs.items(),
                                 key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, lhs, rhs, cnt))
        nxt = {}
        for seg, c in segs.items():
            ns = seg.replace(f" {lhs} {rhs} ", f" {lhs}{rhs} ")
            nxt[ns] = nxt.get(ns, 0) + c
        segs = nxt
    return merges


class TestBpeMerges:
    def test_matches_python_reference(self, spark, tmp_path):
        texts = ["low lower lowest low low",
                 "newer newest new low",
                 "wider wide widest newer"]
        sf = _write_docs(spark, tmp_path, texts)
        got = [(r.merge_rank, r.lhs, r.rhs, r.pair_count)
               for r in search.q_bpe_merges(spark, sf).collect()]
        assert got == _python_bpe(texts, search.BPE_MERGES)

    def test_merged_symbols_chain_into_later_rounds(self, spark,
                                                    tmp_path):
        # 'ab' wins round 1; round 2 must see the fused symbol 'ab'
        # as a unit (merge ('ab','c') or ('x','ab') style), proving
        # rounds train on the UPDATED segmentation
        texts = ["abc abc abc abc abd"]
        sf = _write_docs(spark, tmp_path, texts)
        rows = search.q_bpe_merges(spark, sf).collect()
        assert (rows[0].lhs, rows[0].rhs) == ("a", "b")
        assert rows[1].lhs == "ab"  # fused symbol participates

    def test_single_pass_run_contract(self, spark, tmp_path):
        # documented deviation: (x,x) over 'xxxx' merges once per
        # round left-to-right: round 1 -> 'xx x x' ... the mirror
        # encodes the same rule, so equality IS the pin
        texts = ["xxxx xxxx yy"]
        sf = _write_docs(spark, tmp_path, texts)
        got = [(r.merge_rank, r.lhs, r.rhs, r.pair_count)
               for r in search.q_bpe_merges(spark, sf).collect()]
        assert got == _python_bpe(texts, search.BPE_MERGES)

    def test_encode_counts_match_python_mirror(self, spark, tmp_path):
        texts = ["low lower lowest low low",
                 "newer newest new low",
                 "wider wide widest newer"]
        sf = _write_docs(spark, tmp_path, texts)
        # python mirror: train, then tokenize each doc under the
        # final segmentations
        words = {}
        for t in texts:
            for w in t.split(" "):
                if w:
                    words[w] = words.get(w, 0) + 1
        segs = {w: f" {' '.join(w)} " for w in words}
        for _, lhs, rhs, _c in _python_bpe(texts, search.BPE_MERGES):
            segs = {w: s.replace(f" {lhs} {rhs} ", f" {lhs}{rhs} ")
                    for w, s in segs.items()}
        exp = {}
        for i, t in enumerate(texts):
            ws = [w for w in t.split(" ") if w]
            exp[i] = (len(ws), sum(len(segs[w].split()) for w in ws))
        got = {r.doc_id: (r.ws_tokens, r.bpe_tokens)
               for r in search.q_bpe_encode(spark, sf).collect()}
        assert got == exp
        # merges compress: bpe token count strictly below char count
        chars = {i: sum(len(w) for w in t.split(" ") if w)
                 for i, t in enumerate(texts)}
        assert all(got[i][1] < chars[i] for i in got)

    def test_property_random_corpus_matches_mirror(self, spark,
                                                   tmp_path):
        # seeded-random corpus with adversarial shapes: same-char runs
        # (the single-pass contract), single-char words, tie-forcing
        # repeats, multi-codepoint letters (split('') is per codepoint
        # in both Spark and the mirror)
        import random
        rng = random.Random(20260818)
        alphabet = list("abcdexyz") + ["é", "ß"]
        vocab = ["aaa", "xxxx", "q", "café", "straße"]
        for _ in range(60):
            vocab.append("".join(rng.choice(alphabet)
                                 for _ in range(rng.randint(1, 9))))
        texts = []
        for _ in range(25):
            texts.append(" ".join(rng.choice(vocab)
                                  for _ in range(rng.randint(0, 14))))
        texts.append("")
        sf = _write_docs(spark, tmp_path, texts)
        got_m = [(r.merge_rank, r.lhs, r.rhs, r.pair_count)
                 for r in search.q_bpe_merges(spark, sf).collect()]
        assert got_m == _python_bpe(texts, search.BPE_MERGES)


def _python_bpe_batched(texts, rounds, pool):
    """Mirror of bpe_train_batched: per round, rank the top-``pool``
    pairs by (count desc, lhs, rhs); keep candidate i iff its symbols
    overlap NO higher-ranked candidate; apply the kept batch as one
    left-to-right replace fold in rn order. Returns
    [(merge_rank, round, lhs, rhs, count)]."""
    words = {}
    for t in texts:
        if t.strip() == "":
            continue
        for w in t.split(" "):
            if w:
                words[w] = words.get(w, 0) + 1
    segs = {f" {' '.join(w)} ": c for w, c in words.items()}
    merges = []
    for k in range(1, rounds + 1):
        pairs = {}
        for seg, c in segs.items():
            ws = seg.split()
            for a, b in zip(ws, ws[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        cand = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        cand = [(rn + 1, lhs, rhs, cnt) for rn, ((lhs, rhs), cnt)
                in enumerate(cand[:pool])]
        sel = []
        for i, (rn, lhs, rhs, cnt) in enumerate(cand):
            syms = {lhs, rhs}
            if all(not ({l2, r2} & syms) for _rn2, l2, r2, _c2
                   in cand[:i]):
                sel.append((rn, lhs, rhs, cnt))
        if not sel:
            break
        merges.extend((k, rn, lhs, rhs, cnt)
                      for rn, lhs, rhs, cnt in sel)
        nxt = {}
        for seg, c in segs.items():
            for _rn, lhs, rhs, _c in sel:  # rn-ascending fold
                seg = seg.replace(f" {lhs} {rhs} ", f" {lhs}{rhs} ")
            nxt[seg] = nxt.get(seg, 0) + c
        segs = nxt
    return [(i + 1, k, lhs, rhs, cnt)
            for i, (k, _rn, lhs, rhs, cnt) in enumerate(merges)]


class TestBpeBatched:
    def test_matches_python_reference(self, spark, tmp_path):
        texts = ["low lower lowest low low",
                 "newer newest new low",
                 "wider wide widest newer"]
        sf = _write_docs(spark, tmp_path, texts)
        got = [(r.merge_rank, r.round, r.lhs, r.rhs, r.pair_count)
               for r in search.q_bpe_merges_batched(spark, sf).collect()]
        exp = _python_bpe_batched(texts, search.BPE_BATCH_ROUNDS,
                                  search.BPE_BATCH_POOL)
        assert got == exp

    def test_disjoint_pairs_batch_in_one_round(self, spark, tmp_path):
        # symbol-disjoint frequent pairs all merge in round 1 — the
        # wall-clock win over one-merge-per-round training
        texts = ["ab ab ab cd cd cd ef ef gh"]
        sf = _write_docs(spark, tmp_path, texts)
        rows = search.q_bpe_merges_batched(spark, sf).collect()
        r1 = {(r.lhs, r.rhs) for r in rows if r.round == 1}
        assert {("a", "b"), ("c", "d"), ("e", "f"), ("g", "h")} <= r1
        got = [(r.merge_rank, r.round, r.lhs, r.rhs, r.pair_count)
               for r in rows]
        assert got == _python_bpe_batched(
            texts, search.BPE_BATCH_ROUNDS, search.BPE_BATCH_POOL)

    def test_conflicting_pairs_pushed_to_later_rounds(self, spark,
                                                      tmp_path):
        # within word 'abc', pair (a,b) (count 5 incl. 'ab') outranks
        # (b,c) (count 4) and they share 'b', so round 1 may contain
        # ('a','b') but never ('b','c'); the conservative rule defers
        # the fused successor ('ab','c') to round 2
        texts = ["abc"] * 4 + ["ab"]
        sf = _write_docs(spark, tmp_path, texts)
        rows = search.q_bpe_merges_batched(spark, sf).collect()
        r1 = [(r.lhs, r.rhs) for r in rows if r.round == 1]
        assert ("a", "b") in r1
        assert ("b", "c") not in r1
        got = [(r.merge_rank, r.round, r.lhs, r.rhs, r.pair_count)
               for r in rows]
        assert got == _python_bpe_batched(
            texts, search.BPE_BATCH_ROUNDS, search.BPE_BATCH_POOL)

    def test_property_random_corpus_matches_mirror(self, spark,
                                                   tmp_path):
        import random
        rng = random.Random(20260819)
        alphabet = list("abcdexyz") + ["é", "ß"]
        vocab = ["aaa", "xxxx", "q", "café", "straße"]
        for _ in range(60):
            vocab.append("".join(rng.choice(alphabet)
                                 for _ in range(rng.randint(1, 9))))
        texts = []
        for _ in range(25):
            texts.append(" ".join(rng.choice(vocab)
                                  for _ in range(rng.randint(0, 14))))
        texts.append("")
        sf = _write_docs(spark, tmp_path, texts)
        got = [(r.merge_rank, r.round, r.lhs, r.rhs, r.pair_count)
               for r in search.q_bpe_merges_batched(spark, sf).collect()]
        assert got == _python_bpe_batched(
            texts, search.BPE_BATCH_ROUNDS, search.BPE_BATCH_POOL)

    def test_target_merges_loops_until_reached(self, spark, tmp_path):
        # the production form: keep batching rounds until >= target
        texts = ["low lower lowest low low",
                 "newer newest new low wider wide widest newer",
                 "analysis analyses analyzing analyzed analyzer"]
        sf = _write_docs(spark, tmp_path, texts)
        from pdf_extractor_spark.queries.search import (_bpe_words,
                                                        bpe_train_batched)
        merges, vocab = bpe_train_batched(_bpe_words(spark, sf),
                                          target_merges=30)
        assert merges.count() >= 30
        # segmentations still reconstruct their words exactly
        bad = vocab.filter(
            "replace(trim(seg), ' ', '') <> word").count()
        assert bad == 0


class TestBatchedBpeDegenerate:
    def test_empty_and_single_char_vocab_return_empty_merges(
            self, spark):
        """ADVICE r04: a corpus whose round-1 pair selection is empty
        (single-character words — no adjacent pairs) must return an
        empty merge table with the documented schema, not IndexError."""
        from pdf_extractor_spark.queries.search import bpe_train_batched
        words = spark.createDataFrame(
            [("a", 5), ("b", 3)], "word string, cnt bigint")
        merges, vocab = bpe_train_batched(words, rounds=2)
        assert merges.count() == 0
        assert merges.columns == ["round", "rn", "lhs", "rhs",
                                  "pair_count"]
        assert vocab.count() == 2
