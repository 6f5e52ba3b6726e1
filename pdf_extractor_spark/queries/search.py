"""Corpus relevance search: BM25 top-k retrieval, tf-idf key terms,
and BPE tokenizer training/encoding.

A training-data pipeline uses relevance scoring for targeted data
selection — "give me the documents most relevant to this query/domain
mix" (the retrieval step behind DSIR-style importance sampling and
benchmark-adjacent corpus audits). The reference has no retrieval
surface; this is part of the LLM-pipeline tier the engine adds.

Determinism contract (the repo's decimal-exact aggregate rule applied
to BM25): the only float op is ``ln`` — computed ONCE per query term
(≤ |terms| rows, never per posting), immediately rounded to an
INTEGER in micro-nats. Okapi's k1=1.2 / b=0.75 are folded into one
int64 floor division by multiplying numerator and denominator by
20·avgdl:

    tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  = 44·avgdl·tf / (20·avgdl·tf + 6·avgdl + 18·dl)

with avgdl itself floored (total_tokens div n_docs). Integer sums are
partition-order independent, so the result bytes cannot depend on the
physical plan — Spark and DuckDB agree bit-for-bit.

Scale shape: the token explode filters to the query terms BEFORE any
shuffle (a 3-term query ships ~3 rows per matching doc, not the
corpus's token stream); corpus stats and per-term idf are one-row /
|terms|-row broadcasts; the per-doc aggregate partial-combines; the
final top-k is a single-partition window over per-partition-limited
rows (WindowGroupLimit). int64 headroom: idf_u·44·avgdl·tf stays
below 2^63 for avgdl·tf up to ~6·10^9 — at true corpus scale avgdl is
a few hundred, so tf alone would need ~10^7 repeats of one term in
one document to overflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TERMS = ("spark", "vector", "stream")
TOP_K = 20
_W_ARR = "filter(split(text, ' '), x -> x <> '')"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k over the documents table for the fixed query
    ``TERMS`` (see module doc for the integer formulation).

    Zero-explode wide-aggregate shape (the minhash-signature move
    applied to retrieval): per-doc term frequencies are
    ``size(filter(w, x -> x = term))`` expressions — the token stream
    never leaves the row, so the corpus is scanned ONCE and nothing
    shuffles but (a) one 1-row stats aggregate (n, avgdl, and per-term
    document frequencies, map-side combined) and (b) the TOP_K heads
    of each partition (orderBy+limit = TakeOrderedAndProject; a global
    row_number window here measured 0.36 scaling efficiency at 500k
    docs — every scored doc shipped to one partition). The rank window
    runs after the limit, over TOP_K rows only."""
    tf_cols = [
        F.expr(f"size(filter(w, x -> x = '{t}'))").cast("long")
         .alias(f"tf_{i}")
        for i, t in enumerate(TERMS)]
    per_doc = (_t(spark, sf_dir, "documents")
               .filter(F.trim(F.col("text")) != "")
               .select("doc_id", F.expr(_W_ARR).alias("w"))
               .select("doc_id", F.size("w").cast("long").alias("dl"),
                       *tf_cols))
    stats = per_doc.agg(
        F.count("*").alias("n"),
        F.expr("sum(dl) div count(*)").alias("avgdl"),
        *[F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
          for i in range(len(TERMS))])
    # idf in micro-nats, one ln per TERM over the 1-row stats
    idf = stats.select("n", "avgdl", *[
        F.round(F.log(
            F.lit(1.0)
            + (2 * F.col("n") - 2 * F.col(f"df_{i}") + 1).cast("double")
            / (2 * F.col(f"df_{i}") + 1).cast("double"))
            * 1000000).cast("long").alias(f"idf_{i}")
        for i in range(len(TERMS))])
    c_exprs = [
        f"CASE WHEN tf_{i} > 0 THEN (idf_{i} * 44 * avgdl * tf_{i})"
        f" div (20 * avgdl * tf_{i} + 6 * avgdl + 18 * dl)"
        f" ELSE 0 END"
        for i in range(len(TERMS))]
    n_terms = " + ".join(
        f"CAST(tf_{i} > 0 AS LONG)" for i in range(len(TERMS)))
    scored = (per_doc.crossJoin(F.broadcast(idf))
              .select("doc_id",
                      F.expr(n_terms).cast("long").alias("n_terms"),
                      F.expr(" + ".join(c_exprs)).alias("score_u"))
              .filter(F.col("n_terms") > 0))
    topk = (scored.orderBy(F.desc("score_u"), F.asc("doc_id"))
            .limit(TOP_K))
    w = Window.orderBy(F.desc("score_u"), F.asc("doc_id"))
    return (topk.withColumn("rk", F.row_number().over(w))
            .orderBy("rk"))


_TERMS_SQL = ", ".join(f"'{t}'" for t in TERMS)

ORACLE_BM25 = f"""
WITH docs AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents WHERE trim(text) <> ''
), dl AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM docs
), stats AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(dl) AS BIGINT) // COUNT(*) AS avgdl
  FROM dl
), tok AS (
  SELECT doc_id, unnest(w) AS term FROM docs
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
  WHERE term IN ({_TERMS_SQL})
  GROUP BY doc_id, term
), dfq AS (
  SELECT term, COUNT(*) AS dfreq FROM tf GROUP BY term
), idf AS (
  SELECT term,
         CAST(ROUND(ln(1 + CAST(2 * s.n - 2 * dfreq + 1 AS DOUBLE)
                        / (2 * dfreq + 1)) * 1000000) AS BIGINT)
           AS idf_u
  FROM dfq, stats s
), contrib AS (
  SELECT tf.doc_id,
         (idf_u * 44 * s.avgdl * tf.tf)
           // (20 * s.avgdl * tf.tf + 6 * s.avgdl + 18 * d.dl) AS c_u
  FROM tf
  JOIN idf USING (term)
  JOIN dl d ON d.doc_id = tf.doc_id, stats s
), scored AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
         CAST(SUM(c_u) AS BIGINT) AS score_u
  FROM contrib GROUP BY doc_id
)
SELECT doc_id, n_terms, score_u, CAST(rk AS INTEGER) AS rk FROM (
  SELECT doc_id, n_terms, score_u,
         ROW_NUMBER() OVER (ORDER BY score_u DESC, doc_id ASC) AS rk
  FROM scored
) WHERE rk <= {TOP_K}
ORDER BY rk
"""


BPE_MERGES = 6


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training: learn the top-K merge rules
    from the corpus — the vocabulary-construction step of an LLM data
    platform.

    Scale shape: the corpus is touched ONCE (word-frequency table via
    map-side-combined count); every training round then runs on the
    compact vocab table — at web scale |vocab| is millions of rows
    while the corpus is trillions, which is why word-frequency BPE is
    the only formulation that scales. Each word's segmentation is a
    space-delimited symbol string, so applying a merge is ONE literal
    ``replace`` (both engines scan left-to-right non-overlapping —
    verified identical semantics), and the round's best pair feeds the
    replace as a broadcast 1-row column pair: the entire K-round
    training is DataFrame-lazy, no driver-side strings. Vocab table
    localCheckpointed per round (the PageRank/HITS lesson).

    Contract nuance (pinned by the oracle): one replace pass per
    round, i.e. a merge (x,x) applied to a run ``x x x`` yields
    ``xx x`` — exhaustive same-merge reapplication within a word (the
    HuggingFace behavior on ≥3-symbol runs) would need a fixpoint
    loop; real text makes this corner vanishingly rare and the
    deviation is documented rather than hidden.

    Determinism: best pair = max count, ties broken (lhs, rhs)
    ascending; counts are int64 sums of int64 word counts."""
    merges, _vocab = _bpe_train(spark, sf_dir)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out.orderBy("merge_rank")


def _bpe_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-frequency table — the ONE corpus touch of BPE training."""
    return (_t(spark, sf_dir, "documents")
            .filter(F.trim(F.col("text")) != "")
            .select(F.explode(F.expr(_W_ARR)).alias("word"))
            .groupBy("word").agg(F.count("*").alias("cnt")))


def _bpe_seg0(words: DataFrame) -> DataFrame:
    return words.select(
        "word", "cnt",
        F.expr("concat(' ', array_join(split(word, ''), ' '),"
               " ' ')").alias("seg"))


def _bpe_pair_counts(cur: DataFrame) -> DataFrame:
    """(lhs, rhs, pair_count) over the vocab table's segmentations —
    the shared round kernel of the sequential and batched trainers."""
    return (cur
            .select(F.expr("filter(split(trim(seg), ' '),"
                           " x -> x <> '')").alias("ws"), "cnt")
            .select(F.explode(F.expr(
                "CASE WHEN size(ws) >= 2 THEN"
                " transform(sequence(1, size(ws) - 1),"
                " i -> struct(ws[i-1] as lhs, ws[i] as rhs))"
                " ELSE cast(array() as"
                " array<struct<lhs:string,rhs:string>>) END"))
             .alias("p"), "cnt")
            .groupBy(F.col("p.lhs").alias("lhs"),
                     F.col("p.rhs").alias("rhs"))
            .agg(F.sum("cnt").alias("pair_count")))


def _bpe_train(spark: SparkSession, sf_dir: str):
    """Shared K-round training: returns ([per-round 1-row merge DFs],
    vocab DF (word, cnt, seg) carrying each word's FINAL
    segmentation). Segmentations are collision-free per word (strip
    the spaces and the original word reappears), so `word` rides
    through every round unchanged."""
    cur = _bpe_seg0(_bpe_words(spark, sf_dir)).localCheckpoint()
    merges = []
    for k in range(1, BPE_MERGES + 1):
        pairs = _bpe_pair_counts(cur)
        best = (pairs.orderBy(F.desc("pair_count"), F.asc("lhs"),
                              F.asc("rhs"))
                .limit(1).localCheckpoint())
        merges.append(best.select(
            F.lit(k).cast("int").alias("merge_rank"), "lhs", "rhs",
            "pair_count"))
        cur = (cur.crossJoin(F.broadcast(best))
               .select("word", "cnt", F.expr(
                   "replace(seg, concat(' ', lhs, ' ', rhs, ' '),"
                   " concat(' ', lhs, rhs, ' '))").alias("seg"))
               .localCheckpoint())
    return merges, cur


def _bpe_oracle() -> str:
    rounds = []
    prev = "s0"
    for k in range(1, BPE_MERGES + 1):
        rounds.append(f"""p{k} AS MATERIALIZED (
  SELECT lhs, rhs, CAST(SUM(cnt) AS BIGINT) AS pair_count FROM (
    SELECT ws[i] AS lhs, ws[i + 1] AS rhs, cnt FROM (
      SELECT list_filter(string_split(trim(seg), ' '), x -> x <> '')
               AS ws, cnt
      FROM {prev}
    ), LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i)
    WHERE len(ws) >= 2
  ) GROUP BY lhs, rhs
), b{k} AS MATERIALIZED (
  SELECT lhs, rhs, pair_count FROM p{k}
  ORDER BY pair_count DESC, lhs, rhs LIMIT 1
), s{k} AS MATERIALIZED (
  SELECT word, cnt,
         replace(seg, concat(' ', b.lhs, ' ', b.rhs, ' '),
                 concat(' ', b.lhs, b.rhs, ' ')) AS seg
  FROM {prev}, b{k} b
)""")
        prev = f"s{k}"
    its = ",\n".join(rounds)
    return f"""w AS MATERIALIZED (
  SELECT word, COUNT(*) AS cnt FROM (
    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
             AS word
    FROM documents WHERE trim(text) <> ''
  ) GROUP BY word
), s0 AS MATERIALIZED (
  SELECT word, cnt,
         concat(' ', array_to_string(string_split(word, ''), ' '),
                ' ') AS seg
  FROM w
),
{its}"""


def _bpe_merges_oracle() -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT {k} AS merge_rank, lhs, rhs, pair_count FROM b{k}"
        for k in range(1, BPE_MERGES + 1))
    return f"""
WITH {_bpe_oracle()}
SELECT CAST(merge_rank AS INTEGER) AS merge_rank, lhs, rhs, pair_count
FROM ({union}) ORDER BY merge_rank
"""


ORACLE_BPE = _bpe_merges_oracle()


# --- Batched BPE training (VERDICT r03 #5) ----------------------------------
#
# The sequential trainer learns ONE merge per round; with a ~2.3s/round
# scheduling floor in local mode (and a real cluster's job-launch floor),
# a 30k-merge production vocabulary is days of wall clock regardless of
# corpus parallelism. The standard fix is batching: per round, rank the
# top candidate pairs and apply every SYMBOL-DISJOINT one in a single
# vocab pass — pairs sharing no symbol have position-independent
# patterns, so one fold applies them all.
#
# Selection rule (deliberately conservative): candidate i survives iff
# its symbols overlap NO higher-ranked candidate in the pool — whether
# or not that candidate itself survived. Greedy selection (skip only
# conflicts with SELECTED pairs) batches slightly larger but is
# inherently sequential state; this rule is one anti-join, so the
# IDENTICAL rule runs as ANSI SQL in the DuckDB oracle and as a pure
# fold in the python mirror test. Fold order is rn-ascending in all
# three engines, so even order-sensitive corners (a later pair matching
# text a earlier merge just created) are bit-deterministic.

BPE_BATCH_ROUNDS = 3   # registry/oracle form: fixed unrollable rounds
BPE_BATCH_POOL = 40    # candidate pairs ranked per round


def _bpe_select_batch(pairs: DataFrame, pool: int) -> DataFrame:
    """Top-``pool`` candidates by (count desc, lhs, rhs) → the
    symbol-disjoint subset. Returns (rn, lhs, rhs, pair_count); ≤ pool
    rows, so every op below the limit is driver-trivial."""
    w = Window.orderBy(F.desc("pair_count"), F.asc("lhs"), F.asc("rhs"))
    cand = (pairs.orderBy(F.desc("pair_count"), F.asc("lhs"),
                          F.asc("rhs")).limit(pool)
            .withColumn("rn", F.row_number().over(w).cast("long"))
            .localCheckpoint())
    c = cand.alias("c")
    d = cand.alias("d")
    clash = ((F.col("d.rn") < F.col("c.rn"))
             & ((F.col("d.lhs") == F.col("c.lhs"))
                | (F.col("d.lhs") == F.col("c.rhs"))
                | (F.col("d.rhs") == F.col("c.lhs"))
                | (F.col("d.rhs") == F.col("c.rhs"))))
    return c.join(d, clash, "left_anti") \
        .select("c.rn", "c.lhs", "c.rhs", "c.pair_count")


def bpe_train_batched(words: DataFrame,
                      rounds: int = BPE_BATCH_ROUNDS,
                      pool: int = BPE_BATCH_POOL,
                      target_merges: int | None = None):
    """Batched BPE over a (word, cnt) table: each round applies a whole
    symbol-disjoint batch of merges in ONE vocab pass (an
    ``aggregate(pairs, seg, replace-fold)``), so learned-vocab size per
    unit wall-clock scales with the batch, not the round count.

    ``rounds`` fixes the round count (oracle-unrollable form);
    ``target_merges`` instead loops until ≥ that many merges are
    learned (the production form the scale bench drives). Returns
    (merges DF (round, rn, lhs, rhs, pair_count), final vocab DF)."""
    cur = _bpe_seg0(words).localCheckpoint()
    batches = []
    total, k = 0, 0
    while ((target_merges is None and k < rounds)
           or (target_merges is not None and total < target_merges)):
        k += 1
        sel = _bpe_select_batch(_bpe_pair_counts(cur), pool) \
            .localCheckpoint()
        n_sel = sel.count()
        if n_sel == 0:
            break
        batches.append(sel.select(
            F.lit(k).cast("int").alias("round"), "rn", "lhs", "rhs",
            "pair_count"))
        total += n_sel
        arr = (sel.select(F.struct("rn",
                                   F.concat_ws(" ", "lhs", "rhs")
                                   .alias("p")).alias("s"))
               .agg(F.collect_list("s").alias("sp"))
               .select(F.expr("transform(array_sort(sp), s -> s.p)")
                       .alias("pairs")))
        cur = (cur.crossJoin(F.broadcast(arr))
               .select("word", "cnt", F.expr(
                   "aggregate(pairs, seg, (acc, p) -> replace(acc,"
                   " concat(' ', p, ' '),"
                   " concat(' ', replace(p, ' ', ''), ' ')))")
                   .alias("seg"))
               .localCheckpoint())
    if not batches:
        # Degenerate corpus (empty, or every word a single character)
        # selects zero pairs in round 1 — return an empty merge table
        # with the documented schema instead of raising (ADVICE r04).
        merges = cur.sparkSession.createDataFrame(
            [], "round int, rn int, lhs string, rhs string,"
                " pair_count bigint")
        return merges, cur
    merges = batches[0]
    for b in batches[1:]:
        merges = merges.unionByName(b)
    return merges, cur


def q_bpe_merges_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry form of the batched trainer: ``BPE_BATCH_ROUNDS``
    rounds × pool-``BPE_BATCH_POOL`` disjoint batches — tens of merges
    for the round cost the sequential trainer pays per SINGLE merge.
    Global merge_rank is (round, within-round rank) order."""
    merges, _vocab = bpe_train_batched(_bpe_words(spark, sf_dir))
    w = Window.orderBy("round", "rn")
    return (merges
            .withColumn("merge_rank",
                        F.row_number().over(w).cast("int"))
            .select("merge_rank", "round", "lhs", "rhs", "pair_count")
            .orderBy("merge_rank"))


def _bpe_batched_oracle() -> str:
    pool = BPE_BATCH_POOL
    rounds = []
    prev = "s0"
    for k in range(1, BPE_BATCH_ROUNDS + 1):
        rounds.append(f"""p{k} AS MATERIALIZED (
  SELECT lhs, rhs, CAST(SUM(cnt) AS BIGINT) AS pair_count FROM (
    SELECT ws[i] AS lhs, ws[i + 1] AS rhs, cnt FROM (
      SELECT list_filter(string_split(trim(seg), ' '), x -> x <> '')
               AS ws, cnt
      FROM {prev}
    ), LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i)
    WHERE len(ws) >= 2
  ) GROUP BY lhs, rhs
), c{k} AS MATERIALIZED (
  SELECT lhs, rhs, pair_count,
         CAST(ROW_NUMBER() OVER (ORDER BY pair_count DESC, lhs, rhs)
              AS BIGINT) AS rn
  FROM (SELECT * FROM p{k}
        ORDER BY pair_count DESC, lhs, rhs LIMIT {pool})
), sel{k} AS MATERIALIZED (
  SELECT * FROM c{k} c
  WHERE NOT EXISTS (
    SELECT 1 FROM c{k} d WHERE d.rn < c.rn
      AND (d.lhs IN (c.lhs, c.rhs) OR d.rhs IN (c.lhs, c.rhs)))
), a{k} AS MATERIALIZED (
  SELECT string_split(string_agg(lhs || ' ' || rhs, chr(31)
                                 ORDER BY rn), chr(31)) AS pairs
  FROM sel{k}
), s{k} AS MATERIALIZED (
  SELECT word, cnt,
         list_reduce(list_prepend(seg, COALESCE(a.pairs, [])),
           (acc, p) -> replace(acc, ' ' || p || ' ',
                               ' ' || replace(p, ' ', '') || ' '))
           AS seg
  FROM {prev}, a{k} a
)""")
        prev = f"s{k}"
    its = ",\n".join(rounds)
    union = "\nUNION ALL\n".join(
        f"SELECT {k} AS round, rn, lhs, rhs, pair_count FROM sel{k}"
        for k in range(1, BPE_BATCH_ROUNDS + 1))
    return f"""
WITH w AS MATERIALIZED (
  SELECT word, COUNT(*) AS cnt FROM (
    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
             AS word
    FROM documents WHERE trim(text) <> ''
  ) GROUP BY word
), s0 AS MATERIALIZED (
  SELECT word, cnt,
         concat(' ', array_to_string(string_split(word, ''), ' '),
                ' ') AS seg
  FROM w
),
{its}
SELECT CAST(ROW_NUMBER() OVER (ORDER BY round, rn) AS INTEGER)
         AS merge_rank,
       CAST(round AS INTEGER) AS round, lhs, rhs, pair_count
FROM ({union}) ORDER BY merge_rank
"""


ORACLE_BPE_BATCHED = _bpe_batched_oracle()


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned BPE vocabulary: per-document token counts
    under the trained merges — the train→apply round trip a tokenizer
    pipeline runs (the compression ratio ws_tokens/bpe_tokens is the
    vocabulary-quality signal... inverted: bpe > ws since K merges is
    a tiny vocab).

    Scale shape: encoding happens on the UNIQUE-WORD table (apply K
    replaces to |vocab| rows), never on the token stream; the stream
    only contributes per-(doc, word) occurrence counts, joined back on
    word and aggregated per doc — at web scale that join is keyed on
    the word (both sides naturally partitioned by it), and the heavy
    side ships two ints per row."""
    _merges, vocab = _bpe_train(spark, sf_dir)
    tok = vocab.select(
        "word",
        F.expr("size(filter(split(trim(seg), ' '), x -> x <> ''))")
         .cast("long").alias("word_tokens"))
    docs = _t(spark, sf_dir, "documents")
    occ = (docs.filter(F.trim(F.col("text")) != "")
           .select("doc_id", F.explode(F.expr(_W_ARR)).alias("word"))
           .groupBy("doc_id", "word")
           .agg(F.count("*").alias("n_occ")))
    per_doc = (occ.join(tok, "word")
               .groupBy("doc_id")
               .agg(F.sum("n_occ").alias("ws_tokens"),
                    F.sum(F.col("n_occ") * F.col("word_tokens"))
                     .alias("bpe_tokens")))
    base = docs.select("doc_id")
    return (base.join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("ws_tokens", F.lit(0)).cast("long")
                     .alias("ws_tokens"),
                    F.coalesce("bpe_tokens", F.lit(0)).cast("long")
                     .alias("bpe_tokens"))
            .orderBy("doc_id"))


ORACLE_BPE_ENCODE = f"""
WITH {_bpe_oracle()},
wt AS (
  SELECT word,
         CAST(len(list_filter(string_split(trim(seg), ' '),
                              x -> x <> '')) AS BIGINT) AS word_tokens
  FROM s{BPE_MERGES}
), occ AS (
  SELECT doc_id, word, COUNT(*) AS n_occ FROM (
    SELECT doc_id,
           unnest(list_filter(string_split(text, ' '), x -> x <> ''))
             AS word
    FROM documents WHERE trim(text) <> ''
  ) GROUP BY doc_id, word
), per_doc AS (
  SELECT occ.doc_id,
         CAST(SUM(n_occ) AS BIGINT) AS ws_tokens,
         CAST(SUM(n_occ * word_tokens) AS BIGINT) AS bpe_tokens
  FROM occ JOIN wt USING (word) GROUP BY occ.doc_id
)
SELECT d.doc_id,
       COALESCE(p.ws_tokens, 0) AS ws_tokens,
       COALESCE(p.bpe_tokens, 0) AS bpe_tokens
FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
ORDER BY d.doc_id
"""


TFIDF_K = 3


def q_tfidf_keyterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document key-term extraction: top-``TFIDF_K`` terms per doc
    by tf-idf — the classic corpus-profiling / index-pruning pass.

    Unlike BM25 (fixed tiny query → zero-explode), key terms need the
    idf of EVERY word, so the vocab table cannot broadcast uncapped.
    Per-doc term frequencies are computed DOC-LOCALLY — array_sort the
    word array, take run starts, zip each with its run length — so the
    raw token stream never shuffles and the first exchange already
    carries distinct (doc, word, tf) pairs (measured: the
    explode+groupBy(doc_id, word) variant costs one extra pair-stream
    exchange+sort, eff 0.61 → this shape at 500k docs in
    BENCH/BASELINE.md). Remaining exchanges: df agg on word →
    pairs⋈idf on word → per-doc top-k. The top-k window is PARTITIONED
    by doc_id (no global window; rank ties break score desc, word asc
    — deterministic), with a Partial WindowGroupLimit pruning to k
    rows per doc below the exchange.

    Determinism: idf is ``round(1e6·ln(N/df))`` — one ln per VOCAB
    ENTRY, frozen to integer micro-nats; scores are int64 products."""
    docs = (_t(spark, sf_dir, "documents")
            .filter(F.trim(F.col("text")) != "")
            .select("doc_id", F.expr(_W_ARR).alias("ws")))
    nd = docs.agg(F.count("*").alias("n"))
    # staged-split rule: sw and its run starts live in their own
    # projections so lambdas don't recompute them per element
    pairs = (docs
             .select("doc_id", F.expr("array_sort(ws)").alias("sw"))
             .select("doc_id", "sw", F.expr(
                 "filter(sequence(1, size(sw)), i -> i = 1 OR"
                 " element_at(sw, i) <> element_at(sw, i - 1))")
                 .alias("st"))
             .select("doc_id", F.explode(F.expr(
                 "transform(st, (s, j) -> struct("
                 " element_at(sw, s) as w,"
                 " cast(coalesce(try_element_at(st, j + 2), size(sw) + 1)"
                 "      - s as bigint) as tf))")).alias("p"))
             .select("doc_id", F.col("p.w").alias("w"),
                     F.col("p.tf").alias("tf")))
    idf = (pairs.groupBy("w").agg(F.count("*").alias("df"))
           .crossJoin(F.broadcast(nd))
           .select("w", F.round(F.log(F.col("n").cast("double")
                                      / F.col("df")) * 1000000)
                   .cast("long").alias("idf_u")))
    scored = (pairs.join(idf, "w")
              .select("doc_id", "w", "tf",
                      (F.col("tf") * F.col("idf_u")).alias("score_u")))
    win = Window.partitionBy("doc_id").orderBy(F.desc("score_u"),
                                               F.asc("w"))
    return (scored.withColumn("rk", F.row_number().over(win)
                              .cast("long"))
            .filter(F.col("rk") <= TFIDF_K)
            .select("doc_id", "rk", "w", "tf", "score_u")
            .orderBy("doc_id", "rk"))


ORACLE_TFIDF = f"""
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents WHERE trim(text) <> ''
), tok AS (
  SELECT doc_id, unnest(ws) AS w FROM d
), pairs AS (
  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, w
), nd AS (
  SELECT COUNT(*) AS n FROM d
), idf AS (
  SELECT w, CAST(ROUND(ln(CAST(n AS DOUBLE) / COUNT(*)) * 1000000)
                 AS BIGINT) AS idf_u
  FROM pairs, nd GROUP BY w, n
), scored AS (
  SELECT p.doc_id, p.w, p.tf, p.tf * i.idf_u AS score_u
  FROM pairs p JOIN idf i USING (w)
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score_u DESC, w ASC) AS rk
  FROM scored
)
SELECT doc_id, rk, w, tf, score_u FROM ranked
WHERE rk <= {TFIDF_K} ORDER BY doc_id, rk
"""




# --- PMI collocations ---------------------------------------------------------

PMI_MIN_CNT = 5    # bigram support floor (rare pairs have unstable PMI)
PMI_TOPK = 50


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level collocation mining: the top-K adjacent word pairs
    by pointwise mutual information — the phrase-discovery pass behind
    tokenizer pre-merges and data-card vocabulary reports. All
    probabilities are over bigram EVENTS from one table: p(ab), the
    head marginal p(a.), the tail marginal p(.b) — so PMI =
    ln(c_ab.NB / (c_a..c_.b)), computed as a SUM OF LOGS in double
    (the product overflows int64 at web scale) and rounded ONCE to
    integer micro-nats (the bm25/bigram_logprob ln-once rule: result
    bytes identical across engines and partition orders).

    Scale shape: the corpus is touched ONCE — the pair explode feeds
    one map-side-combined aggregate onto the bigram-vocab table, which
    is MATERIALIZED (localCheckpoint — the PageRank/NB snapshot rule)
    because four consumers read it (support filter, head/tail
    marginals, total) and column pruning makes their subplans
    non-identical, so exchange reuse cannot deduplicate them: without
    the cut the static plan re-explodes the corpus four times. Every
    later step re-aggregates or broadcasts onto that VOCAB-sized
    snapshot, never the corpus. The final top-K is orderBy+limit ⇒
    TakeOrderedAndProject (per-partition heaps, no global sort
    materialization); ties break on (a, b) for a deterministic set."""
    docs = (_t(spark, sf_dir, "documents")
            .filter(F.trim(F.col("text")) != "")
            .select("doc_id", F.expr(_W_ARR).alias("w")))
    pairs = docs.select(F.explode(F.expr(
        "CASE WHEN size(w) >= 2 THEN"
        " transform(sequence(0, size(w)-2),"
        " i -> struct(w[i] as a, w[i+1] as b)) ELSE"
        " cast(array() as array<struct<a:string,b:string>>) END"))
        .alias("p")).select("p.a", "p.b")
    B = pairs.groupBy("a", "b").agg(F.count("*").alias("c_ab")) \
        .localCheckpoint()
    heads = B.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    tails = B.groupBy("b").agg(F.sum("c_ab").alias("c_b"))
    tot = B.agg(F.sum("c_ab").alias("nb"))
    return (B.filter(F.col("c_ab") >= PMI_MIN_CNT)
            .join(F.broadcast(heads), "a")
            .join(F.broadcast(tails), "b")
            .crossJoin(F.broadcast(tot))
            .select("a", "b", "c_ab",
                    F.round((F.log(F.col("c_ab").cast("double"))
                             + F.log(F.col("nb").cast("double"))
                             - F.log(F.col("c_a").cast("double"))
                             - F.log(F.col("c_b").cast("double")))
                            * 1000000).cast("long").alias("pmi_u"))
            .orderBy(F.desc("pmi_u"), "a", "b")
            .limit(PMI_TOPK))


ORACLE_PMI = f"""
WITH wd AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents WHERE trim(text) <> ''
), bg AS (
  SELECT w[i] AS a, w[i + 1] AS b
  FROM wd, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
  WHERE len(w) >= 2
), B AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab FROM bg GROUP BY a, b
), heads AS (
  SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM B GROUP BY a
), tails AS (
  SELECT b, CAST(SUM(c_ab) AS BIGINT) AS c_b FROM B GROUP BY b
), tot AS (
  SELECT CAST(SUM(c_ab) AS BIGINT) AS nb FROM B
)
SELECT B.a, B.b, c_ab,
       CAST(ROUND((ln(CAST(c_ab AS DOUBLE)) + ln(CAST(nb AS DOUBLE))
                   - ln(CAST(c_a AS DOUBLE)) - ln(CAST(c_b AS DOUBLE)))
                  * 1000000) AS BIGINT) AS pmi_u
FROM B JOIN heads USING (a) JOIN tails USING (b), tot
WHERE c_ab >= {PMI_MIN_CNT}
ORDER BY pmi_u DESC, a, b LIMIT {PMI_TOPK}
"""


QUERIES = {
    "pmi_collocations": (q_pmi_collocations, ORACLE_PMI),
    "tfidf_keyterms": (q_tfidf_keyterms, ORACLE_TFIDF),
    "bm25_topk": (q_bm25_topk, ORACLE_BM25),
    "bpe_merges": (q_bpe_merges, ORACLE_BPE),
    "bpe_merges_batched": (q_bpe_merges_batched, ORACLE_BPE_BATCHED),
    "bpe_encode": (q_bpe_encode, ORACLE_BPE_ENCODE),
}
