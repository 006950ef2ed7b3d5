"""Corpus-curation operators: the model-based-filter / chunking /
incremental-dedup stages of a training-data pipeline.

Beyond-reference capability (the reference — `hive.py:49-99` — has no
document processing at all; these extend the north-star LLM-pipeline
families already in `text.py` / `dedup.py` / `pipeline.py`). All
deterministic, all built-in JVM expressions (no Python in the hot
path), all oracle-checked.

Scale notes per operator live on the functions; the common theme: every
op is a single scan of `documents` plus at most one digest-keyed
shuffle — document BODIES never shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orionld_to_hive_spark.sources.warehouse import load_table

from .text import (
    GOPHER_MAX_MWL,
    GOPHER_MAX_SYMBOL_RATIO,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_ALPHA_FRAC,
    GOPHER_MIN_MWL,
    GOPHER_MIN_WORDS,
    STOPWORDS,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# --------------------------------------------------------------------------
# Model-based quality filter: a fixed linear classifier (fastText /
# FineWeb-Edu-style quality model stand-in) over cheap lexical features.
# The weights are frozen constants, so the whole scorer is one codegen'd
# projection — zero shuffles, zero Python. We output the raw logit
# (sums/products of doubles are IEEE-exact cross-engine; a sigmoid's
# exp() is not guaranteed bit-identical, and the decision only needs the
# sign) rounded to 6 dp, plus the keep decision logit >= 0.
CLF_W0 = -2.0  # bias
CLF_W_LOGN = 0.9  # ln(1 + n_tokens)
CLF_W_STOP = -3.5  # stopword ratio
CLF_W_MWL = 0.15  # mean word length


def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    sw_ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / n
    mean_wl = (F.length("text") - (n - 1)) / n
    logit = (
        F.lit(CLF_W0)
        + F.lit(CLF_W_LOGN) * F.log(n + F.lit(1))
        + F.lit(CLF_W_STOP) * sw_ratio
        + F.lit(CLF_W_MWL) * mean_wl
    )
    return _docs(spark, sf_dir).select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(logit, 6).alias("clf_logit"),
        (logit >= 0).alias("clf_keep"),
    )


QUALITY_CLF_SQL = f"""
WITH feats AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n,
         len(list_filter(string_split(text, ' '),
             t -> t IN ({", ".join(repr(s) for s in STOPWORDS)})))::DOUBLE
           / len(string_split(text, ' ')) AS sw_ratio,
         (length(text) - (len(string_split(text, ' ')) - 1))::DOUBLE
           / len(string_split(text, ' ')) AS mean_wl
  FROM documents
)
SELECT doc_id,
       CAST(n AS INTEGER) AS n_tokens,
       round(sw_ratio, 6) AS stopword_ratio,
       round(mean_wl, 6) AS mean_word_len,
       round({CLF_W0} + {CLF_W_LOGN} * ln(n + 1)
             + {CLF_W_STOP} * sw_ratio + {CLF_W_MWL} * mean_wl, 6)
         AS clf_logit,
       ({CLF_W0} + {CLF_W_LOGN} * ln(n + 1)
        + {CLF_W_STOP} * sw_ratio + {CLF_W_MWL} * mean_wl) >= 0 AS clf_keep
FROM feats
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Fixed-window chunking with overlap — the context-window/RAG-embedding
# preparation step. Each document fans out to ceil(n/stride) chunks of
# up to CHUNK_TOKENS tokens, consecutive chunks overlapping by
# CHUNK_TOKENS - CHUNK_STRIDE tokens. The fan-out is a generated
# sequence + explode inside one projection: partition-local, no
# shuffle, and the per-row output is bounded (chunk text ≤ 64 tokens)
# regardless of document length — a 1 GB document becomes many small
# rows, never one giant one.
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    chunk = F.slice(toks, F.col("start"), CHUNK_TOKENS)
    return (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            "text",
            F.explode(
                F.sequence(F.lit(1), F.size(toks), F.lit(CHUNK_STRIDE))
            ).alias("start"),
        )
        .select(
            "doc_id",
            ((F.col("start") - 1) / CHUNK_STRIDE).cast("int").alias("chunk_id"),
            F.size(chunk).alias("n_chunk_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
        )
    )


DOC_CHUNKS_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n
  FROM documents
)
SELECT doc_id,
       CAST((s - 1) // {CHUNK_STRIDE} AS INTEGER) AS chunk_id,
       CAST(len(toks[s:s + {CHUNK_TOKENS - 1}]) AS INTEGER) AS n_chunk_tokens,
       array_to_string(toks[s:s + {CHUNK_TOKENS - 1}], ' ') AS chunk_text,
       md5(array_to_string(toks[s:s + {CHUNK_TOKENS - 1}], ' ')) AS chunk_hash
FROM t, unnest(generate_series(1, n, {CHUNK_STRIDE})) AS u(s)
ORDER BY doc_id, chunk_id
"""


# --------------------------------------------------------------------------
# Incremental dedup: screen a NEW batch of documents against the
# already-ingested corpus without re-deduplicating the corpus itself —
# the steady-state mode of a growing 100 TB warehouse, where the daily
# batch is ~0.1% of the corpus. Only 32-char digests are joined (bodies
# stay put); the corpus side reduces to distinct digests (map-side
# combined), and because the batch side is small relative to the
# corpus, a production deployment would broadcast the BATCH digests and
# stream the corpus past them — no corpus shuffle at all. The batch
# here is the deterministic doc_id % 5 == 0 slice so the oracle can
# reproduce it.
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    batch = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", F.md5("text").alias("content_hash")
    )
    corpus_hashes = (
        docs.filter(F.col("doc_id") % 5 != 0)
        .select(F.md5("text").alias("corpus_hash"))
        .distinct()
    )
    return (
        batch.join(
            corpus_hashes,
            batch.content_hash == corpus_hashes.corpus_hash,
            "left",
        )
        .select(
            "doc_id",
            "content_hash",
            F.when(F.col("corpus_hash").isNull(), F.lit(0))
            .otherwise(F.lit(1))
            .cast("int")
            .alias("is_dup"),
        )
    )


DEDUP_INCREMENTAL_SQL = """
WITH corpus AS (
  SELECT DISTINCT md5(text) AS corpus_hash
  FROM documents WHERE doc_id % 5 <> 0
)
SELECT d.doc_id, md5(d.text) AS content_hash,
       CAST(CASE WHEN c.corpus_hash IS NULL THEN 0 ELSE 1 END AS INTEGER)
         AS is_dup
FROM documents d LEFT JOIN corpus c ON md5(d.text) = c.corpus_hash
WHERE d.doc_id % 5 = 0
ORDER BY d.doc_id
"""


# --------------------------------------------------------------------------
# Sequence-length curriculum bins: power-of-two token-length buckets per
# source (bin = floor(log2 n) + 1, computed as the bit-length of the
# integer — exact integer arithmetic, no cross-engine float log). One
# map-side-combined aggregate over ≤ sources × 64 keys.
def seq_len_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = F.size(F.split(F.col("text"), " "))
    return (
        _docs(spark, sf_dir)
        .select("source", F.length(F.bin(n)).cast("int").alias("len_bin"), n.alias("n"))
        .groupBy("source", "len_bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("sum_tokens"),
            F.min("n").alias("min_tokens"),
            F.max("n").alias("max_tokens"),
        )
    )


SEQ_LEN_CURRICULUM_SQL = """
WITH t AS (
  SELECT source, len(string_split(text, ' ')) AS n
  FROM documents
)
SELECT source,
       CAST(length(printf('%b', n)) AS INTEGER) AS len_bin,
       COUNT(*) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS sum_tokens,
       CAST(MIN(n) AS INTEGER) AS min_tokens,
       CAST(MAX(n) AS INTEGER) AS max_tokens
FROM t
GROUP BY source, len_bin
ORDER BY source, len_bin
"""


# --------------------------------------------------------------------------
# Cross-source content-overlap matrix: how many documents each pair of
# sources shares — the "which crawls duplicate each other" diagnostic
# that decides mixture weights. The key is an 8-token prefix
# fingerprint (cheap near-dup key: re-crawled pages keep their opening
# even when boilerplate shifts the tail; exact-body equality finds
# nothing across sources in this corpus). Reduces to distinct (source,
# digest) pairs first (map-side combine), then a digest-keyed
# self-join; only digests shuffle, and the a.source < b.source
# predicate halves the pair space.
PREFIX_FP_TOKENS = 8


def cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    fp = F.md5(
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, PREFIX_FP_TOKENS), " "
        )
    )
    hashes = _docs(spark, sf_dir).select("source", fp.alias("h")).distinct()
    a = hashes.alias("a")
    b = hashes.alias("b")
    return (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count_distinct(F.col("a.h")).alias("n_shared"))
    )


CROSS_SOURCE_OVERLAP_SQL = f"""
WITH h AS (SELECT DISTINCT source,
             md5(array_to_string(
               string_split(text, ' ')[1:{PREFIX_FP_TOKENS}], ' ')) AS h
           FROM documents)
SELECT a.source AS source_a, b.source AS source_b,
       COUNT(DISTINCT a.h) AS n_shared
FROM h a JOIN h b ON a.h = b.h AND a.source < b.source
GROUP BY a.source, b.source
ORDER BY source_a, source_b
"""


# --------------------------------------------------------------------------
# Quality-filter ensemble: the three filter families this engine
# implements individually — Gopher rules (text.py), the linear
# classifier (above), and the unigram perplexity filter (text.py) —
# composed into ONE fused plan with per-source yield accounting, the
# way a production pipeline actually gates a corpus. The rule and
# classifier gates are projections on the document scan; the
# perplexity gate joins the per-doc avg-logprob branch (explode →
# vocab aggregate → word-keyed LM join, unhinted — vocabulary-sized
# frames are never force-broadcast → per-doc decimal sum) back on
# doc_id. The gate threshold compares the exactly-reproducible
# avg_logprob (decimal-summed, rounded) rather than exp(·) of it, so
# no cross-engine transcendental sits on a decision boundary.
PPL_LOGPROB_CUT = -3.405  # ≈ perplexity 30.1 on this corpus


def quality_ensemble_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)

    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    mean_wl = (F.length("text") - (n - 1)).cast("double") / n
    alpha_frac = (
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double") / n
    )
    n_hash = F.length("text") - F.length(
        F.replace(F.col("text"), F.lit("#"), F.lit(""))
    )
    n_ellipsis = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit("..."), F.lit("")))
    ) / 3
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / n
    gopher_keep = (
        (n >= GOPHER_MIN_WORDS)
        & (n <= GOPHER_MAX_WORDS)
        & (mean_wl >= GOPHER_MIN_MWL)
        & (mean_wl <= GOPHER_MAX_MWL)
        & (alpha_frac >= GOPHER_MIN_ALPHA_FRAC)
        & (symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO)
    )
    sw_ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / n
    clf_keep = (
        F.lit(CLF_W0)
        + F.lit(CLF_W_LOGN) * F.log(n + F.lit(1))
        + F.lit(CLF_W_STOP) * sw_ratio
        + F.lit(CLF_W_MWL) * mean_wl
    ) >= 0
    gates = docs.select(
        "doc_id",
        "source",
        n.alias("n_tokens"),
        gopher_keep.alias("g"),
        clf_keep.alias("c"),
    )

    words = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    # persisted: the vocab-sized count table feeds BOTH the corpus
    # total (broadcast build) and the LM projection — without the cache
    # the words→groupBy pipeline executed twice (r13, interleaved A/B
    # 1.06×, one vocab aggregation instead of two at any scale)
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("c")).persist()
    # corpus total via 1-row agg broadcast, not a global window (which
    # would move the whole vocabulary frame through one task at scale)
    total_df = counts.agg(F.sum("c").cast("double").alias("corpus_total"))
    lm = counts.crossJoin(F.broadcast(total_df)).select(
        "word",
        F.round(F.log(F.col("c") / F.col("corpus_total")), 9).alias("logp"),
    )
    perdoc = (
        words.join(lm, "word")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("logp").cast("decimal(27,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_lp")
        )
    )

    flag = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    p = F.col("avg_lp") >= PPL_LOGPROB_CUT
    keep_all = F.col("g") & F.col("c") & p
    return (
        gates.join(perdoc, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            flag(F.col("g")).alias("n_pass_gopher"),
            flag(F.col("c")).alias("n_pass_clf"),
            flag(p).alias("n_pass_ppl"),
            flag(keep_all).alias("n_pass_all"),
            F.round(
                F.sum(F.when(keep_all, 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("yield_frac"),
            F.sum(F.when(keep_all, F.col("n_tokens")).otherwise(0))
            .cast("long")
            .alias("kept_tokens"),
        )
    )


QUALITY_ENSEMBLE_SQL = f"""
WITH gates AS (
  SELECT doc_id, source,
         len(string_split(text, ' ')) AS n,
         (length(text) - (len(string_split(text, ' ')) - 1))::DOUBLE
           / len(string_split(text, ' ')) AS mean_wl,
         len(list_filter(string_split(text, ' '),
             t -> regexp_matches(t, '[a-z]')))::DOUBLE
           / len(string_split(text, ' ')) AS alpha_frac,
         ((length(text) - length(replace(text, '#', '')))
          + (length(text) - length(replace(text, '...', ''))) / 3)::DOUBLE
           / len(string_split(text, ' ')) AS symbol_ratio,
         len(list_filter(string_split(text, ' '),
             t -> t IN ({", ".join(repr(s) for s in STOPWORDS)})))::DOUBLE
           / len(string_split(text, ' ')) AS sw_ratio
  FROM documents
),
flags AS (
  SELECT doc_id, source, n,
         (n >= {GOPHER_MIN_WORDS} AND n <= {GOPHER_MAX_WORDS}
          AND mean_wl >= {GOPHER_MIN_MWL} AND mean_wl <= {GOPHER_MAX_MWL}
          AND alpha_frac >= {GOPHER_MIN_ALPHA_FRAC}
          AND symbol_ratio <= {GOPHER_MAX_SYMBOL_RATIO}) AS g,
         ({CLF_W0} + {CLF_W_LOGN} * ln(n + 1)
          + {CLF_W_STOP} * sw_ratio + {CLF_W_MWL} * mean_wl) >= 0 AS c
  FROM gates
),
words AS (
  SELECT doc_id, w AS word
  FROM documents, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS t(w)
  WHERE w <> ''
),
lm AS (
  SELECT word,
         round(ln(COUNT(*) / (SUM(COUNT(*)) OVER ())::DOUBLE), 9) AS logp
  FROM words GROUP BY word
),
perdoc AS (
  SELECT doc_id,
         round(CAST(SUM(CAST(logp AS DECIMAL(27,12))) AS DOUBLE)
               / COUNT(*), 6) AS avg_lp
  FROM words JOIN lm USING (word)
  GROUP BY doc_id
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_gopher,
       CAST(SUM(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_clf,
       CAST(SUM(CASE WHEN avg_lp >= {PPL_LOGPROB_CUT} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_pass_ppl,
       CAST(SUM(CASE WHEN g AND c AND avg_lp >= {PPL_LOGPROB_CUT}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all,
       round(SUM(CASE WHEN g AND c AND avg_lp >= {PPL_LOGPROB_CUT}
                 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 6) AS yield_frac,
       CAST(SUM(CASE WHEN g AND c AND avg_lp >= {PPL_LOGPROB_CUT}
                THEN n ELSE 0 END) AS BIGINT) AS kept_tokens
FROM flags JOIN perdoc USING (doc_id)
GROUP BY source
ORDER BY source
"""


# --------------------------------------------------------------------------
# Token-budget corpus selection: keep the highest-quality documents
# until a global token budget is reached ("fill the training budget
# with the best data"). A naive global ORDER BY quality + running sum
# funnels the corpus through one task; instead quality is bucketed to
# 0.1-logit bins and the cumulative token mass per bin (a ~100-row
# frame) picks the threshold bin B* = the lowest bin whose
# best-first cumulative mass still fits the budget; every doc in a bin
# >= B* is kept (whole-bin granularity keeps the rule deterministic
# and engine-portable — no within-bin ordering is ever needed). The
# scalar B* joins back by broadcast. Same two-phase histogram pattern
# as dwell_time_profile's quantiles. Budget is a fraction of total
# corpus tokens, so the operator is scale-free.
BUDGET_FRAC = 0.4


def budget_select_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    sw_ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / n
    mean_wl = (F.length("text") - (n - 1)) / n
    logit = (
        F.lit(CLF_W0)
        + F.lit(CLF_W_LOGN) * F.log(n + F.lit(1))
        + F.lit(CLF_W_STOP) * sw_ratio
        + F.lit(CLF_W_MWL) * mean_wl
    )
    scored = docs.select(
        "source",
        n.alias("n_tokens"),
        F.floor(logit * 10).cast("int").alias("bin"),
    )

    # hist is bin-count-sized (~100 rows), so the descending cumulative
    # sum is a broadcast triangular self-join and the grand total a
    # 1-row aggregate — no WindowExec at all (even an ordered
    # unpartitioned window over a tiny frame logs the single-partition
    # warning, which drowns out real warnings in the bench tail).
    hist = scored.groupBy("bin").agg(F.sum("n_tokens").alias("tok"))
    totals = hist.agg(F.sum("tok").alias("total_tok"))
    cum = (
        hist.alias("a")
        .join(F.broadcast(hist.alias("b")), F.col("b.bin") >= F.col("a.bin"))
        .groupBy(F.col("a.bin").alias("bin"))
        .agg(F.sum("b.tok").alias("cum"))
    )
    thresh = (
        cum.crossJoin(F.broadcast(totals))
        .filter(F.col("cum") <= F.col("total_tok") * F.lit(BUDGET_FRAC))
        .agg(F.min("bin").alias("b_star"))
    )
    return (
        scored.join(F.broadcast(thresh), F.col("bin") >= F.col("b_star"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_tokens").cast("long").alias("kept_tokens"),
            F.min("b_star").alias("threshold_bin"),
        )
    )


BUDGET_SELECT_SQL = f"""
WITH scored AS (
  SELECT source,
         len(string_split(text, ' ')) AS n_tokens,
         CAST(floor(({CLF_W0} + {CLF_W_LOGN} * ln(len(string_split(text, ' ')) + 1)
               + {CLF_W_STOP} * (len(list_filter(string_split(text, ' '),
                     t -> t IN ({", ".join(repr(s) for s in STOPWORDS)})))::DOUBLE
                   / len(string_split(text, ' ')))
               + {CLF_W_MWL} * ((length(text) - (len(string_split(text, ' ')) - 1))::DOUBLE
                   / len(string_split(text, ' ')))) * 10) AS INTEGER) AS bin
  FROM documents
),
hist AS (SELECT bin, SUM(n_tokens) AS tok FROM scored GROUP BY bin),
ranked AS (
  SELECT bin,
         SUM(tok) OVER (ORDER BY bin DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(tok) OVER () * {BUDGET_FRAC} AS budget
  FROM hist
),
thresh AS (SELECT MIN(bin) AS b_star FROM ranked WHERE cum <= budget)
SELECT source,
       COUNT(*) AS n_kept,
       CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens,
       CAST(MIN(b_star) AS INTEGER) AS threshold_bin
FROM scored, thresh
WHERE bin >= b_star
GROUP BY source
ORDER BY source
"""


# --------------------------------------------------------------------------
# Entity-resolution blocking + edit-distance match — the record-linkage
# primitive: an all-pairs Levenshtein over 10⁸ customers is O(n²) dead
# on arrival, so candidates are generated only WITHIN blocks that share
# (nation, 16-char name prefix), each block capped at _ER_BLOCK_CAP
# members (lowest key first, cap mirrored in the oracle — the same
# bounded-fan-out idiom as the Jaccard/graph caps). Within a block the
# pair join is ≤ cap²/2 and the edit distance runs only on candidates.
_ER_BLOCK_CAP = 64
_ER_PREFIX = 16
_ER_MAX_DIST = 1


def fuzzy_name_blocking_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    blocked = (
        cust.withColumn("blk", F.substring("c_name", 1, _ER_PREFIX))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("c_nationkey", "blk").orderBy("c_custkey")
            ),
        )
        .filter(F.col("rn") <= _ER_BLOCK_CAP)
        .drop("rn")
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("cust_a"),
            F.col("b.c_custkey").alias("cust_b"),
            F.levenshtein(F.col("a.c_name"), F.col("b.c_name")).alias("dist"),
        )
        .filter(F.col("dist") <= _ER_MAX_DIST)
    )


FUZZY_NAME_SQL = f"""
WITH blocked AS (
  SELECT c_custkey, c_name, c_nationkey,
         substr(c_name, 1, {_ER_PREFIX}) AS blk
  FROM (
    SELECT c_custkey, c_name, c_nationkey,
           ROW_NUMBER() OVER (
             PARTITION BY c_nationkey, substr(c_name, 1, {_ER_PREFIX})
             ORDER BY c_custkey) AS rn
    FROM customer
  ) WHERE rn <= {_ER_BLOCK_CAP}
)
SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
FROM blocked a JOIN blocked b
  ON a.c_nationkey = b.c_nationkey AND a.blk = b.blk
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= {_ER_MAX_DIST}
ORDER BY cust_a, cust_b
"""


# --------------------------------------------------------------------------
# Pairwise KL divergence between the unigram distributions of document
# sources — the drift/mixing diagnostic a corpus-blending pipeline runs
# before reweighting (is source B statistically "far" from source A?).
#
# Add-one smoothing over the GLOBAL vocabulary keeps every term finite:
#   p_s(w) = (c_s(w)+1) / (N_s + V).
# The naive evaluation densifies to |V|·|sources| rows (at a 1e9-term
# web vocabulary that is the whole job's cost), so the sum is
# DECOMPOSED into per-source aggregates plus ONE word-keyed
# co-partitioned self-join:
#   KL(a||b) = A_a/(N_a+V) − ln(N_a+V) − (B_b + C_ab)/(N_a+V) + ln(N_b+V)
#   A_a  = Σ_{w∈supp(a)} (c_a+1)·ln(c_a+1)        (per-source agg)
#   B_b  = Σ_{w∈supp(b)} ln(c_b+1)                (per-source agg)
#   C_ab = Σ_{w∈supp(a)∩supp(b)} c_a·ln(c_b+1)    (the one join)
# — every other word contributes 0 to the respective sums, so nothing
# is ever materialized per (word, pair). Determinism: each ln-term is
# rounded to 9 dp and summed in exact DECIMAL (shuffle-order
# independence, the repo-wide convention); the final expression is a
# fixed double tree over exact ingredients, rounded to 6 dp.
def source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = _docs(spark, sf_dir).select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    counts = words.groupBy("source", "word").agg(
        F.count(F.lit(1)).alias("c")
    )
    counts = counts.localCheckpoint(eager=False)

    dsum9 = lambda col: F.sum(  # noqa: E731
        F.round(col, 9).cast("decimal(38,12)")
    ).cast("double")
    per_src = counts.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        dsum9((F.col("c") + 1) * F.log(F.col("c") + 1)).alias("a_term"),
        dsum9(F.log(F.col("c") + 1)).alias("b_term"),
    )
    v_df = counts.select("word").distinct().agg(
        F.count(F.lit(1)).alias("v")
    )
    a, b = counts.alias("a"), counts.alias("b")
    c_ab = (
        a.join(b, (F.col("a.word") == F.col("b.word"))
               & (F.col("a.source") != F.col("b.source")))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(dsum9(F.col("a.c") * F.log(F.col("b.c") + 1)).alias("c_term"))
    )
    pa = per_src.select(
        F.col("source").alias("source_a"),
        F.col("n_tokens").alias("n_a"),
        "a_term",
    )
    pb = per_src.select(
        F.col("source").alias("source_b"),
        F.col("n_tokens").alias("n_b"),
        F.col("b_term"),
    )
    denom_a = (F.col("n_a") + F.col("v")).cast("double")
    kl = (
        F.col("a_term") / denom_a
        - F.log((F.col("n_a") + F.col("v")).cast("double"))
        - (F.col("b_term") + F.coalesce(F.col("c_term"), F.lit(0.0)))
        / denom_a
        + F.log((F.col("n_b") + F.col("v")).cast("double"))
    )
    # Every directed source pair must appear even when the two
    # vocabularies are fully disjoint (C_ab = 0, KL large but finite) —
    # so the pair spine is per_src × per_src (|sources|² rows of 1-row
    # aggregates, trivially broadcastable), with c_ab LEFT-joined onto
    # it rather than used as the driving table.
    pairs = pa.crossJoin(pb).filter(F.col("source_a") != F.col("source_b"))
    return (
        pairs.join(c_ab, ["source_a", "source_b"], "left")
        .crossJoin(F.broadcast(v_df))
        .select(
            "source_a",
            "source_b",
            F.round(kl, 6).alias("kl_div"),
            F.col("n_a").alias("tokens_a"),
            F.col("n_b").alias("tokens_b"),
        )
    )


SOURCE_KL_SQL = """
WITH words AS (
  SELECT source, w AS word
  FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
  WHERE w <> ''
),
counts AS (
  SELECT source, word, COUNT(*) AS c FROM words GROUP BY source, word
),
per_src AS (
  SELECT source,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(SUM(CAST(ROUND((c + 1) * ln(c + 1), 9) AS DECIMAL(38,12)))
              AS DOUBLE) AS a_term,
         CAST(SUM(CAST(ROUND(ln(c + 1), 9) AS DECIMAL(38,12)))
              AS DOUBLE) AS b_term
  FROM counts GROUP BY source
),
v AS (SELECT COUNT(DISTINCT word) AS v FROM counts),
c_ab AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(SUM(CAST(ROUND(a.c * ln(b.c + 1), 9) AS DECIMAL(38,12)))
              AS DOUBLE) AS c_term
  FROM counts a JOIN counts b
    ON a.word = b.word AND a.source <> b.source
  GROUP BY a.source, b.source
)
SELECT pa.source AS source_a, pb.source AS source_b,
       ROUND(pa.a_term / CAST(pa.n_tokens + v.v AS DOUBLE)
             - ln(CAST(pa.n_tokens + v.v AS DOUBLE))
             - (pb.b_term + COALESCE(c_ab.c_term, 0))
               / CAST(pa.n_tokens + v.v AS DOUBLE)
             + ln(CAST(pb.n_tokens + v.v AS DOUBLE)), 6) AS kl_div,
       pa.n_tokens AS tokens_a,
       pb.n_tokens AS tokens_b
FROM per_src pa
JOIN per_src pb ON pa.source <> pb.source
LEFT JOIN c_ab ON c_ab.source_a = pa.source AND c_ab.source_b = pb.source
CROSS JOIN v
ORDER BY source_a, source_b
"""


QUERIES = {
    "quality_classifier_score": quality_classifier_score,
    "doc_chunks": doc_chunks,
    "dedup_incremental_batch": dedup_incremental_batch,
    "seq_len_curriculum": seq_len_curriculum,
    "cross_source_overlap": cross_source_overlap,
    "quality_ensemble_report": quality_ensemble_report,
    "budget_select_report": budget_select_report,
    "fuzzy_name_blocking_pairs": fuzzy_name_blocking_pairs,
    "source_kl_divergence": source_kl_divergence,
}

ORACLES = {
    "quality_classifier_score": QUALITY_CLF_SQL,
    "doc_chunks": DOC_CHUNKS_SQL,
    "dedup_incremental_batch": DEDUP_INCREMENTAL_SQL,
    "seq_len_curriculum": SEQ_LEN_CURRICULUM_SQL,
    "cross_source_overlap": CROSS_SOURCE_OVERLAP_SQL,
    "quality_ensemble_report": QUALITY_ENSEMBLE_SQL,
    "budget_select_report": BUDGET_SELECT_SQL,
    "fuzzy_name_blocking_pairs": FUZZY_NAME_SQL,
    "source_kl_divergence": SOURCE_KL_SQL,
}
