"""Text-analysis operators over the `documents` table.

Beyond-reference capability (north-star: language-ID, quality scoring,
token counting, fingerprinting for a training-data pipeline). All
deterministic, all built-in expressions (split/transform/aggregate stay
in codegen; no Python UDFs), all oracle-checked except where noted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orionld_to_hive_spark.sources.warehouse import load_table

# tiny deterministic stopword list for ratio features / lang-id heuristic
STOPWORDS = ("a", "the")
LANG_ID_THRESHOLD = 0.05  # stopword ratio above which we call it English


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _toks() -> F.Column:
    return F.split(F.col("text"), " ")


def _word_grams(toks: F.Column, k: int, hashed: bool = False) -> F.Column:
    """Array of overlapping k-word grams via arrays_zip of k shifted
    slices + one concat per element. ~10× faster than the
    transform(sequence(...), element_at/slice) form (per-element random
    access inside an interpreted lambda) with bit-identical output;
    empty array below k tokens (sequence(1, 0) would DESCEND)."""
    n = F.size(toks)
    m = F.greatest(n - (k - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, 1 + j, m) for j in range(k)])

    def mk(s: F.Column) -> F.Column:
        g = F.concat_ws(" ", *[s[str(j)] for j in range(k)])
        return F.md5(g) if hashed else g

    return F.when(n >= k, F.transform(zipped, mk)).otherwise(
        F.array().cast("array<string>")
    )


def _gram_structs(toks: F.Column, k: int) -> F.Column:
    """The k-shifted-slice zip of `_word_grams` WITHOUT the
    per-element concat/md5 lambda (transform lambdas run interpreted —
    per-element cost on the hottest stream in the repo). Consumers
    that explode anyway should posexplode THIS and apply
    concat_ws/md5 as ordinary codegen projections after the Generate
    (r13; bit-identical values, same row set: every slice is empty
    when size < k, so the zip is already [] below k tokens, and NULL
    toks explode to zero rows either way)."""
    n = F.size(toks)
    m = F.greatest(n - (k - 1), F.lit(0))
    return F.arrays_zip(*[F.slice(toks, 1 + j, m) for j in range(k)])


def _gram_value(s: F.Column, k: int, hashed: bool = False) -> F.Column:
    """The gram string (or md5 digest) of one exploded `_gram_structs`
    element — identical arithmetic to `_word_grams`' lambda, run as a
    top-level (codegen) projection."""
    g = F.concat_ws(" ", *[s[str(j)] for j in range(k)])
    return F.md5(g) if hashed else g


# --------------------------------------------------------------------------
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count, distinct count, type-token ratio, plus a
    BPE-ish size estimate (chars/4 — the standard subword heuristic)."""
    toks = _toks()
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("type_token_ratio"),
        F.ceil(F.length("text") / 4).cast("long").alias("bpe_est_tokens"),
    )


TEXT_TOKEN_STATS_SQL = """
SELECT doc_id,
       CAST(len(string_split(text,' ')) AS INTEGER) AS n_tokens,
       CAST(len(list_distinct(string_split(text,' '))) AS INTEGER) AS n_distinct,
       len(list_distinct(string_split(text,' ')))::DOUBLE
         / len(string_split(text,' ')) AS type_token_ratio,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_est_tokens
FROM documents
"""


# --------------------------------------------------------------------------
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / mean-word-length / stopword-ratio quality features and a
    composite keep/drop flag (the C4-style filter shape)."""
    toks = _toks()
    n = F.size(toks)
    sw = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    mean_wl = (F.length("text") - (n - 1)) / n  # total non-space chars / tokens
    quality = (
        F.when((n >= 20) & (mean_wl >= 3.0), F.lit(1)).otherwise(F.lit(0))
    )
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.length("text").alias("n_chars_calc"),
        n.alias("n_tokens"),
        (sw / n).alias("stopword_ratio"),
        mean_wl.alias("mean_word_len"),
        quality.alias("quality_keep"),
    )


TEXT_QUALITY_SQL = f"""
SELECT doc_id,
       CAST(length(text) AS INTEGER) AS n_chars_calc,
       CAST(len(string_split(text,' ')) AS INTEGER) AS n_tokens,
       len(list_filter(string_split(text,' '),
           t -> t IN ({", ".join(repr(s) for s in STOPWORDS)})))::DOUBLE
         / len(string_split(text,' ')) AS stopword_ratio,
       (length(text) - (len(string_split(text,' ')) - 1))::DOUBLE
         / len(string_split(text,' ')) AS mean_word_len,
       CASE WHEN len(string_split(text,' ')) >= 20
             AND (length(text) - (len(string_split(text,' ')) - 1))::DOUBLE
                 / len(string_split(text,' ')) >= 3.0
            THEN 1 ELSE 0 END AS quality_keep
FROM documents
"""


# --------------------------------------------------------------------------
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (English-stopword ratio) vs the labeled
    `lang` column — the n-gram-heuristic shape of fasttext-style LID."""
    toks = _toks()
    sw_ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / F.size(toks)
    pred = F.when(sw_ratio > LANG_ID_THRESHOLD, F.lit("en")).otherwise(F.lit("unk"))
    return _docs(spark, sf_dir).select(
        "doc_id", "lang", pred.alias("pred_lang"), F.round(sw_ratio, 6).alias("sw_ratio")
    )


TEXT_LANG_ID_SQL = f"""
SELECT doc_id, lang,
       CASE WHEN len(list_filter(string_split(text,' '),
                    t -> t IN ({", ".join(repr(s) for s in STOPWORDS)})))::DOUBLE
                 / len(string_split(text,' ')) > {LANG_ID_THRESHOLD}
            THEN 'en' ELSE 'unk' END AS pred_lang,
       round(len(list_filter(string_split(text,' '),
             t -> t IN ({", ".join(repr(s) for s in STOPWORDS)})))::DOUBLE
             / len(string_split(text,' ')), 6) AS sw_ratio
FROM documents
"""


# --------------------------------------------------------------------------
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content fingerprint: sha256 over the sorted
    distinct token set. Two docs with the same vocabulary collide —
    the cheap pre-filter ahead of pairwise Jaccard."""
    toks = _toks()
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    return _docs(spark, sf_dir).select(
        "doc_id", F.sha2(canon.cast("binary"), 256).alias("fingerprint")
    )


DOC_FINGERPRINT_SQL = """
SELECT doc_id,
       sha256(array_to_string(list_sort(list_distinct(string_split(text,' '))), ' '))
         AS fingerprint
FROM documents
"""


# --------------------------------------------------------------------------
def text_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) rollup — the monitoring aggregate a pipeline
    emits per shard: docs, tokens, mean doc length."""
    toks = _toks()
    return (
        _docs(spark, sf_dir)
        .select("lang", "source", F.size(toks).alias("n_tokens"), "n_chars")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.sum("n_chars") / F.count(F.lit(1))).alias("mean_chars"),
        )
    )


TEXT_CORPUS_STATS_SQL = """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS total_tokens,
       SUM(n_chars)::DOUBLE / COUNT(*) AS mean_chars
FROM documents
GROUP BY lang, source
"""


# --------------------------------------------------------------------------
# Canonical text normalization — the step every dedup/contamination
# screen runs FIRST so trivial formatting diffs don't defeat exact-hash
# matching: lowercase → non-alphanumerics to spaces → collapse runs →
# trim, then a content hash of the canonical form. Pure codegen string
# expressions (regexp_replace is JVM-side), embarrassingly parallel,
# zero shuffle; the md5 doubles as the exact-dedup key at 100 TB.
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return _docs(spark, sf_dir).select(
        "doc_id",
        norm.alias("norm_text"),
        F.md5(norm).alias("norm_hash"),
        F.size(F.split(norm, " ")).alias("n_norm_tokens"),
    )


TEXT_NORMALIZE_SQL = """
WITH n AS (
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                               ' +', ' ', 'g')) AS norm_text
    FROM documents
)
SELECT doc_id, norm_text, md5(norm_text) AS norm_hash,
       CAST(len(string_split(norm_text, ' ')) AS INTEGER) AS n_norm_tokens
FROM n
"""


# --------------------------------------------------------------------------
# Benchmark-contamination screen. Before training, every corpus must be
# checked for verbatim overlap with held-out eval sets: here docs from
# EVAL_SOURCES play the benchmark, the rest the training corpus. The
# unit of overlap is the 5-token shingle (word n-gram), so formatting
# can't hide a copied span the way whole-doc hashes can.
#
# Scale shape: the eval side of a contamination screen is always tiny
# (benchmarks are KBs, corpora are TBs) — so its distinct shingle set
# is BROADCAST and the 100 TB training side is a single scan + explode
# + semi-join against the broadcast, no shuffle of the corpus at all;
# the only aggregation runs over eval-side rows. Shingles travel as
# md5 digests, not raw strings, to bound row width.
EVAL_SOURCES = ("src0", "src1")
SHINGLE_N = 5


def _shingles(col: str = "text") -> F.Column:
    return _word_grams(F.split(F.col(col), " "), SHINGLE_N, hashed=True)


def contamination_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select(
        "doc_id", "source", _shingles().alias("grams")
    )
    is_eval = F.col("source").isin(*EVAL_SOURCES)
    eval_g = (
        docs.filter(is_eval)
        .select("doc_id", F.explode("grams").alias("g"))
        .distinct()
    )
    train_g = (
        docs.filter(~is_eval).select(F.explode("grams").alias("g")).distinct()
    )
    totals = docs.filter(is_eval).select(
        "doc_id", F.size(F.array_distinct("grams")).alias("n_grams")
    )
    hits = (
        train_g.join(F.broadcast(eval_g), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        totals.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            F.round(F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_grams"), 6).alias(
                "contamination_rate"
            ),
        )
    )


CONTAMINATION_SQL = f"""
WITH toks AS (
    SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
),
grams AS (
    SELECT doc_id, source, md5(array_to_string(t[i:i+{SHINGLE_N - 1}], ' ')) AS g
    FROM toks, LATERAL (
        SELECT unnest(range(1, greatest(1, len(t) - {SHINGLE_N - 2}))) AS i
    )
),
eval_g AS (
    SELECT DISTINCT doc_id, g FROM grams WHERE source IN ('src0', 'src1')
),
train_g AS (
    SELECT DISTINCT g FROM grams WHERE source NOT IN ('src0', 'src1')
),
totals AS (
    SELECT doc_id, COUNT(DISTINCT g) AS n_grams
    FROM grams WHERE source IN ('src0', 'src1') GROUP BY doc_id
),
hits AS (
    SELECT e.doc_id, COUNT(*) AS n_hit
    FROM eval_g e JOIN train_g t ON e.g = t.g
    GROUP BY e.doc_id
)
SELECT totals.doc_id,
       CAST(n_grams AS INTEGER) AS n_grams,
       COALESCE(n_hit, 0) AS n_hit,
       round(COALESCE(n_hit, 0) / n_grams, 6) AS contamination_rate
FROM totals LEFT JOIN hits ON totals.doc_id = hits.doc_id
ORDER BY totals.doc_id
"""


# --------------------------------------------------------------------------
# TF-IDF top terms per document — the classic relevance weighting as
# pure relational algebra: explode → per-(doc,term) counts (the one
# fact-sized shuffle, map-side combined) → document frequencies over
# the ALREADY-AGGREGATED pair relation (vocabulary-sized — joined
# back on `word` with NO broadcast hint: a 100 TB web corpus has a
# 1e8-1e9-token noisy vocabulary, multi-GB as a broadcast; the
# word-keyed shuffle join is the scale-correct shape and AQE still
# broadcasts it while small) → window top-3 per doc. The corpus size N rides in as a
# broadcast one-row aggregate. Scores are round()ed to 6 dp before
# comparison/ranking: ln() agrees between engines well past 1e-6, and
# the rounding collapses any last-ulp drift before it can flip an
# ordering; ties then break on the term itself.
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    words = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.round(
        F.col("tf")
        * F.log((F.col("n_docs") + 1) / (F.col("df") + 1)),
        6,
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("word").asc()
    )
    return (
        tf.join(df_, "word")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", score)
        .withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= 3)
        .select("doc_id", "term_rank", "word", "score")
    )


TFIDF_SQL = """
WITH words AS (
  SELECT doc_id, w AS word
  FROM documents, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS t(w)
  WHERE w <> ''
),
tf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM words GROUP BY doc_id, word
),
df AS (
  SELECT word, COUNT(*) AS df FROM tf GROUP BY word
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.word,
         round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS score
  FROM tf JOIN df USING (word) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, word, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, word ASC) AS term_rank
  FROM scored
)
SELECT doc_id, CAST(term_rank AS INTEGER) AS term_rank, word, score
FROM ranked WHERE term_rank <= 3
ORDER BY doc_id, term_rank
"""


# --------------------------------------------------------------------------
# BM25 ranked retrieval for a fixed term query. Everything the scorer
# needs is relational: document lengths (one pass), corpus-average
# length and per-term document frequencies (one-row / query-term
# aggregates; the DF table joins on `word` unhinted — vocabulary-sized
# frames are never force-broadcast, see tfidf_top_terms), term frequencies restricted to the query terms (the
# explode is filtered BEFORE the shuffle, so only query-term hits move).
# Per-term contributions are rounded to 6 dp then summed in exact
# decimal — a sum of doubles would be micro-batch-order dependent.
BM25_TERMS = ("spark", "join", "window")
BM25_K1, BM25_B = 1.5, 0.75


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orionld_to_hive_spark.functions.numeric import DECIMAL_T

    docs = _docs(spark, sf_dir)
    words = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    doclen = words.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    avg_dl = doclen.agg(
        (F.sum(F.col("dl").cast(DECIMAL_T)).cast("double") / F.count("dl")).alias(
            "avg_dl"
        )
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    hits = words.filter(F.col("word").isin(*BM25_TERMS))
    tf = hits.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + BM25_K1 * (
        1 - BM25_B + BM25_B * F.col("dl") / F.col("avg_dl")
    )
    contrib = F.round(idf * F.col("tf") * (BM25_K1 + 1) / denom, 6)
    return (
        tf.join(df_, "word")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(avg_dl))
        .withColumn("contrib", contrib)
        .groupBy("doc_id")
        .agg(F.sum(F.col("contrib").cast(DECIMAL_T)).cast("double").alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


BM25_SQL = f"""
WITH words AS (
  SELECT doc_id, w AS word
  FROM documents, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS t(w)
  WHERE w <> ''
),
doclen AS (SELECT doc_id, COUNT(*) AS dl FROM words GROUP BY doc_id),
avgdl AS (
  SELECT CAST(SUM(CAST(dl AS DECIMAL(27,6))) AS DOUBLE) / COUNT(dl) AS avg_dl
  FROM doclen
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
tf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM words
  WHERE word IN {BM25_TERMS!r}
  GROUP BY doc_id, word
),
df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
contribs AS (
  SELECT tf.doc_id,
         round(ln(1 + (n.n_docs - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * ({BM25_K1} + 1)
               / (tf.tf + {BM25_K1} * (1 - {BM25_B}
                  + {BM25_B} * doclen.dl / avgdl.avg_dl)), 6) AS contrib
  FROM tf JOIN df USING (word) JOIN doclen USING (doc_id)
  CROSS JOIN n CROSS JOIN avgdl
)
SELECT doc_id,
       CAST(SUM(CAST(contrib AS DECIMAL(27,6))) AS DOUBLE) AS score
FROM contribs
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# BPE-ish regex pre-tokenization (north-star "token counting:
# whitespace + a BPE-ish regex"): the GPT-2-family pre-tokenizer
# splits letter runs, digit runs, and punctuation runs before merges;
# this operator counts those classes with one regexp_extract_all pass
# — all JVM-side, and the same RE syntax runs verbatim in DuckDB.
_PRETOK_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]+"


def text_regex_pretokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.regexp_extract_all("text", F.lit(_PRETOK_RE), 0)
    is_word = lambda t: t.rlike("^[a-zA-Z]")  # noqa: E731
    is_num = lambda t: t.rlike("^[0-9]")  # noqa: E731
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(toks).alias("n_pretokens"),
        F.size(F.filter(toks, is_word)).alias("n_word_runs"),
        F.size(F.filter(toks, is_num)).alias("n_digit_runs"),
        (
            F.size(toks)
            - F.size(F.filter(toks, is_word))
            - F.size(F.filter(toks, is_num))
        ).alias("n_punct_runs"),
    )


TEXT_PRETOK_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '{_PRETOK_RE}') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS INTEGER) AS n_pretokens,
       CAST(len(list_filter(toks, x -> regexp_matches(x, '^[a-zA-Z]')))
            AS INTEGER) AS n_word_runs,
       CAST(len(list_filter(toks, x -> regexp_matches(x, '^[0-9]')))
            AS INTEGER) AS n_digit_runs,
       CAST(len(toks)
            - len(list_filter(toks, x -> regexp_matches(x, '^[a-zA-Z]')))
            - len(list_filter(toks, x -> regexp_matches(x, '^[0-9]')))
            AS INTEGER) AS n_punct_runs
FROM t
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Corpus drift: token-distribution divergence between two slices (here
# sources src0-4 vs the rest — in production, last week vs this week).
# One explode → ONE conditional (word × side) count aggregate → global
# totals as a 1-row aggregate broadcast back over the vocabulary (a
# global window here would funnel the entire 1e8-row vocabulary frame
# through one WindowExec task at 100 TB) → KL(P||Q) with add-one
# smoothing and total-variation distance, each term round()ed to 9 dp
# before the exact-decimal sum (a double sum over an unordered
# vocabulary would be partition-order dependent). Scale: the only
# fact-sized shuffle is the word count; everything after runs on
# |vocab| rows, fully partitioned.
_DRIFT_A = ("src0", "src1", "src2", "src3", "src4")


def corpus_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    words = docs.select(
        F.col("source"),
        F.explode(F.split(F.trim("text"), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    in_a = F.col("source").isin(*_DRIFT_A)
    counts = words.groupBy("word").agg(
        F.sum(in_a.cast("long")).alias("a"),
        F.sum((~in_a).cast("long")).alias("b"),
    )
    totals = counts.agg(
        F.count(F.lit(1)).alias("n_vocab"),
        F.sum("a").alias("tot_a"),
        F.sum("b").alias("tot_b"),
    )
    counts = counts.crossJoin(F.broadcast(totals))
    v = F.col("n_vocab")  # vocabulary size
    ta = (F.col("tot_a") + v).cast("double")  # add-one smoothed totals
    tb = (F.col("tot_b") + v).cast("double")
    p = (F.col("a") + 1) / ta
    q = (F.col("b") + 1) / tb
    # scale 12 > the 9-dp rounding, so the decimal cast is exact —
    # DECIMAL_T's scale 6 would re-round the tiny per-term values
    dec = "decimal(27,12)"
    kl_term = F.round(p * F.log(p / q), 9).cast(dec)
    tv_term = F.round(F.abs(p - q), 9).cast(dec)
    return counts.select("word", v.alias("n_vocab"), kl_term.alias("klt"),
                         tv_term.alias("tvt")).groupBy("n_vocab").agg(
        F.round(F.sum("klt").cast("double"), 6).alias("kl_a_to_b"),
        F.round(F.sum("tvt").cast("double") / 2.0, 6).alias("total_variation"),
    )


CORPUS_DRIFT_SQL = f"""
WITH words AS (
  SELECT source, w AS word
  FROM documents, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS t(w)
  WHERE w <> ''
),
counts AS (
  SELECT word,
         SUM(CASE WHEN source IN {_DRIFT_A!r} THEN 1 ELSE 0 END) AS a,
         SUM(CASE WHEN source IN {_DRIFT_A!r} THEN 0 ELSE 1 END) AS b
  FROM words GROUP BY word
),
terms AS (
  SELECT COUNT(*) OVER () AS n_vocab,
         (a + 1) / (SUM(a) OVER () + COUNT(*) OVER ()) AS p,
         (b + 1) / (SUM(b) OVER () + COUNT(*) OVER ()) AS q
  FROM counts
)
SELECT n_vocab,
       round(CAST(SUM(CAST(round(p * ln(p / q), 9) AS DECIMAL(27,12))) AS DOUBLE), 6)
         AS kl_a_to_b,
       round(CAST(SUM(CAST(round(abs(p - q), 9) AS DECIMAL(27,12))) AS DOUBLE) / 2.0, 6)
         AS total_variation
FROM terms
GROUP BY n_vocab
"""


# --------------------------------------------------------------------------
# Unigram log-probability scoring — the "perplexity filter" stage of a
# training pipeline (KenLM-lite: the LM is the corpus's own unigram
# distribution). Pipeline: explode → word counts (fact-sized shuffle)
# → per-word log-prob (corpus total via 1-row aggregate broadcast —
# NOT a global window, which would push the vocabulary frame through
# one task) → join the vocabulary-sized table back onto the exploded
# stream on `word` (unhinted — a real corpus vocabulary is 1e8+ terms,
# too big to force-broadcast; AQE broadcasts it while small) → per-doc mean log-prob and perplexity. Per-token
# log-probs are rounded to 9 dp then decimal-summed per doc (double
# summation order over a doc's tokens is not deterministic); the
# final mean/ppl round to 6.
def unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    words = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    # persisted: feeds both the corpus-total broadcast and the LM
    # projection (one vocab aggregation instead of two — r13, same
    # pattern as quality_ensemble_report)
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("c")).persist()
    total_df = counts.agg(F.sum("c").cast("double").alias("corpus_total"))
    lm = counts.crossJoin(F.broadcast(total_df)).select(
        "word",
        F.round(F.log(F.col("c") / F.col("corpus_total")), 9).alias("logp"),
    )
    dec = "decimal(27,12)"
    return (
        words.join(lm, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum(F.col("logp").cast(dec)).cast("double") / F.count(F.lit(1))).alias("avg_lp"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round("avg_lp", 6).alias("avg_logprob"),
            F.round(F.exp(-F.col("avg_lp")), 6).alias("perplexity"),
        )
    )


UNIGRAM_LOGPROB_SQL = """
WITH words AS (
  SELECT doc_id, w AS word
  FROM documents, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS t(w)
  WHERE w <> ''
),
lm AS (
  SELECT word,
         round(ln(COUNT(*) / (SUM(COUNT(*)) OVER ())::DOUBLE), 9) AS logp
  FROM words GROUP BY word
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         CAST(SUM(CAST(logp AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS avg_lp
  FROM words JOIN lm USING (word)
  GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       round(avg_lp, 6) AS avg_logprob,
       round(exp(-avg_lp), 6) AS perplexity
FROM per_doc
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Shared bigram derivation (r13). Bigrams used to come from a lead()
# window over (doc, position): posexplode → Exchange(doc_id) → Sort →
# lead, and every consumer of the bigram stream re-executed that
# shuffle+sort. Adjacent pairs are a purely LOCAL property of the
# token array, so zip the array with itself shifted by one (slice +
# arrays_zip, both codegen built-ins): zero exchanges, zero sorts,
# document boundaries still never produce cross-doc pairs. The
# empty-token filter is array_remove BEFORE pairing — identical to the
# old w != '' filter applied before the window (split-on-\s+ of
# trimmed text only yields '' for all-whitespace docs, where both
# forms yield no rows).
def _token_arr() -> F.Column:
    return F.array_remove(F.split(F.trim("text"), r"\s+"), "")


def _flat_words(docs: DataFrame) -> DataFrame:
    """The flat token stream (doc-order irrelevant): (w) per occurrence."""
    return docs.select(F.explode(_token_arr()).alias("w"))


def _adjacent_bigrams(docs: DataFrame) -> DataFrame:
    """Every adjacent token pair as (doc_id, w, w2) — no window, no
    shuffle: pairs are zipped from the token array directly."""
    a = _token_arr()
    n1 = F.greatest(F.size(a) - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(a, 1, n1).alias("w"), F.slice(a, 2, n1).alias("w2")
    )
    return docs.select(
        "doc_id", F.explode(pairs).alias("p")
    ).select("doc_id", F.col("p.w").alias("w"), F.col("p.w2").alias("w2"))


# Collocation mining: top bigrams by pointwise mutual information.
# PMI combines the bigram count with the two unigram counts
# (vocabulary-sized, so joined on the word key unhinted — never
# force-broadcast) and is round()ed to 6 dp before the top-k sort;
# count floor ≥ 10 keeps the estimates stable, ties break
# lexicographically.
def bigram_pmi_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    words = _flat_words(docs)
    bigrams = _adjacent_bigrams(docs)
    # uni/cb persisted; the scalar totals derive from them (Σcu == all
    # word occurrences, Σc_ab == all bigram occurrences — exact bigint
    # identities), so neither total re-scans the corpus and uni's two
    # join consumers (u1/u2) share one aggregation (r13)
    uni = words.groupBy("w").agg(F.count(F.lit(1)).alias("cu")).persist()
    cb = bigrams.groupBy("w", "w2").agg(F.count(F.lit(1)).alias("c_ab")).persist()
    n_uni = uni.agg(F.sum("cu").alias("n_uni"))
    n_bi = cb.agg(F.sum("c_ab").alias("n_bi"))
    pmi = F.round(
        F.log(
            (F.col("c_ab") / F.col("n_bi"))
            / ((F.col("cu") / F.col("n_uni")) * (F.col("cu2") / F.col("n_uni")))
        ),
        6,
    )
    return (
        cb.join(uni, "w")
        .join(
            uni.select(F.col("w").alias("w2"), F.col("cu").alias("cu2")),
            "w2",
        )
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .filter(F.col("c_ab") >= 10)
        .select("w", "w2", "c_ab", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w", "w2")
        .limit(20)
    )


BIGRAM_PMI_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l
  FROM documents
),
words AS (
  SELECT doc_id, i AS pos, l[i + 1] AS w
  FROM toks, UNNEST(range(len(l))) AS t(i)
  WHERE l[i + 1] <> ''
),
bigrams AS (
  SELECT w, LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM words
),
cb AS (
  SELECT w, w2, COUNT(*) AS c_ab FROM bigrams
  WHERE w2 IS NOT NULL GROUP BY w, w2
),
uni AS (SELECT w, COUNT(*) AS cu FROM words GROUP BY w),
tot AS (
  SELECT (SELECT COUNT(*) FROM words) AS n_uni,
         (SELECT COUNT(*) FROM bigrams WHERE w2 IS NOT NULL) AS n_bi
)
SELECT cb.w, cb.w2, c_ab,
       round(ln((c_ab / (n_bi * 1.0))
                / ((u1.cu / (n_uni * 1.0)) * (u2.cu / (n_uni * 1.0)))), 6) AS pmi
FROM cb
JOIN uni u1 ON cb.w = u1.w
JOIN uni u2 ON cb.w2 = u2.w
CROSS JOIN tot
WHERE c_ab >= 10
ORDER BY pmi DESC, cb.w, cb.w2
LIMIT 20
"""


# --------------------------------------------------------------------------
# Gopher-style within-document repetition metrics: fraction of 2-gram
# occurrences that are repeats, and the share of the single most
# frequent 2-gram. High values flag boilerplate/spam docs a training
# pipeline drops. Single explode + two-level aggregate; no joins.
def doc_repetition_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _toks()
    n = F.size(toks)
    # Adjacent-pair construction via arrays_zip of two shifted slices —
    # regular codegen expressions. Both a shuffle-free run-length fold
    # (higher-order aggregate with a struct accumulator) and a
    # transform(sequence(...), element_at) gram builder were tried and
    # lost by ~100× / ~3×: higher-order lambdas evaluate interpreted,
    # outside codegen. Then explode + two-level aggregate; at scale the
    # (doc_id, gram) shuffle is bounded by distinct grams per doc
    # (map-side combine collapses within-doc repeats — each doc's grams
    # are partition-local), the standard plan for corpus repetition
    # stats.
    m = F.greatest(n - 1, F.lit(0))
    pairs = F.arrays_zip(F.slice(toks, 1, m), F.slice(toks, 2, m))
    counts = (
        _docs(spark, sf_dir)
        .filter(F.size(toks) >= 2)
        .select("doc_id", F.explode(pairs).alias("z"))
        .select(
            "doc_id",
            F.concat_ws(" ", F.col("z.0"), F.col("z.1")).alias("gram"),
        )
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_2grams = F.sum("c")
    n_distinct = F.count(F.lit(1))
    return (
        counts.groupBy("doc_id")
        .agg(
            n_2grams.alias("n_2grams"),
            F.round(
                (n_2grams - n_distinct).cast("double") / n_2grams, 6
            ).alias("dup_2gram_frac"),
            F.round(F.max("c").cast("double") / n_2grams, 6).alias(
                "top_2gram_frac"
            ),
        )
    )


DOC_REPETITION_SQL = """
WITH g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(string_split(text, ' '))),
                i -> string_split(text, ' ')[i] || ' '
                     || string_split(text, ' ')[i+1])) AS gram
  FROM documents
),
c AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_2grams,
       round((SUM(c) - COUNT(*))::DOUBLE / SUM(c), 6) AS dup_2gram_frac,
       round(MAX(c)::DOUBLE / SUM(c), 6) AS top_2gram_frac
FROM c
GROUP BY doc_id
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Cross-document duplicated-span detection (exact-substring dedup at
# fixed granularity): tile each doc into consecutive 8-token blocks,
# report blocks appearing in >= 2 distinct docs. The shuffle carries
# block hashes + ids, not documents; the block relation is linear in
# corpus size (n_tokens/8 rows per doc).
SPAN_TOKENS = 8


def span_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _toks()
    n_blocks = F.floor(F.size(toks) / SPAN_TOKENS).cast("int")
    blocks = F.when(
        n_blocks >= 1,
        F.transform(
            F.sequence(F.lit(0), n_blocks - 1),
            lambda i: F.array_join(
                F.slice(toks, i * SPAN_TOKENS + 1, SPAN_TOKENS), " "
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = _docs(spark, sf_dir).select(
        "doc_id", F.explode(blocks).alias("span")
    )
    return (
        exploded.groupBy("span")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
        .select("span", "n_docs", "n_occurrences", "first_doc_id")
    )


SPAN_DEDUP_SQL = f"""
WITH b AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, CAST(floor(len(string_split(text,' ')) / {SPAN_TOKENS})
                    AS BIGINT)),
           i -> array_to_string(
                  list_slice(string_split(text,' '),
                             i*{SPAN_TOKENS} + 1, (i+1)*{SPAN_TOKENS}),
                  ' '))) AS span
  FROM documents
)
SELECT span,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       COUNT(*) AS n_occurrences,
       MIN(doc_id) AS first_doc_id
FROM b
GROUP BY span
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY span
"""


# --------------------------------------------------------------------------
# The APPLICATION half of span_dedup_report — C4-style exact-span
# dedup that REWRITES the corpus: every 8-token block keeps only its
# globally FIRST occurrence (ordered by doc_id, then block position;
# later copies are cut) and each document is reassembled from its
# surviving blocks plus the sub-block tail. This is the standard
# "remove duplicated lines/paragraphs corpus-wide" stage of
# training-data pipelines, at the block granularity the single-line
# testdata supports.
#
# Scale shape: two keyed shuffles, both linear in corpus token count —
# one on the block text (the global first-occurrence window; identical
# cost to span_dedup_report's groupBy) and one on doc_id to
# reassemble. No broadcast, no collect; determinism comes from the
# total (doc_id, idx) order within each block partition.
def span_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _toks()
    n_blocks = F.floor(F.size(toks) / SPAN_TOKENS).cast("int")
    blocks = F.when(
        n_blocks >= 1,
        F.transform(
            F.sequence(F.lit(0), n_blocks - 1),
            lambda i: F.array_join(
                F.slice(toks, i * SPAN_TOKENS + 1, SPAN_TOKENS), " "
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        "text",
        toks.alias("toks"),
        n_blocks.alias("nb"),
        blocks.alias("blocks"),
    )
    exploded = docs.select(
        "doc_id", F.posexplode("blocks").alias("idx", "span")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("span").orderBy("doc_id", "idx")
    kept = exploded.withColumn("rn", F.row_number().over(w))
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_removed"),
        # collect_list drops the NULLs the rn>1 branch produces;
        # array_sort on (idx, span) structs restores block order
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("rn") == 1, F.struct("idx", "span")
                        )
                    )
                ),
                lambda x: x["span"],
            ),
            " ",
        ).alias("body"),
    )
    tail = F.array_join(
        F.slice(
            F.col("toks"),
            F.col("nb") * SPAN_TOKENS + 1,
            F.size("toks") - F.col("nb") * SPAN_TOKENS,
        ),
        " ",
    )
    return (
        docs.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_blocks", F.lit(0)).alias("n_blocks"),
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
            F.coalesce(
                F.concat_ws(
                    " ",
                    F.when(F.col("body") != "", F.col("body")),
                    F.when(tail != "", tail),
                ),
                F.col("text"),
            ).alias("cleaned_text"),
        )
    )


SPAN_DEDUP_REWRITE_SQL = f"""
WITH d AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks,
         CAST(floor(len(string_split(text, ' ')) / {SPAN_TOKENS})
              AS BIGINT) AS nb
  FROM documents
),
b AS (
  SELECT doc_id,
         unnest(list_transform(range(0, nb),
           i -> {{'idx': i,
                  'span': array_to_string(
                            list_slice(toks, i*{SPAN_TOKENS} + 1,
                                       (i+1)*{SPAN_TOKENS}), ' ')}})) AS u
  FROM d
),
kept AS (
  SELECT doc_id, (u).idx AS idx, (u).span AS span,
         row_number() OVER (PARTITION BY (u).span
                            ORDER BY doc_id, (u).idx) AS rn
  FROM b
),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_blocks,
         CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_removed,
         string_agg(CASE WHEN rn = 1 THEN span END, ' ' ORDER BY idx)
           AS body
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_blocks, 0) AS n_blocks,
       COALESCE(a.n_removed, 0) AS n_removed,
       COALESCE(
         concat_ws(' ',
           NULLIF(a.body, ''),
           NULLIF(array_to_string(
                    list_slice(d.toks, d.nb*{SPAN_TOKENS} + 1,
                               len(d.toks)), ' '), '')),
         d.text) AS cleaned_text
FROM d LEFT JOIN agg a USING (doc_id)
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Per-doc unigram entropy H = -Σ (c/n)·ln(c/n): a compression-adjacent
# quality signal (low entropy ⇒ repetitive/template docs). Cross-engine
# exactness: c/n is one exact-rounded double division, ln agrees
# bit-for-bit, and each term is rounded to 9 dp then summed as
# DECIMAL(27,12) so summation ORDER cannot flap the total (the KL /
# log-prob convention — floats only re-enter at the final cast).
def doc_entropy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    toks = _toks()
    counts = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(toks).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # doc total via an unordered window over doc_id instead of a
    # groupBy+self-join: the window's (doc_id) partitioning is then
    # reused by the final aggregate — 2 exchanges total, not 6.
    n = F.sum("c").over(W.partitionBy("doc_id"))
    p = F.col("c").cast("double") / n.cast("double")
    term = F.round(p * F.log(p), 9).cast("decimal(27,12)")
    return (
        counts.withColumn("term", term)
        .groupBy("doc_id")
        .agg(
            F.round(-F.sum("term").cast("double"), 9).alias("entropy"),
            F.count(F.lit(1)).alias("n_distinct_tokens"),
        )
    )


DOC_ENTROPY_SQL = """
WITH c AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents
),
counts AS (SELECT doc_id, tok, COUNT(*) AS c FROM c GROUP BY doc_id, tok),
n AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY doc_id)
SELECT counts.doc_id,
       round(-CAST(SUM(CAST(round((c::DOUBLE / n) * ln(c::DOUBLE / n), 9)
                            AS DECIMAL(27,12))) AS DOUBLE), 9) AS entropy,
       COUNT(*) AS n_distinct_tokens
FROM counts JOIN n ON counts.doc_id = n.doc_id
GROUP BY counts.doc_id
ORDER BY counts.doc_id
"""


# --------------------------------------------------------------------------
# Corpus-wide top-K 3-grams (memorization / boilerplate audit): one
# explode + map-side-combined count, then a K-row total order — the
# orderBy collapses to a single reduction because LIMIT pushes TopK
# into the partial aggregation (TakeOrderedAndProject).
NGRAM_TOPK = 20


def ngram_topk_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .select(F.explode(_gram_structs(_toks(), 3)).alias("s"))
        .select(_gram_value(F.col("s"), 3).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("gram").asc())
        .limit(NGRAM_TOPK)
    )


NGRAM_TOPK_SQL = f"""
SELECT gram, COUNT(*) AS n_occurrences
FROM (
  SELECT unnest(list_transform(range(1, len(string_split(text,' ')) - 1),
         i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
              || ' ' || string_split(text,' ')[i+2])) AS gram
  FROM documents
)
GROUP BY gram
ORDER BY n_occurrences DESC, gram ASC
LIMIT {NGRAM_TOPK}
"""


# --------------------------------------------------------------------------
VOCAB_SIZE = 100


def vocab_coverage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage: build the top-V corpus vocabulary
    (count desc, word asc), then report per-doc in-vocab token count and
    OOV rate — the audit run before committing to a tokenizer vocab.

    Scale plan: the vocab is a corpus-wide top-V (two map-side-combined
    aggregations over exploded tokens), then a BROADCAST semi-join back
    against the exploded corpus — the corpus never shuffles by word for
    the coverage pass, only by doc_id for the final per-doc rollup."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(_toks()).alias("word"))
    vocab = (
        toks.groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("word").asc())
        .limit(VOCAB_SIZE)
        .select("word")
    )
    tagged = toks.join(F.broadcast(vocab), "word", "left_semi")
    in_vocab = tagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_in_vocab")
    )
    totals = docs.select("doc_id", F.size(_toks()).cast("long").alias("n_tokens"))
    return (
        totals.join(in_vocab, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_in_vocab", F.lit(0)).alias("n_in_vocab"),
            F.round(
                (F.col("n_tokens") - F.coalesce("n_in_vocab", F.lit(0)))
                .cast("double")
                / F.col("n_tokens"),
                6,
            ).alias("oov_rate"),
        )
    )


VOCAB_COVERAGE_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
vocab AS (
  SELECT word FROM toks GROUP BY word
  ORDER BY COUNT(*) DESC, word ASC LIMIT {VOCAB_SIZE}
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_in_vocab
  FROM toks WHERE word IN (SELECT word FROM vocab)
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       COALESCE(p.n_in_vocab, 0) AS n_in_vocab,
       round((len(string_split(d.text, ' ')) - COALESCE(p.n_in_vocab, 0))::DOUBLE
             / len(string_split(d.text, ' ')), 6) AS oov_rate
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MWL = 3.0
GOPHER_MAX_MWL = 10.0
GOPHER_MIN_ALPHA_FRAC = 0.80
GOPHER_MAX_SYMBOL_RATIO = 0.10


def gopher_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule filter (Rae et al. 2021 §A1.1 shape): word-count
    bounds, mean-word-length bounds, fraction of words containing an
    alphabetic character, and symbol-to-word ratio (#/ellipsis), with a
    composite keep flag. All per-row column expressions — one scan, no
    shuffle, whole-stage codegen; the canonical first-pass corpus filter
    at 100 TB."""
    toks = _toks()
    n = F.size(toks)
    mean_wl = (F.length("text") - (n - 1)).cast("double") / n
    alpha_frac = (
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double") / n
    )
    n_hash = F.length("text") - F.length(F.replace(F.col("text"), F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit("..."), F.lit("")))
    ) / 3
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / n
    keep = (
        (n >= GOPHER_MIN_WORDS)
        & (n <= GOPHER_MAX_WORDS)
        & (mean_wl >= GOPHER_MIN_MWL)
        & (mean_wl <= GOPHER_MAX_MWL)
        & (alpha_frac >= GOPHER_MIN_ALPHA_FRAC)
        & (symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO)
    )
    return _docs(spark, sf_dir).select(
        "doc_id",
        n.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        keep.alias("gopher_keep"),
    )


GOPHER_QUALITY_SQL = f"""
WITH feats AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n,
         (length(text) - (len(string_split(text, ' ')) - 1))::DOUBLE
           / len(string_split(text, ' ')) AS mean_wl,
         len(list_filter(string_split(text, ' '),
             t -> regexp_matches(t, '[a-z]')))::DOUBLE
           / len(string_split(text, ' ')) AS alpha_frac,
         ((length(text) - length(replace(text, '#', '')))
          + (length(text) - length(replace(text, '...', ''))) / 3)::DOUBLE
           / len(string_split(text, ' ')) AS symbol_ratio
  FROM documents
)
SELECT doc_id,
       CAST(n AS INTEGER) AS n_words,
       round(mean_wl, 6) AS mean_word_len,
       round(alpha_frac, 6) AS alpha_word_frac,
       round(symbol_ratio, 6) AS symbol_ratio,
       (n >= {GOPHER_MIN_WORDS} AND n <= {GOPHER_MAX_WORDS}
        AND mean_wl >= {GOPHER_MIN_MWL} AND mean_wl <= {GOPHER_MAX_MWL}
        AND alpha_frac >= {GOPHER_MIN_ALPHA_FRAC}
        AND symbol_ratio <= {GOPHER_MAX_SYMBOL_RATIO}) AS gopher_keep
FROM feats
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Tokenizer fertility — the tokenizer-efficiency audit every LLM corpus
# runs before committing to a vocab: per language, how many BPE-ish
# pretokens does a whitespace word explode into (fertility), and how
# many chars/bytes ride per pretoken. High fertility on a language
# means the tokenizer underserves it (UTF-8 multi-byte scripts blow up
# first — octet_length vs length catches that even though this
# testdata is ASCII). Pure codegen column expressions + one tiny
# aggregate; ratios are single double divisions of exact BIGINTs.
def tokenizer_fertility_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = F.regexp_extract_all("text", F.lit(_PRETOK_RE), 0)
    ws = F.split(F.trim("text"), r"\s+")
    per_doc = docs.select(
        "lang",
        F.size(toks).cast("long").alias("n_pretok"),
        F.size(F.filter(ws, lambda t: t != "")).cast("long").alias("n_words"),
        F.length("text").cast("long").alias("n_chars"),
        F.octet_length("text").cast("long").alias("n_bytes"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_pretok").alias("total_pretokens"),
            F.sum("n_words").alias("total_words"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_bytes").alias("total_bytes"),
        )
        .select(
            "lang",
            "n_docs",
            "total_pretokens",
            "total_words",
            # GREATEST(…, 1) guards an all-whitespace/empty language
            # slice: long/long ÷ 0 is a runtime error under the
            # driver's ANSI session (same guard in the oracle)
            F.round(
                F.col("total_pretokens") / F.greatest("total_words", F.lit(1)), 6
            ).alias("fertility"),
            F.round(
                F.col("total_chars") / F.greatest("total_pretokens", F.lit(1)), 6
            ).alias("chars_per_pretoken"),
            F.round(
                F.col("total_bytes") / F.greatest("total_pretokens", F.lit(1)), 6
            ).alias("bytes_per_pretoken"),
        )
    )


TOKENIZER_FERTILITY_SQL = f"""
WITH per_doc AS (
  SELECT lang,
         CAST(len(regexp_extract_all(text, '{_PRETOK_RE}')) AS BIGINT) AS n_pretok,
         CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                              x -> x <> '')) AS BIGINT) AS n_words,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_pretok) AS BIGINT) AS total_pretokens,
       CAST(SUM(n_words) AS BIGINT) AS total_words,
       round(CAST(SUM(n_pretok) AS DOUBLE) / GREATEST(SUM(n_words), 1), 6)
         AS fertility,
       round(CAST(SUM(n_chars) AS DOUBLE) / GREATEST(SUM(n_pretok), 1), 6)
         AS chars_per_pretoken,
       round(CAST(SUM(n_bytes) AS DOUBLE) / GREATEST(SUM(n_pretok), 1), 6)
         AS bytes_per_pretoken
FROM per_doc
GROUP BY lang
ORDER BY lang
"""


# --------------------------------------------------------------------------
# Bigram-LM scoring with add-one smoothing — one rung up the KenLM
# ladder from unigram_logprob_score: p(w2|w1) = (c(w1 w2)+1)/(c(w1)+V).
# The bigram table is NOT broadcast (it outgrows the vocabulary);
# instead per-doc bigram counts shuffle-join the global bigram counts
# on the same (w, w2) key — co-partitioned, one exchange. The unigram
# table is vocabulary-sized too, so it joins on `w` unhinted; only the
# scalar V (1-row agg) rides as a broadcast. Docs shorter than 2 tokens carry no
# bigrams and drop out (both engines). Per-doc term products are
# rounded then decimal-summed (shuffle-order independence, as
# unigram_logprob_score).
#
# Multi-scan note (perf history, don't re-litigate): each of db/cb/cu/
# vocab re-explodes the corpus. Three alternatives were measured at
# sf0.1 and ALL lose to the re-scan: (1) eager localCheckpoint of the
# exploded token stream — reverted in r4 (commits 785034b/29872e3, CI
# blowup + 1.5× quality_ensemble under full-bench memory pressure);
# (2) r5: cb derived from db (ReusedExchange fires on db's shuffle) —
# 1.99 s vs 1.85 s, the extra (w,w2)-keyed exchange on top of db's
# costs more than the explode it saves; (3) r5: cu/vocab derived from
# a per-doc word-count frame — 1.95 s, the (doc_id,w)-keyed exchange
# is doc×word-sized, strictly bigger than cu's direct vocab-sized one.
# At 100 TB the structure to revisit is persisting the AGGREGATED
# cu/cb tables across *consumers of the LM* (they are vocab-sized and
# reusable), not within this single scoring pass, where the map-side
# partial aggregation on the exploded stream is already optimal.
def bigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    words = _flat_words(docs)
    bigrams = _adjacent_bigrams(docs)
    db = bigrams.groupBy("doc_id", "w", "w2").agg(F.count(F.lit(1)).alias("c"))
    cb = bigrams.groupBy("w", "w2").agg(F.count(F.lit(1)).alias("c_ab"))
    # cu persisted, V derived from it: |cu| == countDistinct(w) by
    # construction, so the old separate vocab aggregation re-exploded
    # the whole corpus for a number the count table already holds
    # (r13; local-neutral, one fewer full token-stream pass at scale)
    cu = words.groupBy("w").agg(F.count(F.lit(1)).alias("c_w")).persist()
    vocab = cu.agg(F.count(F.lit(1)).cast("long").alias("v"))
    logp = F.round(
        F.log((F.col("c_ab") + 1) / (F.col("c_w") + F.col("v"))), 9
    )
    dec = "decimal(27,12)"
    return (
        db.join(cb, ["w", "w2"])
        .join(cu, "w")
        .crossJoin(F.broadcast(vocab))
        .withColumn("term", F.round(F.col("c") * logp, 9))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            (
                F.sum(F.col("term").cast(dec)).cast("double") / F.sum("c")
            ).alias("avg_lp"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round("avg_lp", 6).alias("avg_logprob"),
            F.round(F.exp(-F.col("avg_lp")), 6).alias("perplexity"),
        )
    )


BIGRAM_LOGPROB_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l
  FROM documents
),
words AS (
  SELECT doc_id, i AS pos, l[i + 1] AS w
  FROM toks, UNNEST(range(len(l))) AS t(i)
  WHERE l[i + 1] <> ''
),
bigrams AS (
  SELECT doc_id, w, LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM words
),
db AS (
  SELECT doc_id, w, w2, COUNT(*) AS c FROM bigrams
  WHERE w2 IS NOT NULL GROUP BY doc_id, w, w2
),
cb AS (
  SELECT w, w2, COUNT(*) AS c_ab FROM bigrams
  WHERE w2 IS NOT NULL GROUP BY w, w2
),
cu AS (SELECT w, COUNT(*) AS c_w FROM words GROUP BY w),
vocab AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM words),
terms AS (
  SELECT db.doc_id, db.c,
         round(db.c * round(ln((cb.c_ab + 1) / ((cu.c_w + vocab.v) * 1.0)), 9),
               9) AS term
  FROM db
  JOIN cb ON db.w = cb.w AND db.w2 = cb.w2
  JOIN cu ON db.w = cu.w
  CROSS JOIN vocab
),
per_doc AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
         CAST(SUM(CAST(term AS DECIMAL(27,12))) AS DOUBLE) / SUM(c) AS avg_lp
  FROM terms GROUP BY doc_id
)
SELECT doc_id, n_bigrams,
       round(avg_lp, 6) AS avg_logprob,
       round(exp(-avg_lp), 6) AS perplexity
FROM per_doc
ORDER BY doc_id
"""


QUERIES = {
    "bigram_pmi_top": bigram_pmi_top,
    "unigram_logprob_score": unigram_logprob_score,
    "corpus_drift_report": corpus_drift_report,
    "text_regex_pretokenize": text_regex_pretokenize,
    "tfidf_top_terms": tfidf_top_terms,
    "bm25_search": bm25_search,
    "text_token_stats": text_token_stats,
    "text_normalize": text_normalize,
    "contamination_screen": contamination_screen,
    "text_quality_score": text_quality_score,
    "text_lang_id": text_lang_id,
    "doc_fingerprint": doc_fingerprint,
    "text_corpus_stats": text_corpus_stats,
    "doc_repetition_report": doc_repetition_report,
    "span_dedup_report": span_dedup_report,
    "span_dedup_rewrite": span_dedup_rewrite,
    "doc_entropy_report": doc_entropy_report,
    "ngram_topk_corpus": ngram_topk_corpus,
    "gopher_quality_report": gopher_quality_report,
    "vocab_coverage_report": vocab_coverage_report,
    "tokenizer_fertility_report": tokenizer_fertility_report,
    "bigram_logprob_score": bigram_logprob_score,
}

ORACLES = {
    "bigram_pmi_top": BIGRAM_PMI_SQL,
    "unigram_logprob_score": UNIGRAM_LOGPROB_SQL,
    "corpus_drift_report": CORPUS_DRIFT_SQL,
    "text_regex_pretokenize": TEXT_PRETOK_SQL,
    "tfidf_top_terms": TFIDF_SQL,
    "bm25_search": BM25_SQL,
    "text_token_stats": TEXT_TOKEN_STATS_SQL,
    "text_normalize": TEXT_NORMALIZE_SQL,
    "contamination_screen": CONTAMINATION_SQL,
    "text_quality_score": TEXT_QUALITY_SQL,
    "text_lang_id": TEXT_LANG_ID_SQL,
    "doc_fingerprint": DOC_FINGERPRINT_SQL,
    "text_corpus_stats": TEXT_CORPUS_STATS_SQL,
    "doc_repetition_report": DOC_REPETITION_SQL,
    "span_dedup_report": SPAN_DEDUP_SQL,
    "span_dedup_rewrite": SPAN_DEDUP_REWRITE_SQL,
    "doc_entropy_report": DOC_ENTROPY_SQL,
    "ngram_topk_corpus": NGRAM_TOPK_SQL,
    "gopher_quality_report": GOPHER_QUALITY_SQL,
    "vocab_coverage_report": VOCAB_COVERAGE_SQL,
    "tokenizer_fertility_report": TOKENIZER_FERTILITY_SQL,
    "bigram_logprob_score": BIGRAM_LOGPROB_SQL,
}
