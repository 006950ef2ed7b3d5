"""End-to-end corpus curation pipeline — the composition proof.

A training-data pipeline is not a bag of operators but a chain:
filter → dedup → score → cut → account. This module runs the chain as
ONE lazy DataFrame plan (no intermediate materialization) so Catalyst
fuses the stages: the quality predicates evaluate inside the scan
stage, dedup is the only wide dependency, and the final accounting
reuses dedup's shuffle output.

Stages (each individually covered by dedup.py / text.py operators):
  1. structural quality gate: non-null text, length window, alpha ratio;
  2. exact dedup on sha256(text): min doc_id survives;
  3. token accounting + quality score on survivors;
  4. per-(lang, source) yield report: docs kept, tokens kept, mean score.

Scale: one scan, two shuffles total (dedup hash-agg + final report agg;
the survivor join broadcasts at dim-like sizes and AQE picks SMJ
beyond). At 100 TB the same plan holds — the sha256 shuffle carries
32-byte keys, and nothing ever collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orionld_to_hive_spark.functions.numeric import davg, sql_davg
from orionld_to_hive_spark.sources.warehouse import load_table

MIN_CHARS = 20
MAX_CHARS = 10_000
MIN_ALPHA_RATIO = 0.5


def _quality_gate(docs: DataFrame) -> DataFrame:
    n_alpha = F.length(F.regexp_replace("text", r"[^A-Za-z]", ""))
    n_chars = F.length("text")
    return docs.filter(
        F.col("text").isNotNull()
        & (n_chars >= MIN_CHARS)
        & (n_chars <= MAX_CHARS)
        & ((n_alpha / n_chars) >= MIN_ALPHA_RATIO)
    )


def curate_documents(
    spark: SparkSession,
    sf_dir: str,
    input_obs=None,
    gated_obs=None,
) -> DataFrame:
    """Survivor set after quality gate + exact dedup, with per-doc
    token count and quality score.

    Pass two `pyspark.sql.Observation` objects to get stage-yield
    telemetry (rows seen / rows surviving the gate) measured ON THE
    SAME JOB — production pipelines need per-stage yields, and a
    second counting scan of a 100 TB input is not an option.
    `observe()` aggregates ride the existing stage like any other
    partial aggregate; read `obs.get` after an action."""
    raw = load_table(spark, sf_dir, "documents")
    if input_obs is not None:
        raw = raw.observe(input_obs, F.count(F.lit(1)).alias("n_input"))
    docs = _quality_gate(raw)
    if gated_obs is not None:
        docs = docs.observe(gated_obs, F.count(F.lit(1)).alias("n_gated"))
    hashed = docs.withColumn("text_hash", F.sha2(F.col("text").cast("binary"), 256))
    survivors = hashed.groupBy("text_hash").agg(F.min("doc_id").alias("doc_id"))
    toks = F.split(F.trim("text"), r"\s+")
    return (
        hashed.join(survivors, ["text_hash", "doc_id"], "inner")
        .select(
            "doc_id",
            "lang",
            "source",
            F.size(toks).alias("n_tokens"),
            F.round(
                F.least(F.length("text") / F.lit(1000.0), F.lit(1.0)), 6
            ).alias("quality"),
        )
    )


def pipeline_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) curation yield over the curated survivor set."""
    return (
        curate_documents(spark, sf_dir)
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("docs_kept"),
            F.sum("n_tokens").alias("tokens_kept"),
            davg("quality", "mean_quality"),
        )
    )


PIPELINE_SQL = f"""
WITH gated AS (
  SELECT *
  FROM documents
  WHERE text IS NOT NULL
    AND length(text) BETWEEN {MIN_CHARS} AND {MAX_CHARS}
    AND length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
        / length(text) >= {MIN_ALPHA_RATIO}
),
hashed AS (
  SELECT *, sha256(text) AS text_hash FROM gated
),
survivors AS (
  SELECT text_hash, MIN(doc_id) AS doc_id FROM hashed GROUP BY text_hash
),
curated AS (
  SELECT h.doc_id, h.lang, h.source,
         len(regexp_split_to_array(trim(h.text), '\\s+')) AS n_tokens,
         round(LEAST(length(h.text) / 1000.0, 1.0), 6) AS quality
  FROM hashed h JOIN survivors s
    ON h.text_hash = s.text_hash AND h.doc_id = s.doc_id
)
SELECT lang, source,
       COUNT(*) AS docs_kept,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept,
       {sql_davg("quality")} AS mean_quality
FROM curated
GROUP BY lang, source
ORDER BY lang, source
"""


# --------------------------------------------------------------------------
# Deterministic train/validation split. RNG-based splits are
# irreproducible across engines and re-runs; the standard fix is
# content-addressed assignment: hash a stable id, compare against a
# quantile of the hash space. Here: first md5 hex byte < 'cd' ⇒ train
# (205/256 ≈ 80.1% expected share). Hex digits compare LEXICALLY the
# same everywhere, so the exact same docs land in the same split in
# Spark, DuckDB, or any future engine — no seed to drift, no shuffle
# to assign (the split predicate is a row-local expression the scan
# stage evaluates). New documents never reshuffle old assignments —
# the property that keeps a 100 TB training corpus's eval set stable
# across incremental refreshes.
def train_val_split_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = F.when(bucket < "cd", "train").otherwise("val")
    toks = F.split(F.trim("text"), r"\s+")
    return (
        docs.select(split.alias("split"), "lang", F.size(toks).alias("n_tokens"))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


TRAIN_VAL_SPLIT_SQL = """
SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
            THEN 'train' ELSE 'val' END AS split,
       lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
         AS n_tokens
FROM documents
GROUP BY 1, 2
ORDER BY split, lang
"""


# --------------------------------------------------------------------------
# Stratified sample: per-stratum Bernoulli fractions (downsample the
# dominant language, keep the tail) — `sampleBy` pushes the seeded
# coin-flip into the scan stage; no shuffle, no state. Engine RNG ⇒
# rows-only driver check (like P6); determinism pinned by unit test.
STRATA_FRACTIONS = {"en": 0.2, "de": 0.8, "fr": 0.8}


def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.sampleBy("lang", STRATA_FRACTIONS, seed=42).select(
        "doc_id", "lang", "source", "n_chars"
    )


# Stratified twin (r6, same move as parity.p6_sample_hash): the
# per-stratum coin flip is a content-addressed md5 threshold —
# keep iff first-32-md5-bits(doc_id) < fraction(lang)·2³². Identical
# statistics, but partitioning/order/engine independent ⇒ exact DuckDB
# oracle, and the sample is stable across backfills at 100 TB. Strata
# not listed get fraction 0 (drop), matching sampleBy semantics.
_STRATA_THRESHOLDS = {
    lang: int(f * 4294967296) for lang, f in STRATA_FRACTIONS.items()
}


def stratified_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    u32 = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":strat"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    thresh = F.lit(0)
    for lang, t in sorted(_STRATA_THRESHOLDS.items()):
        thresh = F.when(F.col("lang") == lang, F.lit(t)).otherwise(thresh)
    return docs.filter(u32 < thresh).select("doc_id", "lang", "source", "n_chars")


_STRATA_CASE = " ".join(
    f"WHEN '{lang}' THEN {t}" for lang, t in sorted(_STRATA_THRESHOLDS.items())
)

STRATIFIED_SAMPLE_HASH_SQL = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':strat'), 1, 8)
                AS UBIGINT) AS BIGINT)
      < (CASE lang {_STRATA_CASE} ELSE 0 END)
"""


# --------------------------------------------------------------------------
# Deterministic shard assignment: shard = h(doc_id) mod N with the same
# PORTABLE affine hash family the count-min/Bloom sketches use
# (h(u) = ((a·(u mod p) + b) mod p) mod N, p = 2³¹−1, sketches.py) —
# engine-independent, so the DuckDB oracle checks every shard count
# EXACTLY (graduated from rows-only in r5). Training jobs need N
# balanced, reproducible shards whose membership doesn't depend on
# partitioning or row order — a content-hash mod gives exactly that,
# as one row-local expression (no shuffle; the subsequent write
# partitionBy("shard") does the physical routing). Balance +
# determinism additionally pinned by unit test.
N_SHARDS = 8
_SHARD_P = 2147483647  # 2^31 - 1
_SHARD_A, _SHARD_B = 1000003, 12345


def shard_assignment_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    shard = F.pmod(
        F.pmod(
            F.lit(_SHARD_A) * F.pmod(F.col("doc_id"), F.lit(_SHARD_P))
            + F.lit(_SHARD_B),
            F.lit(_SHARD_P),
        ),
        F.lit(N_SHARDS),
    )
    toks = F.split(F.trim("text"), r"\s+")
    return (
        docs.select(shard.alias("shard"), F.size(toks).alias("n_tokens"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


SHARD_ASSIGNMENT_SQL = f"""
SELECT ((({_SHARD_A} * (doc_id % {_SHARD_P}) + {_SHARD_B}) % {_SHARD_P})
         % {N_SHARDS}) AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
         AS n_tokens
FROM documents
GROUP BY 1
ORDER BY shard
"""


# --------------------------------------------------------------------------
# Sequence packing: fill packs of ≤ BUDGET tokens by scanning docs in
# a fixed order WITHIN each source (contiguous-fill packing: a doc
# goes to the pack its running prefix lands in; packs can overflow by
# at most one doc — the standard streaming-packing relaxation).
# Window is partitioned by source, so packing parallelizes across
# sources instead of serializing on one global cumulative sum; the
# (source, doc_id) order makes the result engine-independent, which
# the DuckDB oracle (same window spec) proves.
PACK_BUDGET = 2048


def pack_sequences_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim("text"), r"\s+"))
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    sized = docs.select("source", "doc_id", toks.alias("n_tokens"))
    packed = sized.withColumn(
        "pack_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_BUDGET),
    )
    return (
        packed.groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
        )
    )


PACK_SEQUENCES_SQL = f"""
WITH sized AS (
  SELECT source, doc_id,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
  FROM documents
),
packed AS (
  SELECT source, n_tokens,
         CAST(floor((SUM(n_tokens) OVER w - n_tokens) / {PACK_BUDGET})
              AS BIGINT) AS pack_id
  FROM sized
  WINDOW w AS (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT source, pack_id, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
FROM packed
GROUP BY source, pack_id
ORDER BY source, pack_id
"""


# --------------------------------------------------------------------------
# Mixture resampling: hit a target source-mixture by deterministic
# downsampling. Training corpora weight sources unequally (curated >
# crawled); the standard scale trick is the same content-addressed
# hash as the train/val split — per-source keep thresholds over the
# hash space, so (a) selection is a row-local scan-stage predicate (no
# shuffle, no RNG state), (b) re-runs and engine swaps keep the exact
# same documents, and (c) upweighting a source later only ADDs docs
# (thresholds grow monotonically — no churn in what was already kept).
# Tiers here: premium sources keep all, mid keep ~2/3 ('aaab'/'ffff'
# of the 4-hex-digit space), bulk keep ~1/3 ('5555'/'ffff').
_MIX_TIERS = (
    ("premium", ("src0", "src1", "src2", "src3"), "ffff"),
    ("mid", ("src4", "src5", "src6", "src7", "src8", "src9"), "aaab"),
)
_BULK_THRESHOLD = "5555"


def mixture_resample_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tier = F.lit("bulk")
    threshold = F.lit(_BULK_THRESHOLD)
    for name, sources, thr in _MIX_TIERS:
        tier = F.when(F.col("source").isin(*sources), name).otherwise(tier)
        threshold = F.when(F.col("source").isin(*sources), thr).otherwise(threshold)
    bucket = F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":mix"))), 1, 4)
    kept = (bucket < threshold).cast("int")
    return (
        docs.select(tier.alias("tier"), "source", kept.alias("kept"))
        .groupBy("tier", "source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("kept").alias("n_kept"),
        )
    )


MIXTURE_RESAMPLE_SQL = """
WITH tagged AS (
  SELECT source,
         CASE WHEN source IN ('src0','src1','src2','src3') THEN 'premium'
              WHEN source IN ('src4','src5','src6','src7','src8','src9')
                THEN 'mid'
              ELSE 'bulk' END AS tier,
         CASE WHEN source IN ('src0','src1','src2','src3') THEN 'ffff'
              WHEN source IN ('src4','src5','src6','src7','src8','src9')
                THEN 'aaab'
              ELSE '5555' END AS threshold,
         substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 4) AS bucket
  FROM documents
)
SELECT tier, source, COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN bucket < threshold THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept
FROM tagged
GROUP BY tier, source
ORDER BY tier, source
"""


# --------------------------------------------------------------------------
# Deterministic per-group "reservoir": exactly k docs per source,
# chosen by hash order — a seedless, engine-portable stand-in for
# reservoir sampling (uniform over the group because md5 order is
# independent of any data attribute). One shuffle on the group key;
# at 100 TB, pre-aggregate per partition with a local top-k first —
# here rank() over the hash order IS that plan (Spark runs a partial
# TakeOrdered per map task before the exchange for limit-like windows).
RESERVOIR_K = 5


def reservoir_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":rsv")))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select("source", "doc_id", F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= RESERVOIR_K)
    )


RESERVOIR_SAMPLE_SQL = f"""
SELECT source, doc_id, CAST(sample_rank AS INTEGER) AS sample_rank
FROM (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR) || ':rsv') ASC, doc_id ASC
         ) AS sample_rank
  FROM documents
)
WHERE sample_rank <= {RESERVOIR_K}
ORDER BY source, sample_rank
"""


# --------------------------------------------------------------------------
# Weighted sampling without replacement — Efraimidis–Spirakis, the
# standard distributed algorithm (each item gets key u^(1/w); the k
# largest keys are the sample). Two determinism moves: the uniform u
# comes from a hash (md5 first 8 hex digits / 16^8 ∈ (0,1]), not an
# RNG, and the key is kept in log form ln(u)/w (same ordering, no
# pow() underflow for large weights), rounded to 9 dp — far above any
# cross-engine libm drift, ties broken by doc_id. Per-group top-k by
# key = one shuffle on the group key; weights here are document
# lengths (longer docs proportionally likelier — the usual
# token-budget-aware choice).
WEIGHTED_K = 5


def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"),
                                          F.lit(":ws"))), 1, 8), 16, 10)
        .cast("double")
        + 1.0
    ) / F.lit(4294967296.0)  # (0,1]
    key = F.round(F.log(u) / F.col("n_chars"), 9)
    w = Window.partitionBy("source").orderBy(
        F.col("key").desc(), F.col("doc_id").asc()
    )
    return (
        docs.filter(F.col("n_chars") > 0)
        .withColumn("key", key)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= WEIGHTED_K)
        .select("source", "sample_rank", "doc_id", "n_chars")
    )


WEIGHTED_SAMPLE_SQL = f"""
WITH keyed AS (
  SELECT source, doc_id, n_chars,
         round(ln((CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':ws'),
                                      1, 8) AS UBIGINT) AS DOUBLE) + 1.0)
                  / 4294967296.0) / n_chars, 9) AS key
  FROM documents WHERE n_chars > 0
)
SELECT source, CAST(sample_rank AS INTEGER) AS sample_rank, doc_id, n_chars
FROM (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY key DESC, doc_id ASC) AS sample_rank
  FROM keyed
)
WHERE sample_rank <= {WEIGHTED_K}
ORDER BY source, sample_rank
"""


# --------------------------------------------------------------------------
# PII pseudonymization: replace raw identifiers with a keyed hash
# before data reaches a training corpus. Deterministic (same id → same
# token, so joins/aggregations still work downstream) but not
# reversible without the key. Row-local scan-stage expression — zero
# shuffle; the grouped output proves token cardinality matches the
# original id cardinality (no collisions collapsed, nothing dropped).
PSEUDO_KEY = "demo-rotation-2024"  # in production: injected secret, rotated


def pseudonymize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    token = F.substring(
        F.sha2(
            F.concat(F.lit(PSEUDO_KEY + ":"), F.col("user_id").cast("string")), 256
        ),
        1,
        16,
    )
    return (
        ev.select(token.alias("user_token"), "event_type")
        .groupBy("user_token")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


PSEUDONYMIZE_SQL = f"""
SELECT substr(sha256('{PSEUDO_KEY}:' || CAST(user_id AS VARCHAR)), 1, 16)
         AS user_token,
       COUNT(*) AS n_events
FROM events
GROUP BY user_token
ORDER BY user_token
"""


# --------------------------------------------------------------------------
# Content-level PII detection + redaction — the stage every serious
# training-data pipeline runs before text leaves curation (companion to
# pseudonymize_events, which only covers structured IDs). Pure JVM-side
# regexp_count/regexp_replace — a row-local scan expression with ZERO
# shuffle before the per-source rollup, so at 100 TB it is exactly one
# pass over the corpus fused into the scan stage. Patterns use [0-9]
# classes and no backreferences/lookaround so Java regex (Spark) and
# RE2 (DuckDB) agree byte-for-byte. The synthetic corpus contains no
# natural PII, so the query PLANTS deterministic doc_id-derived PII in
# both engines identically — the detector, the redactor, and the
# length-delta accounting are then checked against real per-source
# variation, not a vacuous all-zeros table. A unit test plants literal
# PII strings and asserts the redacted text directly.
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_PHONE = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
_PII_SSN = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
_PII_SECRET = "(api_key|secret|token)=[A-Za-z0-9_]{8,}"


def _pii_redact_col(t: F.Column) -> F.Column:
    # email → ssn → phone → secret; placeholders contain no digits or
    # '@'/'=' runs, so later patterns never match earlier replacements.
    red = F.regexp_replace(t, _PII_EMAIL, "[EMAIL]")
    red = F.regexp_replace(red, _PII_SSN, "[SSN]")
    red = F.regexp_replace(red, _PII_PHONE, "[PHONE]")
    return F.regexp_replace(red, _PII_SECRET, "[SECRET]")


def pii_redaction_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.when(
            (did % 7) == 0,
            F.concat(
                F.lit(" contact u"), did.cast("string"), F.lit("@example.com")
            ),
        ).otherwise(F.lit("")),
        F.when(
            (did % 11) == 0,
            F.concat(
                F.lit(" call +1-555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            (did % 13) == 0,
            F.concat(
                F.lit(" ssn 987-65-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            (did % 17) == 0,
            F.concat(
                F.lit(" api_key=tok_"), F.lpad(did.cast("string"), 12, "0")
            ),
        ).otherwise(F.lit("")),
    )
    t = docs.select(
        "source",
        planted.alias("t"),
    ).select(
        "source",
        F.size(F.regexp_extract_all("t", F.lit(_PII_EMAIL), F.lit(0))).alias(
            "e"
        ),
        F.size(F.regexp_extract_all("t", F.lit(_PII_PHONE), F.lit(0))).alias(
            "p"
        ),
        F.size(F.regexp_extract_all("t", F.lit(_PII_SSN), F.lit(0))).alias(
            "s"
        ),
        F.size(F.regexp_extract_all("t", F.lit(_PII_SECRET), F.lit(0))).alias(
            "k"
        ),
        (F.length(_pii_redact_col(F.col("t"))) - F.length("t")).alias(
            "delta"
        ),
    )
    hit = (F.col("e") + F.col("p") + F.col("s") + F.col("k")) > 0
    return (
        t.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(hit.cast("int")).alias("docs_with_pii"),
            F.sum("e").alias("n_emails"),
            F.sum("p").alias("n_phones"),
            F.sum("s").alias("n_ssns"),
            F.sum("k").alias("n_secrets"),
            F.sum("delta").alias("redaction_len_delta"),
        )
    )


PII_REDACTION_SQL = (
    """
WITH aug AS (
  SELECT source,
         coalesce(text, '')
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN ' ssn 987-65-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 17 = 0
                 THEN ' api_key=tok_' || lpad(CAST(doc_id AS VARCHAR), 12, '0')
                 ELSE '' END
         AS t
  FROM documents
),
scored AS (
  SELECT source,
         len(regexp_extract_all(t, '__EMAIL__')) AS e,
         len(regexp_extract_all(t, '__PHONE__')) AS p,
         len(regexp_extract_all(t, '__SSN__')) AS s,
         len(regexp_extract_all(t, '__SECRET__')) AS k,
         length(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             t, '__EMAIL__', '[EMAIL]', 'g'),
                '__SSN__', '[SSN]', 'g'),
                '__PHONE__', '[PHONE]', 'g'),
                '__SECRET__', '[SECRET]', 'g')) - length(t) AS delta
  FROM aug
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS docs,
       CAST(SUM(CASE WHEN e + p + s + k > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_with_pii,
       CAST(SUM(e) AS BIGINT) AS n_emails,
       CAST(SUM(p) AS BIGINT) AS n_phones,
       CAST(SUM(s) AS BIGINT) AS n_ssns,
       CAST(SUM(k) AS BIGINT) AS n_secrets,
       CAST(SUM(delta) AS BIGINT) AS redaction_len_delta
FROM scored
GROUP BY source
ORDER BY source
"""
    .replace("__EMAIL__", _PII_EMAIL)
    .replace("__PHONE__", _PII_PHONE)
    .replace("__SSN__", _PII_SSN)
    .replace("__SECRET__", _PII_SECRET)
)


# --------------------------------------------------------------------------
# Differential-privacy noised release — the Laplace mechanism on per-type
# counts (sensitivity 1), with DETERMINISTIC portable noise: the uniform
# draw is the first 15 decimal digits of md5(key || group), identical in
# both engines, pushed through the inverse Laplace CDF. That makes a
# normally-unoracleable randomized mechanism exactly oracle-checkable
# while keeping the statistical shape of real DP noise. true_n is
# retained because this op is the pipeline's noise-calibration AUDIT
# (production release drops it — docstring contract, not schema).
# Scale: one bounded-cardinality aggregate; noise is a per-group column
# expression, no shuffle beyond the count.
DP_EPSILON = 1.0
DP_NOISE_KEY = "dp-noise-v1"


def dp_count_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("true_n"))
    digits = F.regexp_replace(
        F.md5(F.concat(F.lit(DP_NOISE_KEY + ":"), F.col("event_type"))),
        "[a-f]",
        "",
    )
    # nullif guards the (astronomically rare) all-letters digest, which
    # would be an ANSI cast error; the clamp keeps ln() off exact 0.
    raw_u = F.coalesce(
        F.nullif(F.substring(digits, 1, 15), F.lit("")).cast("long") / F.lit(1e15),
        F.lit(0.5),
    )
    u = F.least(F.greatest(raw_u, F.lit(1e-12)), F.lit(1.0 - 1e-12))
    b = 1.0 / DP_EPSILON
    noise = F.round(
        -F.lit(b)
        * F.signum(u - 0.5)
        * F.log(1.0 - 2.0 * F.abs(u - 0.5)),
        6,
    )
    return (
        counts.select(
            "event_type",
            "true_n",
            F.lit(DP_EPSILON).alias("epsilon"),
            noise.alias("noise"),
            F.round(F.col("true_n") + noise, 6).alias("noised_n"),
        )
    )


DP_COUNT_SQL = f"""
WITH counts AS (
  SELECT event_type, COUNT(*) AS true_n FROM events GROUP BY event_type
),
noise AS (
  SELECT event_type, true_n,
         least(greatest(
           COALESCE(
             CAST(nullif(substr(regexp_replace(md5('{DP_NOISE_KEY}:' || event_type),
                                               '[a-f]', '', 'g'), 1, 15), '')
                  AS BIGINT) / 1e15,
             0.5),
           1e-12), 1.0 - 1e-12) AS u
  FROM counts
)
SELECT event_type, true_n,
       {DP_EPSILON} AS epsilon,
       round(-(1.0 / {DP_EPSILON}) * sign(u - 0.5)
             * ln(1.0 - 2.0 * abs(u - 0.5)), 6) AS noise,
       round(true_n + round(-(1.0 / {DP_EPSILON}) * sign(u - 0.5)
             * ln(1.0 - 2.0 * abs(u - 0.5)), 6), 6) AS noised_n
FROM noise
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# k-anonymity audit over quasi-identifiers — before releasing (or
# training on) a user-keyed table, measure how many rows sit in
# QI-equivalence classes smaller than k (re-identifiable). QIs here:
# (nation, market segment, account-balance kilobucket). One groupBy on
# the QI tuple, one 1-row summary — the standard pre-release gate next
# to pseudonymize_events.
K_ANON = 5


def kanonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    groups = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).alias("bal_bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return groups.agg(
        F.lit(K_ANON).alias("k"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n").alias("n_rows"),
        F.sum(F.when(F.col("n") < K_ANON, 1).otherwise(0)).alias(
            "n_violating_groups"
        ),
        F.sum(F.when(F.col("n") < K_ANON, F.col("n")).otherwise(0)).alias(
            "n_rows_at_risk"
        ),
    ).select(
        "k",
        "n_groups",
        "n_rows",
        "n_violating_groups",
        "n_rows_at_risk",
        F.round(F.col("n_rows_at_risk") / F.col("n_rows"), 6).alias("risk_frac"),
    )


KANONYMITY_SQL = f"""
WITH groups AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
         COUNT(*) AS n
  FROM customer
  GROUP BY 1, 2, 3
)
SELECT {K_ANON} AS k,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN n < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_groups,
       CAST(SUM(CASE WHEN n < {K_ANON} THEN n ELSE 0 END) AS BIGINT)
         AS n_rows_at_risk,
       round(CAST(SUM(CASE WHEN n < {K_ANON} THEN n ELSE 0 END) AS DOUBLE)
             / SUM(n), 6) AS risk_frac
FROM groups
"""


QUERIES = {
    "pipeline_curation_report": pipeline_curation_report,
    "pseudonymize_events": pseudonymize_events,
    "pii_redaction_report": pii_redaction_report,
    "mixture_resample_report": mixture_resample_report,
    "reservoir_sample_per_source": reservoir_sample_per_source,
    "weighted_sample_docs": weighted_sample_docs,
    "train_val_split_report": train_val_split_report,
    "stratified_sample_docs": stratified_sample_docs,
    "stratified_sample_hash": stratified_sample_hash,
    "shard_assignment_report": shard_assignment_report,
    "pack_sequences_report": pack_sequences_report,
    "dp_count_report": dp_count_report,
    "kanonymity_audit": kanonymity_audit,
}

ORACLES = {
    "pipeline_curation_report": PIPELINE_SQL,
    "mixture_resample_report": MIXTURE_RESAMPLE_SQL,
    "reservoir_sample_per_source": RESERVOIR_SAMPLE_SQL,
    "train_val_split_report": TRAIN_VAL_SPLIT_SQL,
    "stratified_sample_hash": STRATIFIED_SAMPLE_HASH_SQL,
    "shard_assignment_report": SHARD_ASSIGNMENT_SQL,
    "pack_sequences_report": PACK_SEQUENCES_SQL,
    "weighted_sample_docs": WEIGHTED_SAMPLE_SQL,
    "pseudonymize_events": PSEUDONYMIZE_SQL,
    "pii_redaction_report": PII_REDACTION_SQL,
    "dp_count_report": DP_COUNT_SQL,
    "kanonymity_audit": KANONYMITY_SQL,
}
