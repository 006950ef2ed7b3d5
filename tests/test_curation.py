"""Unit tests for the curation operators: chunking overlap/coverage
invariants, incremental-dedup semantics on a constructed corpus/batch,
curriculum-bin boundaries at exact powers of two, and the classifier's
keep-decision consistency. The oracle sweep checks value parity; these
pin the operator semantics on adversarial tiny inputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from orionld_to_hive_spark.operators.curation import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    dedup_incremental_batch,
    doc_chunks,
    quality_classifier_score,
    seq_len_curriculum,
)


def _with_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_chunks_cover_and_overlap(spark, tmp_path):
    # 150 tokens -> starts 1, 49, 97, 145: chunks of 64/64/54/6 tokens.
    text = " ".join(f"w{i}" for i in range(150))
    sf = _with_docs(spark, tmp_path, [(1, text, "en", "web", len(text))])
    rows = sorted(doc_chunks(spark, sf).collect(), key=lambda r: r.chunk_id)
    assert [r.n_chunk_tokens for r in rows] == [64, 64, 54, 6]
    toks = text.split(" ")
    for r in rows:
        start = r.chunk_id * CHUNK_STRIDE
        assert r.chunk_text.split(" ") == toks[start : start + CHUNK_TOKENS]
    # consecutive chunks overlap by CHUNK_TOKENS - CHUNK_STRIDE tokens
    for a, b in zip(rows, rows[1:]):
        a_toks, b_toks = a.chunk_text.split(" "), b.chunk_text.split(" ")
        overlap = CHUNK_TOKENS - CHUNK_STRIDE
        if a.n_chunk_tokens == CHUNK_TOKENS:
            assert a_toks[-overlap:] == b_toks[: min(overlap, b.n_chunk_tokens)][: len(a_toks[-overlap:])]


def test_chunks_short_doc_single_chunk(spark, tmp_path):
    sf = _with_docs(spark, tmp_path, [(1, "only three words", "en", "web", 16)])
    rows = doc_chunks(spark, sf).collect()
    assert len(rows) == 1
    assert rows[0].chunk_id == 0
    assert rows[0].chunk_text == "only three words"


def test_incremental_dedup_flags_only_corpus_matches(spark, tmp_path):
    # batch = doc_id % 5 == 0. doc 5 duplicates corpus doc 1; doc 10 only
    # duplicates ANOTHER BATCH doc (15) — must NOT be flagged; doc 20 unique.
    rows = [
        (1, "shared corpus text", "en", "web", 18),
        (2, "corpus filler", "en", "web", 13),
        (5, "shared corpus text", "en", "web", 18),
        (10, "batch-only duplicate", "en", "web", 20),
        (15, "batch-only duplicate", "en", "web", 20),
        (20, "unique batch text", "en", "web", 17),
    ]
    sf = _with_docs(spark, tmp_path, rows)
    got = {r.doc_id: r.is_dup for r in dedup_incremental_batch(spark, sf).collect()}
    assert got == {5: 1, 10: 0, 15: 0, 20: 0}


def test_curriculum_bins_power_of_two_boundaries(spark, tmp_path):
    # bit-length bins: n=1 -> 1, n=2..3 -> 2, n=4..7 -> 3, n=8..15 -> 4
    docs = [
        (1, "a", "s", "s", 1),
        (2, " ".join("x" * 1 for _ in range(3)), "s", "s", 5),
        (3, " ".join("x" for _ in range(4)), "s", "s", 7),
        (4, " ".join("x" for _ in range(7)), "s", "s", 13),
        (5, " ".join("x" for _ in range(8)), "s", "s", 15),
    ]
    sf = _with_docs(spark, tmp_path, docs)
    got = {
        (r.len_bin): (r.n_docs, r.min_tokens, r.max_tokens)
        for r in seq_len_curriculum(spark, sf).collect()
    }
    assert got == {1: (1, 1, 1), 2: (1, 3, 3), 3: (2, 4, 7), 4: (1, 8, 8)}


def test_classifier_keep_matches_logit_sign(spark, sf_smoke):
    df = quality_classifier_score(spark, sf_smoke)
    bad = df.filter(
        (F.col("clf_keep") & (F.col("clf_logit") < -1e-6))
        | (~F.col("clf_keep") & (F.col("clf_logit") > 1e-6))
    )
    assert bad.count() == 0
    # the frozen weights must actually split the corpus, not rubber-stamp it
    kinds = {r.clf_keep for r in df.select("clf_keep").distinct().collect()}
    assert kinds == {True, False}


def test_budget_selection_respects_token_budget(spark, sf_smoke):
    from pyspark.sql import functions as F2

    from orionld_to_hive_spark.operators.curation import (
        BUDGET_FRAC,
        budget_select_report,
    )
    from orionld_to_hive_spark.sources.warehouse import load_table

    kept = (
        budget_select_report(spark, sf_smoke)
        .agg(F2.sum("kept_tokens").alias("k"))
        .collect()[0]
        .k
    )
    total = (
        load_table(spark, sf_smoke, "documents")
        .select(F2.size(F2.split("text", " ")).alias("n"))
        .agg(F2.sum("n").alias("t"))
        .collect()[0]
        .t
    )
    assert 0 < kept <= BUDGET_FRAC * total
