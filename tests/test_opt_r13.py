"""Focused equivalence pins for the r13 optimization rewrites.

Each test pins the NEW form against an inline reconstruction of the OLD
form on adversarial inputs (plus the real corpus), so the end-to-end
oracle diff is not the only guard on these internals:

  - `_adjacent_bigrams` (arrays_zip of shifted slices) == lead() window
    pairs;
  - `_substr_dups` packed-bigint argmin == min(struct(doc_id, pos));
  - `_gram_structs`/`_gram_value` exploded digests == `_word_grams`'
    per-element transform lambda.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

ADVERSARIAL_TEXTS = [
    (0, "a b c d"),
    (1, "single"),
    (2, ""),
    (3, "   "),  # whitespace-only: trim -> '' -> no tokens either way
    (4, "a a a a a"),  # repeated token
    (5, "x"),
    (6, "one two"),
    (7, None),  # NULL text: no rows either way
    (8, "tab\tand space mix"),
    (9, "a b a b a b a b a b"),  # overlapping repeats
]


def _docs_df(spark):
    return spark.createDataFrame(
        ADVERSARIAL_TEXTS, "doc_id LONG, text STRING"
    )


def _old_bigrams(docs):
    words = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "w"),
    ).filter(F.col("w") != "")
    nxt = F.lead("w").over(Window.partitionBy("doc_id").orderBy("pos"))
    return (
        words.withColumn("w2", nxt)
        .filter(F.col("w2").isNotNull())
        .select("doc_id", "w", "w2")
    )


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_adjacent_bigrams_equals_window_lead(spark, sf_smoke):
    from orionld_to_hive_spark.operators.text import _adjacent_bigrams, _docs

    adv = _docs_df(spark)
    assert _rows(_adjacent_bigrams(adv), ["doc_id", "w", "w2"]) == _rows(
        _old_bigrams(adv), ["doc_id", "w", "w2"]
    )
    corpus = _docs(spark, sf_smoke)
    assert _rows(_adjacent_bigrams(corpus), ["doc_id", "w", "w2"]) == _rows(
        _old_bigrams(corpus), ["doc_id", "w", "w2"]
    )


def test_adjacent_bigrams_plan_is_window_free(spark, sf_smoke):
    from orionld_to_hive_spark.operators.text import _adjacent_bigrams, _docs

    plan = (
        _adjacent_bigrams(_docs(spark, sf_smoke))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "Exchange" not in plan  # pair formation is fully narrow


def test_substr_dups_pack_equals_struct_min(spark, sf_smoke):
    from orionld_to_hive_spark.operators.dedup import (
        _docs,
        _substr_dups,
        _substr_grams,
    )

    toks = F.split(F.col("text"), " ")
    docs = _docs(spark, sf_smoke).select("doc_id", toks.alias("toks"))
    new = _rows(_substr_dups(docs), ["doc_id", "pos"])

    grams = _substr_grams(docs)
    firsts = (
        grams.groupBy("gh")
        .agg(
            F.min(F.struct("doc_id", "pos")).alias("first"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .filter(F.col("cnt") > 1)
        .select("gh", "first")
    )
    old = _rows(
        grams.join(firsts, "gh")
        .filter(
            (F.col("doc_id") != F.col("first.doc_id"))
            | (F.col("pos") != F.col("first.pos"))
        )
        .select("doc_id", "pos"),
        ["doc_id", "pos"],
    )
    assert new == old and len(new) > 0


def test_substr_dups_plan_has_no_sort_aggregate(spark, sf_smoke):
    from orionld_to_hive_spark.operators.dedup import _docs, _substr_dups

    toks = F.split(F.col("text"), " ")
    docs = _docs(spark, sf_smoke).select("doc_id", toks.alias("toks"))
    plan = _substr_dups(docs)._jdf.queryExecution().executedPlan().toString()
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan


def test_gram_structs_explode_equals_word_grams(spark, sf_smoke):
    from orionld_to_hive_spark.operators.text import (
        _docs,
        _gram_structs,
        _gram_value,
        _word_grams,
    )

    for k, hashed in ((8, True), (3, False), (2, True)):
        for docs in (_docs_df(spark), _docs(spark, sf_smoke)):
            toks = F.split(F.col("text"), " ")
            new = _rows(
                docs.select(
                    "doc_id",
                    F.posexplode(_gram_structs(toks, k)).alias("pos", "s"),
                ).select(
                    "doc_id", "pos", _gram_value(F.col("s"), k, hashed).alias("g")
                ),
                ["doc_id", "pos", "g"],
            )
            old = _rows(
                docs.select(
                    "doc_id",
                    F.posexplode(_word_grams(toks, k, hashed=hashed)).alias(
                        "pos", "g"
                    ),
                ),
                ["doc_id", "pos", "g"],
            )
            assert new == old
