"""BPE tokenizer apply: hand-verified merge semantics, the
cross-boundary false-merge regression, table/trainer agreement, and
accounting invariants. The exact DuckDB value-match for both registry
queries runs in test_oracle_diff.py like every other oracle."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from orionld_to_hive_spark.operators.bpe import (
    FROZEN_MERGES,
    _segment,
    bpe_token_accounting,
    bpe_tokenize_report,
)

SF = "/root/testdata/sf0.001"


def _seg(spark, word: str, merges) -> str:
    df = spark.createDataFrame([(word,)], ["w"])
    return df.select(_segment(F.col("w"), merges).alias("s")).collect()[0].s


def test_segment_hand_verified_merges(spark):
    merges = (("l", "o"), ("lo", "w"), ("e", "r"))
    # l o w e r -> lo w e r -> low e r -> low er
    assert _seg(spark, "lower", merges) == " low  er "
    assert _seg(spark, "rel", merges) == " r  e  l "  # no pair applies


def test_segment_prefix_symbol_never_merges_across_boundary(spark):
    # Regression for the single-space encoding bug: with merges
    # (s,t) then (a,s), "fast" becomes f a st, and the (a,s) pattern
    # must NOT match the 'a' + the st-symbol's leading 's'.
    merges = (("s", "t"), ("a", "s"))
    assert _seg(spark, "fast", merges) == " f  a  st "
    # ...while a real adjacent (a, s) pair still merges
    assert _seg(spark, "asp", merges) == " as  p "


def test_segment_consecutive_pairs_each_merge(spark):
    # Both non-overlapping (a,s) occurrences merge in one pass;
    # overlapping runs merge left-to-right non-overlapping.
    merges = (("a", "s"),)
    assert _seg(spark, "asas", merges) == " as  as "
    aa = (("a", "a"),)
    assert _seg(spark, "aaa", aa) == " aa  a "
    assert _seg(spark, "aaaa", aa) == " aa  aa "


def test_frozen_merges_match_trainer():
    """The embedded table IS the trainer's output (first merges are
    enough to pin: a trainer/table drift would diverge early)."""
    sys.path.insert(0, "/root/repo/tools")
    from train_bpe import train

    assert tuple(train(8)) == FROZEN_MERGES[:8]


def test_accounting_invariants(spark):
    rows = bpe_token_accounting(spark, SF).collect()
    assert len(rows) == 20  # one row per source
    for r in rows:
        assert r.n_tokens >= r.n_words >= r.n_docs > 0
        assert 1.0 <= r.fertility <= 10.0
        assert abs(r.fertility - r.n_tokens / r.n_words) < 1e-12
    # n_words across sources == total pre-token count over the corpus
    from orionld_to_hive_spark.operators.text import (
        text_regex_pretokenize,
    )

    total_pretok = (
        text_regex_pretokenize(spark, SF)
        .agg(F.sum("n_pretokens"))
        .collect()[0][0]
    )
    assert sum(r.n_words for r in rows) == total_pretok


def test_tokenize_report_occurrences_cover_corpus(spark):
    """Every token's occurrence count is word-frequency-weighted, so
    the (untruncated) sum of n_occ equals total corpus tokens from the
    accounting query."""
    rep = bpe_tokenize_report(spark, SF)
    # the report is LIMIT 40; the sf0.001 token inventory is smaller,
    # so the limit is not binding here and totals must reconcile
    n_distinct = rep.count()
    assert n_distinct <= 40
    total_occ = rep.agg(F.sum("n_occ")).collect()[0][0]
    total_tokens = (
        bpe_token_accounting(spark, SF)
        .agg(F.sum("n_tokens"))
        .collect()[0][0]
    )
    assert total_occ == total_tokens


def test_accounting_plan_gate(spark):
    """Scale-credibility pins for the r8 flagship: the merge chain is
    pure JVM (no Python eval node anywhere in the plan), and both
    passes prune the documents scan — the vocabulary branch reads the
    text column ALONE; no branch reads lang/n_chars."""
    import re

    df = bpe_token_accounting(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # Batch/ArrowEvalPython both absent
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert len(schemas) == 2  # exactly the two documented passes
    assert any(s == "text:string" for s in schemas)  # vocab branch
    for s in schemas:
        assert "lang" not in s and "n_chars" not in s
