"""Distributed BPE trainer (r9): the Spark greedy merge loop must be
byte-identical to the driver-side Python trainer (`tools/train_bpe.py`)
— same pair counts (overlaps counted, weighted by word frequency), same
(-count, (a, b)) tie-break, same <2 early stop."""

from __future__ import annotations

import sys

from orionld_to_hive_spark.operators.bpe import (
    FROZEN_MERGES,
    train_bpe,
    train_bpe_frame,
)

SF = "/root/testdata/sf0.001"


def test_spark_trainer_reproduces_frozen_table(spark):
    """trainer(Spark) ≡ trainer(Python) on the sf0.001 corpus: the
    frozen table IS the Python trainer's output (pinned by
    test_bpe.py::test_frozen_merges_match_trainer), so regenerating it
    byte-identically from the Spark job closes the equality."""
    assert tuple(train_bpe(spark, SF, 40)) == FROZEN_MERGES


def test_spark_trainer_matches_python_directly(spark):
    """Independent short-prefix agreement straight against the Python
    implementation (not through the frozen constant)."""
    sys.path.insert(0, "/root/repo/tools")
    from train_bpe import train

    assert train_bpe(spark, SF, 6) == train(6)


def _docs_frame(spark, text: str):
    return spark.createDataFrame(
        [(1, "src", text)], ["doc_id", "source", "text"]
    )


def test_trainer_early_stop_below_two(spark):
    # words: "aa"×2, "ab"×1 → pair (a,a) count 2 merges; the remaining
    # (a,b) count 1 is below the threshold → stop after one merge even
    # though more were requested
    docs = _docs_frame(spark, "aa aa ab")
    assert train_bpe_frame(docs, 10) == [("a", "a")]


def test_trainer_lexicographic_tie_break(spark):
    # (x,y) and (p,q) both count 3 → lexicographically smallest (p,q)
    # wins the first round, (x,y) the second
    docs = _docs_frame(spark, "xy xy xy pq pq pq")
    assert train_bpe_frame(docs, 2) == [("p", "q"), ("x", "y")]


def test_trainer_overlap_counting(spark):
    # "aaa": symbols a a a → two overlapping (a,a) pairs, counted BOTH
    # (the Python trainer's zip does) — with weight 1 each the pair
    # reaches the ≥2 threshold from a single word
    docs = _docs_frame(spark, "aaa")
    got = train_bpe_frame(docs, 1)
    assert got == [("a", "a")]
