"""Document-frequency cap on the inverted-index Jaccard join.

A single ultra-frequent ("stop-phrase") shingle shared by N docs emits
O(N²) rows in the candidate self-join; the DF cap excludes such
shingles from candidate generation while exact verification over the
full shingle arrays keeps every reported score unchanged.
"""

from __future__ import annotations

from orionld_to_hive_spark.operators.dedup import (
    _exact_jaccard_pairs,
    _jaccard_candidates,
    shingles,
)


def _sh(spark, rows):
    return shingles(spark.createDataFrame(rows, ["doc_id", "text"]))


def test_df_cap_bounds_hot_shingle_fanout(spark):
    # 60 docs share one hot 3-gram but are otherwise unique: uncapped,
    # the index emits all C(60,2) candidate pairs from that one shingle.
    rows = [
        (i, f"common common common u{i}a u{i}b u{i}c u{i}d")
        for i in range(60)
    ]
    sh = _sh(spark, rows)
    assert _jaccard_candidates(sh, df_cap=10**9).count() == 60 * 59 // 2
    assert _jaccard_candidates(sh, df_cap=10).count() == 0


def test_df_cap_preserves_pair_scores(spark):
    # A true near-dup pair sits in a corpus with a hot shingle. With the
    # cap low enough to drop the hot shingle, the pair is still found
    # (via its many rare shared shingles) and its Jaccard still counts
    # the hot shingle — verification reads the full arrays.
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (0, f"common common common {base}"),
        (1, f"common common common {base} kilo"),
    ]
    rows += [
        (i, f"common common common z{i}a z{i}b z{i}c z{i}d")
        for i in range(2, 40)
    ]
    sh = _sh(spark, rows)
    uncapped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in _exact_jaccard_pairs(sh, 0.5, df_cap=10**9).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in _exact_jaccard_pairs(sh, 0.5, df_cap=5).collect()
    }
    assert (0, 1) in capped
    assert capped == uncapped
