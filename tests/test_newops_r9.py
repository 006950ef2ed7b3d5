"""Round-9 operator units: overlapping exact-substring dedup
(Lee et al. 2022 ExactSubstr at fixed 8-token window granularity).
Exact oracle value-matches run in test_oracle_diff.py; these units pin
the semantics the sf0.001 corpus doesn't force — unaligned duplicates
the tiled rewrite misses, within-document overlap resolution, and the
keep-first tie order.
"""

from __future__ import annotations

from orionld_to_hive_spark.operators.dedup import (
    exact_substr_rewrite,
    exact_substr_spans,
)
from orionld_to_hive_spark.operators.text import span_dedup_rewrite

PHRASE = "p0 p1 p2 p3 p4 p5 p6 p7"  # exactly EXACT_SUBSTR_K tokens


def _corpus(spark, tmp_path, rows):
    d = tmp_path / "docs"
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(
        1
    ).write.parquet(str(d / "documents.parquet"))
    return str(d)


def _rewrite(spark, sf_dir):
    return {
        r["doc_id"]: r
        for r in exact_substr_rewrite(spark, sf_dir).collect()
    }


def test_unaligned_duplicate_caught_tiled_misses(spark, tmp_path):
    # The shared phrase starts at token 2 in doc 1 and token 5 in
    # doc 2 — neither copy is aligned to an 8-token tile boundary, so
    # the tiled span_dedup_rewrite sees two different block sets and
    # removes nothing; the sliding window catches it.
    rows = [
        (1, f"a b {PHRASE} c d"),
        (2, f"v w x y z {PHRASE} tail"),
    ]
    sf = _corpus(spark, tmp_path, rows)
    tiled = {
        r["doc_id"]: r["n_removed"]
        for r in span_dedup_rewrite(spark, sf).collect()
    }
    assert tiled == {1: 0, 2: 0}  # the gap this operator exists to fill
    out = _rewrite(spark, sf)
    assert out[1]["n_removed"] == 0
    assert out[1]["cleaned_text"] == rows[0][1]
    assert out[2]["n_removed"] == 8
    assert out[2]["cleaned_text"] == "v w x y z tail"


def test_keep_first_orders_by_doc_then_pos(spark, tmp_path):
    # Three copies: doc 3 holds the (doc_id, pos)-minimal occurrence,
    # so it survives intact and BOTH later copies are cut.
    rows = [
        (3, f"{PHRASE} x"),
        (4, f"y {PHRASE}"),
        (5, f"{PHRASE}"),
    ]
    out = _rewrite(spark, _corpus(spark, tmp_path, rows))
    assert out[3]["n_removed"] == 0
    assert out[4]["cleaned_text"] == "y"
    assert out[5]["cleaned_text"] == ""
    assert out[5]["n_removed"] == 8


def test_within_doc_overlap_keeps_only_uncovered_prefix(spark, tmp_path):
    # "a"*10: identical grams at pos 0,1,2. Pos 0 survives; pos 1
    # covers idx 1-8, pos 2 covers idx 2-9 → union 1..9, so only the
    # first token remains. Removal is position-based by contract even
    # when a later window overlaps the surviving copy's own tokens.
    rows = [(6, " ".join(["a"] * 10))]
    out = _rewrite(spark, _corpus(spark, tmp_path, rows))
    assert out[6]["n_tokens"] == 10
    assert out[6]["n_removed"] == 9
    assert out[6]["cleaned_text"] == "a"


def test_spans_merge_overlapping_windows(spark, tmp_path):
    # Doc 11 repeats a 9-token passage from doc 10: its two duplicated
    # 8-gram occurrences (pos 1 and 2) overlap and must merge into ONE
    # maximal span of 9 covered tokens — plus an isolated 8-token span
    # later in the doc, so n_spans distinguishes merge from concat.
    nine = f"{PHRASE} p8"
    rows = [
        (10, f"{nine} filler0 filler1 q0 q1 q2 q3 q4 q5 q6 q7"),
        (11, f"z {nine} mid0 mid1 mid2 q0 q1 q2 q3 q4 q5 q6 q7"),
    ]
    d = tmp_path / "docs"
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(
        1
    ).write.parquet(str(d / "documents.parquet"))
    out = {
        r["doc_id"]: r for r in exact_substr_spans(spark, str(d)).collect()
    }
    assert out[10]["n_spans"] == 0 and out[10]["covered_frac"] == 0.0
    assert out[11]["n_spans"] == 2
    assert out[11]["max_span"] == 9  # merged, not two 8s
    assert out[11]["covered_tokens"] == 17
    # the report agrees with what the rewrite would cut
    rw = {
        r["doc_id"]: r["n_removed"]
        for r in exact_substr_rewrite(spark, str(d)).collect()
    }
    assert rw[11] == 17 and rw[10] == 0


def test_exact_substr_plan_gate(spark, sf_smoke):
    """Scale-credibility pins: the whole rewrite is pure JVM (no
    Python eval node), every documents scan is pruned to doc_id+text
    (never lang/source/n_chars), and the keep-first decision is an
    aggregate + join — no row_number window (sort) node over the gram
    stream, so a boilerplate gram with millions of copies skew-lands
    in AQE's join handling instead of a single sort task."""
    import re

    plan = (
        exact_substr_rewrite(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, "expected parquet scans in the plan"
    for s in schemas:
        assert "lang" not in s and "source" not in s and "n_chars" not in s
    assert "row_number" not in plan.lower()


def test_short_docs_and_self_uniqueness_untouched(spark, tmp_path):
    # Sub-window docs produce no grams; a unique long doc is never cut
    # even when it shares a shorter (7-token) prefix with another doc.
    rows = [
        (7, "one two three"),
        (8, "p0 p1 p2 p3 p4 p5 p6 QQ after"),
        (9, "p0 p1 p2 p3 p4 p5 p6 RR other"),
    ]
    out = _rewrite(spark, _corpus(spark, tmp_path, rows))
    for i, text in [(7, rows[0][1]), (8, rows[1][1]), (9, rows[2][1])]:
        assert out[i]["n_removed"] == 0
        assert out[i]["cleaned_text"] == text
