"""Unit tests for the round-2 operator additions: the shuffle-free
repetition fold, OHLC tie-breaking, vocabulary boundary ties, and the
z-score screen's degenerate-group behavior. These pin the hand-rolled
logic the oracle sweep exercises only on well-behaved synthetic data.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from orionld_to_hive_spark.operators.analytics import zscore_outlier_events
from orionld_to_hive_spark.operators.temporal import ohlc_bars_hourly
from orionld_to_hive_spark.operators.text import (
    doc_repetition_report,
    gopher_quality_report,
    vocab_coverage_report,
)


def _with_docs(spark, tmp_path, rows):
    """Write a tiny documents.parquet into tmp_path and return its dir."""
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_doc_repetition_run_length_fold(spark, tmp_path):
    # "a a a b": 2-grams = [a a, a a, a b] → n=3, distinct=2,
    # dup_frac=1/3, top gram "a a" ×2 → top_frac=2/3.
    # "x y": one gram → no duplication. Single-token doc is dropped.
    sf = _with_docs(
        spark,
        tmp_path,
        [
            (1, "a a a b", "en", "s", 7),
            (2, "x y", "en", "s", 3),
            (3, "solo", "en", "s", 4),
        ],
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in doc_repetition_report(spark, sf).collect()
    }
    assert set(got) == {1, 2}
    assert got[1]["n_2grams"] == 3
    assert got[1]["dup_2gram_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert got[1]["top_2gram_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert got[2]["n_2grams"] == 1
    assert got[2]["dup_2gram_frac"] == 0.0
    assert got[2]["top_2gram_frac"] == 1.0


def test_ohlc_open_close_tie_broken_by_event_id(spark, tmp_path):
    # Same hour, same ts for rows 2/3: open = lowest (ts, event_id),
    # close = highest (ts, event_id) — NOT min/max of value.
    t0 = datetime(2024, 1, 1, 9, 15)
    rows = [
        (1, t0, 1, "click", 50.0, "{}"),
        (2, datetime(2024, 1, 1, 9, 30), 1, "click", 10.0, "{}"),
        (3, datetime(2024, 1, 1, 9, 30), 1, "click", 99.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING,"
        " value DOUBLE, props STRING",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    [bar] = ohlc_bars_hourly(spark, str(tmp_path)).collect()
    assert bar["open"] == 50.0
    assert bar["close"] == 99.0  # event_id 3 wins the ts tie
    assert bar["high"] == 99.0 and bar["low"] == 10.0
    assert bar["volume"] == 3


def test_vocab_coverage_full_and_oov(spark, tmp_path, monkeypatch):
    import orionld_to_hive_spark.operators.text as text_mod

    monkeypatch.setattr(text_mod, "VOCAB_SIZE", 2)
    # Corpus counts: "a"×3, "b"×2, "c"×1 → vocab {a, b}; doc 2 has one
    # OOV token ("c") out of three.
    sf = _with_docs(
        spark,
        tmp_path,
        [(1, "a a b", "en", "s", 5), (2, "a b c", "en", "s", 5)],
    )
    got = {r["doc_id"]: r.asDict() for r in vocab_coverage_report(spark, sf).collect()}
    assert got[1]["n_in_vocab"] == 3 and got[1]["oov_rate"] == 0.0
    assert got[2]["n_in_vocab"] == 2
    assert got[2]["oov_rate"] == pytest.approx(1 / 3, abs=1e-6)


def test_gopher_keep_boundaries(spark, tmp_path):
    # 19 words → fails the min-word bound even with perfect other stats;
    # 20 words of 4 chars → passes every rule.
    long_ok = " ".join(["word"] * 20)
    short = " ".join(["word"] * 19)
    sf = _with_docs(
        spark,
        tmp_path,
        [(1, long_ok, "en", "s", len(long_ok)), (2, short, "en", "s", len(short))],
    )
    got = {r["doc_id"]: r["gopher_keep"] for r in gopher_quality_report(spark, sf).collect()}
    assert got[1] is True
    assert got[2] is False


def test_zscore_outliers_flag_only_extremes(spark, sf_smoke):
    out = zscore_outlier_events(spark, sf_smoke)
    rows = out.collect()
    assert len(rows) > 0
    assert all(abs(r["zscore"]) > 2.5 for r in rows)
    # screen must not flag a meaningful share of the corpus
    total = spark.read.parquet(f"{sf_smoke}/events.parquet").count()
    assert len(rows) < 0.05 * total
