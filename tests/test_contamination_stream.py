"""Streaming contamination screen ≡ batch contamination_screen.

"Eval gram g appears somewhere in the corpus" is an existence
predicate, so any micro-batch split of the training corpus must yield
the identical report; set-union merging makes replays and duplicate
deliveries no-ops by algebra."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orionld_to_hive_spark.operators.text import (
    EVAL_SOURCES,
    _docs,
    contamination_screen,
)
from orionld_to_hive_spark.streaming.contamination import (
    StreamingContaminationScreen,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _sides(spark, sf_smoke):
    docs = _docs(spark, sf_smoke).select("doc_id", "source", "text")
    is_eval = F.col("source").isin(*EVAL_SOURCES)
    return docs.filter(is_eval), docs.filter(~is_eval)


def test_stream_report_equals_batch_for_any_split(
    spark, sf_smoke, tmp_path
):
    eval_docs, train_docs = _sides(spark, sf_smoke)
    scr = StreamingContaminationScreen(str(tmp_path / "scr"))
    scr.bootstrap_eval(eval_docs)

    in_dir = str(tmp_path / "in")
    train_docs.repartition(4).write.parquet(in_dir)
    stream = (
        spark.readStream.schema(train_docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = scr.start(stream, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    n_batches = (
        spark.read.parquet(str(tmp_path / "scr" / "hits"))
        .select("batch_id").distinct().count()
    )
    assert n_batches > 1
    assert _rows(scr.report(spark)) == _rows(
        contamination_screen(spark, sf_smoke)
    )


def test_replay_and_duplicate_delivery_are_noops(
    spark, sf_smoke, tmp_path
):
    eval_docs, train_docs = _sides(spark, sf_smoke)
    scr = StreamingContaminationScreen(str(tmp_path / "scr"))
    scr.bootstrap_eval(eval_docs)
    chunk = train_docs.limit(80)
    scr.screen_batch(chunk, batch_id=0)
    before = _rows(scr.report(spark))
    scr.screen_batch(chunk, batch_id=0)  # checkpoint replay
    assert _rows(scr.report(spark)) == before
    scr.screen_batch(chunk, batch_id=1)  # same docs delivered again
    assert _rows(scr.report(spark)) == before  # set union — no inflation


def test_report_before_any_batch_is_all_zero_and_guards(
    spark, sf_smoke, tmp_path
):
    eval_docs, _ = _sides(spark, sf_smoke)
    scr = StreamingContaminationScreen(str(tmp_path / "scr"))
    with pytest.raises(RuntimeError, match="bootstrap_eval"):
        scr.report(spark)
    with pytest.raises(RuntimeError, match="bootstrap_eval"):
        scr.screen_batch(eval_docs, batch_id=0)
    scr.bootstrap_eval(eval_docs)
    rep = scr.report(spark)
    assert rep.count() == eval_docs.count()
    assert rep.filter(F.col("n_hit") != 0).count() == 0


def test_short_eval_doc_keeps_zero_gram_row(spark, tmp_path):
    """r9 review: an eval doc too short to shingle must still own an
    n_grams=0 row (the batch twin's size(array_distinct) semantics),
    not silently vanish from the report."""
    eval_docs = spark.createDataFrame(
        [
            (1, "alpha bravo charlie delta echo foxtrot"),
            (2, "too short"),
        ],
        ["doc_id", "text"],
    )
    scr = StreamingContaminationScreen(str(tmp_path / "scr"))
    scr.bootstrap_eval(eval_docs)
    scr.screen_batch(
        spark.createDataFrame(
            [(10, "alpha bravo charlie delta echo leak")],
            ["doc_id", "text"],
        ),
        batch_id=0,
    )
    rep = {r["doc_id"]: r for r in scr.report(spark).collect()}
    assert set(rep) == {1, 2}
    assert rep[2]["n_grams"] == 0 and rep[2]["n_hit"] == 0
    assert rep[2]["contamination_rate"] is None  # 0/0, like the twin
    assert rep[1]["n_hit"] >= 1


def test_rebootstrap_drops_stale_hits(spark, tmp_path):
    """r9 review: after an eval-set re-bootstrap, accumulated hit
    pairs whose grams left the eval set must stop matching — the
    documented update contract — instead of inflating n_hit (or
    pushing the rate past 1.0 when the new text is shorter)."""
    scr = StreamingContaminationScreen(str(tmp_path / "scr"))
    scr.bootstrap_eval(
        spark.createDataFrame(
            [(1, "one two three four five six")], ["doc_id", "text"]
        )
    )
    scr.screen_batch(
        spark.createDataFrame(
            [(10, "one two three four five six")], ["doc_id", "text"]
        ),
        batch_id=0,
    )
    assert scr.report(spark).collect()[0]["n_hit"] == 2
    # re-bootstrap doc 1 with entirely different text, none in corpus
    scr.bootstrap_eval(
        spark.createDataFrame(
            [(1, "seven eight nine ten eleven twelve")],
            ["doc_id", "text"],
        )
    )
    row = scr.report(spark).collect()[0]
    assert row["n_hit"] == 0
    assert row["contamination_rate"] == 0.0
