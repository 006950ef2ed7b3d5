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
