"""Streaming frontier ≡ batch schedule.

The contract streaming/frontier.py promises: after any sequence of
micro-batches (including replays and re-deliveries), the maintained
schedule is row-identical to the batch crawl_frontier_schedule over
the latest set of delivered docs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from orionld_to_hive_spark.operators.frontier import (
    discovered_allowed_urls,
    rank_schedule,
)
from orionld_to_hive_spark.sources.warehouse import load_table
from orionld_to_hive_spark.streaming.frontier import StreamingFrontier


def _docs(spark, sf_smoke, limit=150):
    return (
        load_table(spark, sf_smoke, "documents")
        .select("doc_id")
        .orderBy("doc_id")
        .limit(limit)
    )


def _feed_stream(spark, docs, tmp_path, n_files=3):
    in_dir = str(tmp_path / "in")
    docs.repartition(n_files).write.parquet(in_dir)
    return (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )


def _key(rows):
    return sorted(tuple(r) for r in rows)


def test_stream_schedule_equals_batch(spark, sf_smoke, tmp_path):
    docs = _docs(spark, sf_smoke)
    fr = StreamingFrontier(str(tmp_path / "store"))
    q = fr.start(
        _feed_stream(spark, docs, tmp_path),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    n_batches = (
        spark.read.parquet(str(tmp_path / "store" / "urls"))
        .select("batch_id")
        .distinct()
        .count()
    )
    assert n_batches > 1  # the cross-batch claim needs >1 micro-batch
    got = _key(fr.schedule(spark).collect())
    want = _key(rank_schedule(discovered_allowed_urls(docs)).collect())
    assert got == want


def test_replayed_batch_is_idempotent(spark, sf_smoke, tmp_path):
    docs = _docs(spark, sf_smoke, limit=60)
    fr = StreamingFrontier(str(tmp_path / "store"))
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    fr.write_batch(half_a, 0)
    fr.write_batch(half_b, 1)
    # checkpoint replay: batch 1 re-delivered with the same id
    fr.write_batch(half_b, 1)
    got = _key(fr.schedule(spark).collect())
    want = _key(rank_schedule(discovered_allowed_urls(docs)).collect())
    assert got == want


def test_redelivered_doc_supersedes(spark, sf_smoke, tmp_path):
    docs = _docs(spark, sf_smoke, limit=60)
    fr = StreamingFrontier(str(tmp_path / "store"))
    fr.write_batch(docs, 0)
    # a subset re-delivered in a later batch: discovery reruns for it
    # (deterministic fixture → same rows) and must not duplicate
    some = docs.filter(F.col("doc_id") % 3 == 0)
    fr.write_batch(some, 1)
    got = _key(fr.schedule(spark).collect())
    want = _key(rank_schedule(discovered_allowed_urls(docs)).collect())
    assert got == want
