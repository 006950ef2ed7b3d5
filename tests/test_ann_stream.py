"""Streaming LSH index maintenance ≡ batch bucketing.

The contract streaming/ann.py promises: after any sequence of
micro-batches (including a replayed one), the maintained bucket table
is row-identical to band-keying the full corpus in one batch pass, and
probing the maintained index returns the same top-k as running the
candidates-then-verify query over the batch-built index.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orionld_to_hive_spark.operators.similarity import _emb
from orionld_to_hive_spark.streaming.ann import StreamingLshIndex, band_keys


@pytest.fixture()
def corpus(spark, sf_smoke):
    return _emb(spark, sf_smoke).select("vec_id", "vec").orderBy("vec_id")


def _feed_stream(spark, corpus, tmp_path, n_files=3):
    """Write the corpus as n_files parquet files and stream them back
    one file per micro-batch."""
    in_dir = str(tmp_path / "in")
    corpus.repartition(n_files).write.parquet(in_dir)
    return (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )


def test_stream_maintained_buckets_equal_batch_buckets(
    spark, sf_smoke, corpus, tmp_path
):
    idx = StreamingLshIndex(str(tmp_path / "idx"))
    q = idx.start(
        _feed_stream(spark, corpus, tmp_path),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    # >1 micro-batch actually ran (the cross-batch claim needs that)
    n_batches = (
        spark.read.parquet(str(tmp_path / "idx" / "bands"))
        .select("batch_id")
        .distinct()
        .count()
    )
    assert n_batches > 1
    got = sorted(
        (r.vec_id, r.bk) for r in idx.bands(spark).collect()
    )
    want = sorted((r.vec_id, r.bk) for r in band_keys(corpus).collect())
    assert got == want
    # vector store is complete and uncorrupted
    assert idx.vectors(spark).count() == corpus.count()


def test_replayed_batch_is_idempotent(spark, corpus, tmp_path):
    idx = StreamingLshIndex(str(tmp_path / "idx"))
    chunk = corpus.limit(50)
    idx.write_batch(chunk, batch_id=0)
    before = sorted((r.vec_id, r.bk) for r in idx.bands(spark).collect())
    idx.write_batch(chunk, batch_id=0)  # checkpoint replay after crash
    after = sorted((r.vec_id, r.bk) for r in idx.bands(spark).collect())
    assert before == after  # no duplication


def test_probe_over_maintained_index_matches_batch_lsh(
    spark, sf_smoke, corpus, tmp_path
):
    idx = StreamingLshIndex(str(tmp_path / "idx"))
    q = idx.start(
        _feed_stream(spark, corpus, tmp_path),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qv")
    )
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos)
        for r in idx.query_topk(spark, queries, k=5).collect()
    }
    # batch reference: identical candidates-then-verify over the same
    # bucket function applied to the full corpus in one pass
    from pyspark.sql.window import Window

    from orionld_to_hive_spark.functions.vectors import cosine

    bk = band_keys(corpus)
    qk = band_keys(
        queries.select(F.col("query_id").alias("vec_id"), F.col("qv").alias("vec"))
    ).select(F.col("vec_id").alias("query_id"), "bk")
    cand = (
        qk.join(bk, "bk")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    scored = (
        cand.join(queries, "query_id")
        .join(
            corpus.select(
                F.col("vec_id").alias("neighbor_id"), F.col("vec").alias("nv")
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos)
        for r in scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .collect()
    }
    assert got == want and len(got) == 25


def test_redelivered_vector_supersedes_instead_of_duplicating(
    spark, corpus, tmp_path
):
    """A vec_id re-delivered under a LATER batch_id (offset reset,
    backfill, updated embedding) must supersede its old version:
    vectors()/bands() return one version, top-k never ranks the same
    neighbor twice, and the NEW embedding is the one scored."""
    idx = StreamingLshIndex(str(tmp_path / "idx"))
    rows = corpus.limit(6).collect()
    first = spark.createDataFrame(rows, corpus.schema)
    idx.write_batch(first, batch_id=0)
    # redeliver vec 0 with an UPDATED embedding in a later batch
    updated = spark.createDataFrame(
        [(rows[0].vec_id, [float(-x) for x in rows[0].vec])],
        corpus.schema,
    )
    idx.write_batch(updated, batch_id=1)

    vecs = idx.vectors(spark).filter(F.col("vec_id") == rows[0].vec_id)
    got = vecs.collect()
    assert len(got) == 1  # superseded, not duplicated
    assert got[0].vec[0] == -float(rows[0].vec[0])  # the NEW version
    # band rows of the stale version are gone too: every banded vec_id
    # appears with exactly one batch's worth of band keys
    from orionld_to_hive_spark.streaming.ann import band_keys as bk

    n_bands_per_vec = bk(updated).count()
    assert (
        idx.bands(spark).filter(F.col("vec_id") == rows[0].vec_id).count()
        == n_bands_per_vec
    )
    # and top-k never shows one neighbor at two ranks
    queries = spark.createDataFrame(
        [(999, rows[1].vec)], "query_id LONG, qv ARRAY<DOUBLE>"
    )
    topk = idx.query_topk(spark, queries, k=5).collect()
    neighbors = [r.neighbor_id for r in topk]
    assert len(neighbors) == len(set(neighbors))
