"""Streaming exact-substring dedup ≡ batch exact_substr_rewrite for
doc_id-ordered splits; cross-batch duplicates are cut without corpus
re-scans; replays are idempotent."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from orionld_to_hive_spark.operators.dedup import exact_substr_rewrite
from orionld_to_hive_spark.sources.warehouse import load_table
from orionld_to_hive_spark.streaming.substr import StreamingExactSubstr

PHRASE = "p0 p1 p2 p3 p4 p5 p6 p7"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ordered_splits_equal_batch(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    s = StreamingExactSubstr(str(tmp_path / "sub"))
    bounds = [0, 120, 250, 10**9]
    for i in range(3):
        s.process_batch(
            docs.filter(
                (F.col("doc_id") >= bounds[i])
                & (F.col("doc_id") < bounds[i + 1])
            ),
            batch_id=i,
        )
    assert _rows(s.rewritten(spark)) == _rows(
        exact_substr_rewrite(spark, sf_smoke)
    )
    # and the stream did real cross-batch work on this corpus
    assert (
        s.rewritten(spark).filter(F.col("n_removed") > 0).count() > 0
    )


def test_cross_batch_duplicate_is_cut(spark, tmp_path):
    s = StreamingExactSubstr(str(tmp_path / "sub"))
    s.process_batch(
        spark.createDataFrame(
            [(1, f"a b {PHRASE} c")], ["doc_id", "text"]
        ),
        batch_id=0,
    )
    s.process_batch(
        spark.createDataFrame(
            [(2, f"x {PHRASE} y")], ["doc_id", "text"]
        ),
        batch_id=1,
    )
    out = {r["doc_id"]: r for r in s.rewritten(spark).collect()}
    assert out[1]["n_removed"] == 0  # first occurrence survives
    assert out[2]["n_removed"] == 8
    assert out[2]["cleaned_text"] == "x y"


def test_replayed_batch_is_idempotent(spark, tmp_path):
    s = StreamingExactSubstr(str(tmp_path / "sub"))
    a = spark.createDataFrame([(1, f"a b {PHRASE} c")], ["doc_id", "text"])
    b = spark.createDataFrame([(2, f"x {PHRASE} y")], ["doc_id", "text"])
    s.process_batch(a, batch_id=0)
    s.process_batch(b, batch_id=1)
    before = _rows(s.rewritten(spark))
    before_grams = _rows(spark.read.parquet(str(tmp_path / "sub/grams")))
    # checkpoint replay: the state read filters batch_id < 1, so the
    # replay never sees its own previous write and overwrites itself
    s.process_batch(b, batch_id=1)
    assert _rows(s.rewritten(spark)) == before
    assert _rows(spark.read.parquet(str(tmp_path / "sub/grams"))) == (
        before_grams
    )


def test_live_ordered_stream_equals_batch(spark, sf_smoke, tmp_path):
    """Real readStream run: one file per doc_id-ordered chunk with
    ascending mtimes (FileStreamSource orders by timestamp) +
    maxFilesPerTrigger=1 → the ordered-split contract holds end to
    end through foreachBatch."""
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    bounds = [0, 100, 200, 300, 10**9]
    for i in range(4):
        chunk_dir = str(tmp_path / f"chunk{i}")
        docs.filter(
            (F.col("doc_id") >= bounds[i]) & (F.col("doc_id") < bounds[i + 1])
        ).coalesce(1).write.parquet(chunk_dir)
        (part,) = glob.glob(f"{chunk_dir}/part-*.parquet")
        dest = str(in_dir / f"{i:03d}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (1_700_000_000 + i, 1_700_000_000 + i))

    s = StreamingExactSubstr(str(tmp_path / "sub"))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(in_dir))
    )
    q = s.start(stream, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    n_batches = (
        spark.read.parquet(str(tmp_path / "sub/out"))
        .select("batch_id").distinct().count()
    )
    assert n_batches == 4
    assert _rows(s.rewritten(spark)) == _rows(
        exact_substr_rewrite(spark, sf_smoke)
    )


def test_rewritten_before_any_batch_names_bootstrap_step(spark, tmp_path):
    s = StreamingExactSubstr(str(tmp_path / "none"))
    with pytest.raises(RuntimeError, match="process_batch"):
        s.rewritten(spark)
