"""Streaming shard audit ≡ batch walk.

The contract streaming/shards.py promises: after any sequence of
micro-batches (including replays and re-deliveries), the maintained
manifest is row-identical to running the batch walker over the latest
version of every shard in one pass.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orionld_to_hive_spark.operators.tar import encode_webdataset_longkey
from orionld_to_hive_spark.operators.warc import encode_warc
from orionld_to_hive_spark.operators.zip import encode_zip_sample
from orionld_to_hive_spark.operators.zstd import encode_zstd
from orionld_to_hive_spark.sources.warehouse import load_table
from orionld_to_hive_spark.streaming.shards import (
    StreamingShardAudit,
    audit_frame,
)


def _assets(spark, sf_smoke, kind, limit=120):
    docs = (
        load_table(spark, sf_smoke, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(limit)
        .collect()
    )
    enc = {
        "webdataset": encode_webdataset_longkey,
        "warc": encode_warc,
        "zip": encode_zip_sample,
        "zstd": encode_zstd,
    }[kind]
    rows = [
        (int(r["doc_id"]), bytearray(enc(int(r["doc_id"]),
                                         (r["text"] or "").encode("utf-8"))))
        for r in docs
    ]
    return spark.createDataFrame(rows, "asset_id LONG, payload BINARY")


def _feed_stream(spark, assets, tmp_path, n_files=3):
    in_dir = str(tmp_path / "in")
    assets.repartition(n_files).write.parquet(in_dir)
    return (
        spark.readStream.schema(assets.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )


def _key(rows):
    return sorted(tuple(r) for r in rows)


@pytest.mark.parametrize("kind", ["webdataset", "warc", "zip", "zstd"])
def test_stream_manifest_equals_batch_walk(spark, sf_smoke, tmp_path, kind):
    assets = _assets(spark, sf_smoke, kind)
    aud = StreamingShardAudit(str(tmp_path / "store"), kind=kind)
    q = aud.start(
        _feed_stream(spark, assets, tmp_path),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    n_batches = (
        spark.read.parquet(str(tmp_path / "store" / "manifest"))
        .select("batch_id")
        .distinct()
        .count()
    )
    assert n_batches > 1  # the cross-batch claim needs >1 micro-batch
    got = _key(aud.manifest(spark).collect())
    want = _key(audit_frame(assets, kind).collect())
    assert got == want


def test_replayed_batch_is_idempotent(spark, sf_smoke, tmp_path):
    assets = _assets(spark, sf_smoke, "webdataset", limit=40)
    aud = StreamingShardAudit(str(tmp_path / "store"))
    aud.write_batch(assets, batch_id=0)
    before = _key(aud.manifest(spark).collect())
    aud.write_batch(assets, batch_id=0)  # checkpoint replay after crash
    after = _key(aud.manifest(spark).collect())
    assert before == after


def test_redelivered_shard_supersedes(spark, sf_smoke, tmp_path):
    assets = _assets(spark, sf_smoke, "webdataset", limit=30)
    aud = StreamingShardAudit(str(tmp_path / "store"))
    aud.write_batch(assets, batch_id=0)
    # shard 7 re-uploaded with different content (longer text)
    new7 = spark.createDataFrame(
        [(7, bytearray(encode_webdataset_longkey(7, b"re-uploaded " * 60)))],
        "asset_id LONG, payload BINARY",
    )
    aud.write_batch(new7, batch_id=1)
    man = {r["asset_id"]: r for r in aud.manifest(spark).collect()}
    assert man[7]["txt_bytes"] == len(b"re-uploaded " * 60)
    assert len(man) == 30  # still one row per shard
    # every other shard's row is the original
    want = {
        r["asset_id"]: r
        for r in audit_frame(assets, "webdataset").collect()
    }
    for aid, row in man.items():
        if aid != 7:
            assert tuple(row) == tuple(want[aid])


def test_unknown_kind_refused(tmp_path):
    with pytest.raises(ValueError, match="unknown shard kind"):
        StreamingShardAudit(str(tmp_path), kind="7z")
