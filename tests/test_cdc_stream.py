"""Streaming CDC apply ≡ batch changelog semantics.

The live view after micro-batched merges must equal the
latest-non-delete-per-key state of the whole changelog computed in one
batch pass — regardless of how the changelog is split into triggers
(including splits that deliver a delete BEFORE older upserts) — and
replaying any batch must change nothing (latest-wins is a fixed point
under re-application).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from orionld_to_hive_spark.streaming.cdc import StreamingCdcApplier


def _changelog(spark):
    # 12 keys × up to 4 versions; day partition is stable per key.
    # Keys 0,3,6,9 end in a tombstone (must vanish); key 1 has a
    # mid-history tombstone superseded by a later upsert (must live);
    # key 2 carries a stale sub-maximal tombstone (ignored).
    rows = []
    for k in range(12):
        day = "abc"[k % 3]
        for v in range(1, 4):
            rows.append((k, day, v, float(10 * k + v), False))
        if k % 3 == 0:
            rows.append((k, day, 4, None, True))  # terminal delete
        elif k == 1:
            rows.append((k, day, 2, None, True))  # superseded by v3
        elif k == 2:
            rows.append((k, day, 1, None, True))  # stale duplicate-v1
    return spark.createDataFrame(
        rows,
        "id LONG, day STRING, version LONG, value DOUBLE, deleted BOOLEAN",
    )


def _expected_current(log):
    # no key in the fixture ties at its MAX version, so version alone
    # determines every winner (sub-maximal ties like key 2's stale
    # v1 tombstone never decide anything)
    w = Window.partitionBy("id").orderBy(F.col("version").desc())
    last = (
        log.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .filter("NOT deleted")
    )
    return {r.id: (r.day, r.version, r.value) for r in last.collect()}


def test_streamed_cdc_apply_converges_to_batch_state(spark, tmp_path):
    """Arbitrary split: repartition(5) scatters versions across
    triggers, so deletes routinely arrive before older upserts of the
    same key — persisted tombstones must still converge."""
    log = _changelog(spark)
    in_dir = str(tmp_path / "in")
    log.repartition(5).write.parquet(in_dir)

    applier = StreamingCdcApplier(
        str(tmp_path / "tbl"), ("id",), "version", ("day",), "deleted"
    )
    stream = (
        spark.readStream.schema(log.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = applier.start(stream, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = {
        r.id: (r.day, r.version, r.value)
        for r in applier.read_current(spark).collect()
    }
    assert got == _expected_current(log)
    assert not {0, 3, 6, 9} & set(got)  # terminal tombstones deleted
    assert got[1][1] == 3  # superseded tombstone: key lives at v3
    # deleted keys persist as tombstone rows in the raw table (the
    # resurrection guard), exactly one row per key
    raw = spark.read.parquet(str(tmp_path / "tbl"))
    tombs = raw.filter("deleted").collect()
    assert {r.id for r in tombs} == {0, 3, 6, 9}
    assert raw.groupBy("id").count().filter("count > 1").count() == 0


def test_stale_upserts_cannot_resurrect_deleted_key(spark, tmp_path):
    """The out-of-order hazard pinned directly: a delete applied FIRST,
    then a late batch of pre-delete upserts — the key must stay dead.
    (The first draft applied deletes destructively and failed this.)"""
    schema = (
        "id LONG, day STRING, version LONG, value DOUBLE, deleted BOOLEAN"
    )
    applier = StreamingCdcApplier(
        str(tmp_path / "tbl"), ("id",), "version", ("day",), "deleted"
    )
    applier.apply_batch(
        spark.createDataFrame([(5, "a", 9, None, True)], schema), 0
    )
    applier.apply_batch(
        spark.createDataFrame(
            [(5, "a", 1, 51.0, False), (5, "a", 2, 52.0, False)], schema
        ),
        1,
    )
    assert applier.read_current(spark).filter("id = 5").count() == 0


def test_replayed_cdc_batch_is_fixed_point(spark, tmp_path):
    log = _changelog(spark)
    applier = StreamingCdcApplier(
        str(tmp_path / "tbl"), ("id",), "version", ("day",), "deleted"
    )
    applier.apply_batch(log, batch_id=0)  # bootstrap
    cur = lambda: applier.read_current(spark).select(
        "id", "day", "version", "value"
    )
    state1 = sorted(map(tuple, cur().collect()))
    applier.apply_batch(log, batch_id=0)  # checkpoint replay → merge path
    state2 = sorted(map(tuple, cur().collect()))
    want = sorted(
        (k, d, v, val) for k, (d, v, val) in _expected_current(log).items()
    )
    assert state1 == state2 == want
