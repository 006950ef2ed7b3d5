"""Concurrency contracts: MERGE single-writer lock, snapshot write races
(VERDICT r5 item 8 — explicit failure modes instead of silent corruption)."""

from __future__ import annotations

import os
import threading
import time

import pytest
from pyspark.sql import functions as F

from orionld_to_hive_spark.sources.merge import (
    ConcurrentMergeError,
    _LOCK_NAME,
    merge_upsert,
)
from orionld_to_hive_spark.sources import snapshots


def _seed(spark, path: str) -> None:
    spark.createDataFrame(
        [(1, "a", 1, 10.0), (2, "a", 1, 20.0), (3, "b", 1, 30.0)],
        "id int, part string, v int, x double",
    ).write.partitionBy("part").parquet(path)


def _updates(spark, rows):
    return spark.createDataFrame(rows, "id int, part string, v int, x double")


def test_merge_refuses_while_lock_held(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    lock = os.path.join(path, _LOCK_NAME)
    open(lock, "w").close()
    with pytest.raises(ConcurrentMergeError):
        merge_upsert(
            path,
            _updates(spark, [(1, "a", 2, 11.0)]),
            ("id",),
            "v",
            ("part",),
        )
    os.remove(lock)
    # with the lock gone the same merge goes through and releases again
    assert merge_upsert(
        path, _updates(spark, [(1, "a", 2, 11.0)]), ("id",), "v", ("part",)
    ) == 1
    assert not os.path.exists(lock)


def test_merge_releases_lock_after_failure(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    # partition-unstable update fails INSIDE the critical section
    with pytest.raises(ValueError):
        merge_upsert(
            path,
            _updates(spark, [(3, "a", 2, 31.0)]),  # id=3 lives in part=b
            ("id",),
            "v",
            ("part",),
            check_partition_stability=True,
        )
    assert not os.path.exists(os.path.join(path, _LOCK_NAME))
    # table is intact and mergeable afterwards
    assert merge_upsert(
        path, _updates(spark, [(2, "a", 2, 21.0)]), ("id",), "v", ("part",)
    ) == 1


def test_merge_breaks_stale_lock(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    lock = os.path.join(path, _LOCK_NAME)
    open(lock, "w").close()
    old = time.time() - 3600
    os.utime(lock, (old, old))
    assert merge_upsert(
        path,
        _updates(spark, [(1, "a", 2, 11.0)]),
        ("id",),
        "v",
        ("part",),
        break_stale_lock_s=60.0,
    ) == 1
    assert not os.path.exists(lock)


def test_merge_two_interleaved_writers_never_lose_updates(spark, tmp_path):
    """Race two merges; the lock serializes or rejects — either way the
    final table contains every update that reported success."""
    path = str(tmp_path / "t")
    _seed(spark, path)
    barrier = threading.Barrier(2)
    results: dict[str, object] = {}

    def writer(tag: str, rows):
        def run():
            barrier.wait()
            try:
                merge_upsert(path, _updates(spark, rows), ("id",), "v", ("part",))
                results[tag] = "ok"
            except ConcurrentMergeError:
                results[tag] = "locked"

        return run

    t1 = threading.Thread(target=writer("w1", [(1, "a", 2, 111.0)]))
    t2 = threading.Thread(target=writer("w2", [(2, "a", 2, 222.0)]))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert set(results.values()) <= {"ok", "locked"}
    assert "ok" in results.values()  # at least one side made progress
    # retry any rejected writer — the lock must be free now
    if results["w1"] == "locked":
        merge_upsert(path, _updates(spark, [(1, "a", 2, 111.0)]), ("id",), "v", ("part",))
    if results["w2"] == "locked":
        merge_upsert(path, _updates(spark, [(2, "a", 2, 222.0)]), ("id",), "v", ("part",))
    final = {
        r.id: r.x for r in spark.read.parquet(path).filter(F.col("v") == 2).collect()
    }
    assert final == {1: 111.0, 2: 222.0}
    assert not os.path.exists(os.path.join(path, _LOCK_NAME))


def test_snapshot_race_fails_loudly_never_corrupts(spark, tmp_path):
    base = str(tmp_path / "snap")
    df1 = spark.range(10).withColumn("tag", F.lit("one"))
    df2 = spark.range(20).withColumn("tag", F.lit("two"))
    snapshots.write_snapshot(df1, base)  # v0 committed
    barrier = threading.Barrier(2)
    outcomes: list[str] = []

    def racer(df):
        def run():
            barrier.wait()
            try:
                snapshots.write_snapshot(df, base)
                outcomes.append("ok")
            except Exception:
                outcomes.append("err")

        return run

    t1 = threading.Thread(target=racer(df1))
    t2 = threading.Thread(target=racer(df2))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert "ok" in outcomes  # at least one commit landed
    # the pointer must reference a COMPLETE snapshot readable end-to-end
    v = snapshots.latest_version(base)
    got = snapshots.read_snapshot(spark, base, v).count()
    assert got in (10, 20)
    # every committed version stays fully readable (no partial dirs
    # behind the pointer)
    for ver in snapshots.list_versions(base):
        if ver <= v:
            snapshots.read_snapshot(spark, base, ver).count()
