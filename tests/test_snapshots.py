"""Units for snapshot-versioned writes (time travel + pointer commit)."""

from __future__ import annotations

import os

from orionld_to_hive_spark.sources.snapshots import (
    latest_version,
    list_versions,
    read_snapshot,
    vacuum,
    write_snapshot,
)


def test_snapshot_versions_and_time_travel(spark, tmp_path):
    base = str(tmp_path / "snaps")
    v0 = write_snapshot(spark.range(3), base)
    v1 = write_snapshot(spark.range(5), base)
    assert (v0, v1) == (0, 1)
    assert latest_version(base) == 1
    assert read_snapshot(spark, base).count() == 5          # latest
    assert read_snapshot(spark, base, 0).count() == 3       # time travel


def test_uncommitted_directory_is_invisible_to_readers(spark, tmp_path):
    base = str(tmp_path / "snaps")
    write_snapshot(spark.range(3), base)
    # simulate a crash mid-write: data directory exists, pointer not flipped
    spark.range(9).write.parquet(os.path.join(base, "v=0001"))
    assert latest_version(base) == 0
    assert read_snapshot(spark, base).count() == 3
    # the next successful write skips past the orphan version
    v = write_snapshot(spark.range(7), base)
    assert v == 2 and read_snapshot(spark, base).count() == 7


def test_vacuum_keeps_latest_and_tail(spark, tmp_path):
    base = str(tmp_path / "snaps")
    for n in (1, 2, 3, 4):
        write_snapshot(spark.range(n), base)
    removed = vacuum(base, keep_last=2)
    assert removed == [0, 1]
    assert list_versions(base) == [2, 3]
    assert read_snapshot(spark, base).count() == 4


def test_snapshot_diff_reports_added_and_removed(spark, tmp_path):
    from orionld_to_hive_spark.sources.snapshots import snapshot_diff

    base = str(tmp_path / "snaps")
    write_snapshot(spark.range(0, 5), base)      # ids 0..4
    write_snapshot(spark.range(2, 8), base)      # ids 2..7
    diff = {(r.id, r.change) for r in snapshot_diff(spark, base, 0, 1, "id").collect()}
    assert diff == {(5, "added"), (6, "added"), (7, "added"),
                    (0, "removed"), (1, "removed")}


def test_vacuum_stage_sweep_spares_live_long_write(tmp_path):
    """A stage directory whose TOP mtime is ancient but which holds a
    RECENT task file (a long parquet write in flight) must survive the
    sweep; a stage whose newest file is old is an orphan and goes."""
    import os
    import time

    from orionld_to_hive_spark.sources.snapshots import vacuum

    base = str(tmp_path / "snaps")
    os.makedirs(base)
    old = time.time() - 7200
    live = os.path.join(base, "_stage-live", "_temporary", "0")
    os.makedirs(live)
    with open(os.path.join(live, "part-0"), "w") as f:
        f.write("x")  # fresh task file: writer is alive
    os.utime(os.path.join(base, "_stage-live"), (old, old))
    orphan = os.path.join(base, "_stage-orphan", "_temporary", "0")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0"), "w") as f:
        f.write("x")
    for root, dirs, files in os.walk(os.path.join(base, "_stage-orphan"),
                                     topdown=False):
        for name in files + dirs:
            os.utime(os.path.join(root, name), (old, old))
    os.utime(os.path.join(base, "_stage-orphan"), (old, old))

    vacuum(base, keep_last=2, stage_ttl_s=3600)
    assert os.path.isdir(os.path.join(base, "_stage-live"))
    assert not os.path.exists(os.path.join(base, "_stage-orphan"))
