"""Space-saving heavy-hitters operator: exactness when capacity covers
the distinct set (stream ≡ batch ≡ true counts), the space-saving
guarantee (est - err <= true <= est) and bounded state under eviction,
and state carry across micro-batches.
"""

from __future__ import annotations

from collections import Counter
from datetime import datetime, timedelta

from orionld_to_hive_spark.streaming.heavyhitters import (
    HH_CAPACITY,
    heavyhitters_batch,
    heavyhitters_stream,
)

BASE = datetime(2024, 1, 1)

# (key, ts_off, item): key "a" has 3 distinct items (< capacity, exact);
# key "b" cycles through 12 distinct items (> capacity=8, evictions).
EVENTS = (
    [("a", i, 100) for i in range(6)]
    + [("a", i + 6, 200) for i in range(3)]
    + [("a", 9, 300)]
    + [("b", i, 1000 + (i % 12)) for i in range(40)]
    + [("b", 40 + i, 1001) for i in range(10)]  # make 1001 a true heavy hitter
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, BASE + timedelta(seconds=s), s, it) for k, s, it in rows],
        "key STRING, ts TIMESTAMP, off LONG, item LONG",
    )


def test_batch_exact_when_capacity_sufficient(spark):
    got = {
        (r.key, r.item): (r.est_count, r.max_err)
        for r in heavyhitters_batch(_df(spark, EVENTS), "key", "item", "ts").collect()
        if r.key == "a"
    }
    assert got == {
        ("a", 100): (6, 0),
        ("a", 200): (3, 0),
        ("a", 300): (1, 0),
    }


def test_batch_guarantee_and_bounded_state_under_eviction(spark):
    rows = [
        r
        for r in heavyhitters_batch(_df(spark, EVENTS), "key", "item", "ts").collect()
        if r.key == "b"
    ]
    assert len(rows) <= HH_CAPACITY  # state never exceeds capacity
    true = Counter(it for k, _, it in EVENTS if k == "b")
    n = sum(true.values())
    for r in rows:
        assert r.est_count - r.max_err <= true[r.item] <= r.est_count
    # any item with true count > N/capacity must be present
    must_have = {it for it, c in true.items() if c > n / HH_CAPACITY}
    assert must_have <= {r.item for r in rows}
    # the planted heavy hitter tops the sketch
    assert max(rows, key=lambda r: r.est_count).item == 1001


def test_stream_state_equals_batch_on_concatenation(spark, tmp_path):
    d = tmp_path / "hh_in"
    d.mkdir()
    batch1 = [e for e in EVENTS if e[1] <= 20]
    batch2 = [e for e in EVENTS if e[1] > 20]
    for i, batch in enumerate([batch1, batch2]):
        _df(spark, batch).coalesce(1).write.parquet(str(d / f"b{i}"))

    src = (
        spark.readStream.schema(_df(spark, batch1).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "b*"))
    )
    q = (
        heavyhitters_stream(src, "key", "item", "ts")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("hh_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_hh"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # the memory sink in update mode appends each batch's emission;
    # keep only the LAST emission per (key, item)
    streamed_rows = spark.sql(
        "SELECT * FROM hh_out"
    ).collect()
    # batch 2's emission supersedes batch 1's: reconstruct final state
    # by taking max est_count per (key, item) — counts only grow
    final = {}
    for r in streamed_rows:
        cur = final.get((r.key, r.item))
        if cur is None or r.est_count > cur[0]:
            final[(r.key, r.item)] = (r.est_count, r.max_err)
    batch = {
        (r.key, r.item): (r.est_count, r.max_err)
        for r in heavyhitters_batch(_df(spark, EVENTS), "key", "item", "ts").collect()
    }
    # every counter surviving in the batch twin must match the stream's
    # final estimate exactly (same fold, same arrival order)
    for k, v in batch.items():
        assert final.get(k) == v, (k, final.get(k), v)
