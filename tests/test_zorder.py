"""Z-order clustering: files must bound BOTH dimensions, unlike a
single-column sort which bounds only its own."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from orionld_to_hive_spark.sources.warehouse import load_table
from orionld_to_hive_spark.sources.zorder import (
    _partition_tokens,
    _zkey_cutpoints,
    with_zorder_key,
    zorder_write,
)

N_FILES = 8


def test_cutpoints_deterministic_and_sorted(spark, sf_oracle):
    """The histogram-derived cut points are bit-identical across calls
    (the flaky-layout fix) and strictly increasing."""
    ev = load_table(spark, sf_oracle, "events").select(
        F.unix_micros("ts").alias("t_us"), "user_id"
    )
    keyed = with_zorder_key(ev, "t_us", "user_id", bits=16)
    a = _zkey_cutpoints(keyed, N_FILES, bits=16)
    b = _zkey_cutpoints(keyed, N_FILES, bits=16)
    assert a == b
    assert a == sorted(set(a))
    assert 1 <= len(a) <= N_FILES - 1


def test_partition_tokens_land_on_their_partition(spark):
    """Token t_p must hash (Spark murmur3, pmod n) to partition p."""
    for n in (1, 2, 8, 13):
        toks = _partition_tokens(spark, n)
        assert len(toks) == n
        got = (
            spark.createDataFrame([(t,) for t in toks], "c int")
            .select(F.pmod(F.hash("c"), F.lit(n)).alias("p"))
            .collect()
        )
        assert sorted(r.p for r in got) == list(range(n))


def _mean_file_span(spark, path: str, col: str) -> float:
    """Mean (max-min) of `col` per data file, normalized by the global
    span — 1.0 means every file covers the whole domain (no skipping),
    small means tight per-file bounds (good skipping)."""
    spans = []
    glo = gho = None
    for f in sorted(glob.glob(path + "/*.parquet")):
        lo, hi = spark.read.parquet(f).agg(F.min(col), F.max(col)).collect()[0]
        spans.append((lo, hi))
        glo = lo if glo is None else min(glo, lo)
        gho = hi if gho is None else max(gho, hi)
    width = float(gho - glo) or 1.0
    return sum(float(hi - lo) for lo, hi in spans) / len(spans) / width


def test_zorder_bounds_both_dimensions(spark, tmp_path):
    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", F.unix_micros("ts").alias("t_us"), "user_id", "value"
    )
    z_path = str(tmp_path / "events_z")
    ts_path = str(tmp_path / "events_ts")
    zorder_write(ev, z_path, "t_us", "user_id", N_FILES)
    # baseline: classic single-column time clustering
    (
        ev.repartitionByRange(N_FILES, "t_us")
        .sortWithinPartitions("t_us")
        .write.mode("overwrite")
        .parquet(ts_path)
    )

    # same rows survive the rewrite
    assert sorted(r.event_id for r in spark.read.parquet(z_path).collect()) == sorted(
        r.event_id for r in ev.collect()
    )

    ts_user_span = _mean_file_span(spark, ts_path, "user_id")
    z_user_span = _mean_file_span(spark, z_path, "user_id")
    z_time_span = _mean_file_span(spark, z_path, "t_us")
    # time-sorted files see the FULL user range; z-ordered files must
    # bound user_id materially while still bounding time
    assert ts_user_span > 0.9, ts_user_span
    assert z_user_span < 0.6, z_user_span
    assert z_time_span < 0.6, z_time_span
