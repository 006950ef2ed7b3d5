"""Schema-drift canary: the driver regenerates testdata between rounds
and has already changed physical encodings once (events.ts: INT64
TIMESTAMP(NANOS) in r1 → TIMESTAMP(MICROS) without UTC adjustment in
r2, which Spark reads as TIMESTAMP_NTZ). These assertions fail loudly
at the LOAD layer if an encoding shifts again, instead of surfacing as
dozens of downstream operator errors.
"""

from __future__ import annotations

import pytest

from orionld_to_hive_spark.sources.warehouse import TABLE_NAMES, load_table

# the driver's TPC-H-ish schema (TESTDATA.md) — slimmer than spec TPC-H
EXPECTED_COLS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
    "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"},
    "orders": {
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    },
    "lineitem": {
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_table_loads_with_expected_columns(spark, sf_smoke, name):
    df = load_table(spark, sf_smoke, name)
    assert set(df.columns) >= EXPECTED_COLS[name], (
        f"{name}: missing {EXPECTED_COLS[name] - set(df.columns)}"
    )
    assert df.count() > 0


def test_events_ts_is_normalized_utc_timestamp(spark, sf_smoke):
    # every encoding variant must normalize to session-UTC TIMESTAMP —
    # downstream epoch math (unix_micros) rejects NTZ and bigint.
    dt = dict(load_table(spark, sf_smoke, "events").dtypes)["ts"]
    assert dt == "timestamp", dt


def test_date_columns_are_timestamp_like(spark, sf_smoke):
    # order/ship dates may read as timestamp or timestamp_ntz (both
    # compare fine against literals under a UTC session) but never as
    # raw ints/strings.
    for tbl, col in (("orders", "o_orderdate"), ("lineitem", "l_shipdate")):
        dt = dict(load_table(spark, sf_smoke, tbl).dtypes)[col]
        assert dt in ("timestamp", "timestamp_ntz", "date"), (tbl, col, dt)


def test_ts_normalization_is_session_tz_independent(spark, sf_smoke):
    # ADVICE r2: the NTZ→TIMESTAMP normalization must yield the SAME
    # epoch values whatever the session timezone — the driver's vanilla
    # session inherits the JVM tz, and parity must not depend on the
    # host being UTC. Session tz is runtime-mutable, so flip it in place.
    from pyspark.sql import functions as F

    def epochs():
        df = load_table(spark, sf_smoke, "events")
        r = df.agg(
            F.min(F.unix_micros("ts")).alias("mn"),
            F.max(F.unix_micros("ts")).alias("mx"),
        ).collect()[0]
        return r.mn, r.mx

    orig = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = epochs()
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny = epochs()
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)
    assert utc == ny, (utc, ny)
