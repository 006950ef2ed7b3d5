"""Catalog/DDL operator tests (D1-D5)."""

from __future__ import annotations

from orionld_to_hive_spark import catalog
from orionld_to_hive_spark.sources.batch_csv import ingest_measurements


def test_register_and_query_views(spark, sf_smoke):
    catalog.register_warehouse(spark, sf_smoke, "events", "nation")
    n = spark.sql("SELECT count(*) AS n FROM events").collect()[0].n
    assert n == 1000
    assert catalog.table_exists(spark, "events")


def test_drop_if_exists_idempotent(spark, sf_smoke):
    catalog.register_warehouse(spark, sf_smoke, "region")
    catalog.drop_if_exists(spark, "region")
    assert not catalog.table_exists(spark, "region")
    catalog.drop_if_exists(spark, "region")  # second drop must not raise


def test_dump_config(spark):
    cfg = catalog.dump_config(spark)
    assert {"key", "value"} <= set(c.lower() for c in cfg.columns)
    assert cfg.count() > 50


def test_create_readings_table_over_warehouse(spark, tmp_path):
    d = tmp_path / "m"
    d.mkdir()
    (d / "Kitchen_Temperature.csv").write_text("1489017527\t19.2\n")
    (d / "Room1_Humidity.csv").write_text("1489017527\t47\n")
    out = str(tmp_path / "wh")
    ingest_measurements(spark, str(d / "*.csv"), out, sample_fraction=1.0)
    catalog.create_readings_table(spark, "readings_t", out)
    try:
        rows = spark.sql(
            "SELECT room, temperature, humidity FROM readings_t ORDER BY room"
        ).collect()
        assert [r.room for r in rows] == ["kitchen", "room1"]
        assert rows[0].temperature == 19.2 and rows[1].humidity == 47
    finally:
        spark.sql("DROP TABLE IF EXISTS readings_t")
