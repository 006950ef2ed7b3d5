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


def test_analyze_table_populates_cbo_stats(spark, tmp_path):
    """ANALYZE must land rowCount + size in the catalog (what the
    cost-based optimizer reads for join ordering / broadcast checks)."""
    from orionld_to_hive_spark.catalog import analyze_table, drop_if_exists
    from orionld_to_hive_spark.sources.warehouse import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "docs_tbl")
    docs.write.parquet(path)
    drop_if_exists(spark, "docs_stats_tbl")
    spark.sql(
        f"CREATE TABLE docs_stats_tbl USING parquet LOCATION '{path}'"
    )
    try:
        stats = analyze_table(spark, "docs_stats_tbl", ("doc_id", "lang"))
        assert f"{docs.count()} rows" in stats["statistics"], stats
        assert "bytes" in stats["statistics"]
    finally:
        drop_if_exists(spark, "docs_stats_tbl")
