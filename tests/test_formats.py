"""Round-trip fidelity: every interchange format must re-read its own
export bit-identically (schema AND values, incl. µs timestamps)."""

from __future__ import annotations

import pytest

from orionld_to_hive_spark.sources.formats import read_table, write_table
from orionld_to_hive_spark.sources.warehouse import load_table


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip_events(spark, tmp_path, fmt):
    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    path = str(tmp_path / f"events_{fmt}")
    write_table(ev, path, fmt)
    back = read_table(spark, path, ev.schema, fmt)
    assert back.schema == ev.schema
    key = lambda r: r.event_id
    orig = sorted(ev.collect(), key=key)
    rt = sorted(back.collect(), key=key)
    assert rt == orig  # exact: µs timestamps and doubles survive


def test_schema_evolution_merge_reads_old_and_new(spark, tmp_path):
    # additive column evolution: v1 files lack `quality`; a mergeSchema
    # read surfaces it as NULL for old rows — no rewrite of history.
    base = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a")], "doc_id long, text string"
    ).write.parquet(base + "/batch=0")
    spark.createDataFrame(
        [(2, "b", 0.9)], "doc_id long, text string, quality double"
    ).write.parquet(base + "/batch=1")
    got = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(got.columns) == {"doc_id", "text", "quality", "batch"}
    rows = {r.doc_id: r.quality for r in got.collect()}
    assert rows[1] is None and rows[2] == 0.9


def test_schema_evolution_merge_on_read(spark, tmp_path):
    # Warehouse reality: new columns appear mid-stream. Parquet handles
    # this at READ time with mergeSchema — old files surface NULL for
    # the new column, no rewrite of history. (At 100 TB, schema-merge
    # listing cost is why production tables pin the schema in a catalog
    # — the catalog module does that — but the on-read path must work
    # for ad-hoc reads of mixed eras.)
    d = str(tmp_path / "evo")
    spark.createDataFrame(
        [(1, "a", 1.0)], "id LONG, k STRING, v DOUBLE"
    ).write.parquet(d + "/era=1")
    spark.createDataFrame(
        [(2, "b", 2.0, "extra")], "id LONG, k STRING, v DOUBLE, note STRING"
    ).write.parquet(d + "/era=2")
    df = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(df.columns) == {"id", "k", "v", "note", "era"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["note"] is None  # old era backfills NULL
    assert rows[2]["note"] == "extra"
    assert rows[1]["era"] == 1 and rows[2]["era"] == 2  # partition col
