"""Differential test: every registry query with an oracle must match
DuckDB on sf0.001 (fast) — mirrors the driver's sf0.01 gate."""

from __future__ import annotations

import pytest

from orionld_to_hive_spark import registry
from tests.oracle_diff import compare, duckdb_run

QUERIES = registry.all_queries()
ORACLES = registry.all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_smoke, name):
    spark_df = QUERIES[name](spark, sf_smoke)
    oracle_df = duckdb_run(ORACLES[name], sf_smoke)
    problems = compare(spark_df, oracle_df)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_oracle_free_query_runs(spark, sf_smoke, name):
    df = QUERIES[name](spark, sf_smoke)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_curation_observed_metrics_ride_the_job(spark):
    """Stage-yield telemetry via observe(): input and post-gate counts
    must come from the one curation job, no second scan."""
    from pyspark.sql import Observation

    from orionld_to_hive_spark.operators.pipeline import (
        _quality_gate,
        curate_documents,
    )
    from orionld_to_hive_spark.sources.warehouse import load_table

    sf = "/root/testdata/sf0.001"
    inp, gated = Observation("in"), Observation("gated")
    curate_documents(spark, sf, input_obs=inp, gated_obs=gated).collect()
    docs = load_table(spark, sf, "documents")
    assert inp.get["n_input"] == docs.count()
    assert gated.get["n_gated"] == _quality_gate(docs).count()
    assert 0 < gated.get["n_gated"] <= inp.get["n_input"]


def test_connected_components_min_label_fixpoint(spark):
    """Chain + separate pair + transitivity: a-b, b-c, c-d collapse to
    one component labeled min(a..d) even though a,d were never paired."""
    from orionld_to_hive_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(2, 3), (3, 4), (4, 5), (8, 9)], ["doc_a", "doc_b"]
    )
    labels = {
        r.node: r.label
        for r in connected_components(edges, "doc_a", "doc_b").collect()
    }
    assert labels == {2: 2, 3: 2, 4: 2, 5: 2, 8: 8, 9: 8}
