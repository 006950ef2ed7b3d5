"""Scalar Pandas-UDF surface: define, REGISTER into the SQL catalog,
call from a SQL string.

The reference has no UDFs (SURVEY §2.11); a complete engine still needs
the escape hatch, and the escape hatch must be the FAST one: an
Arrow-batched `pandas_udf` (columnar transfer, one Python call per
batch), not a row-at-a-time Python UDF. The demo function is simple
enough to have an exact SQL twin, so the whole define→register→SQL-call
path is oracle-checked — proving the UDF boundary doesn't change
results, not just that it runs.

Scale note: a pandas_udf breaks whole-stage codegen at its column only;
everything around it stays JVM-side. Keep UDFs off the hot path when a
built-in exists (every other operator in this repo does exactly that).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _chars_per_token(text: pd.Series) -> pd.Series:
    """Mean characters per whitespace token — vectorized pandas ops on
    an Arrow batch (no per-row Python)."""
    n_chars = text.str.len().astype("float64")
    n_toks = text.str.split().str.len().clip(lower=1).astype("float64")
    return n_chars / n_toks


def register_udfs(spark: SparkSession) -> None:
    # the pandas_udf wrapper binds to the active session, so build it
    # here, not at import time (registry imports run session-less)
    spark.udf.register("chars_per_token", pandas_udf(_chars_per_token, "double"))


def udf_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Call the registered pandas UDF from a SQL string over documents."""
    from orionld_to_hive_spark.catalog import register_warehouse

    register_warehouse(spark, sf_dir, "documents")
    register_udfs(spark)
    return spark.sql(
        """
        SELECT doc_id,
               round(chars_per_token(text), 6) AS chars_per_token
        FROM documents
        """
    )


# Twin: pandas' str.split() splits on whitespace RUNS and ignores
# leading/trailing whitespace — regexp_split on \s+ over trim() is the
# exact SQL equivalent; clip(lower=1) guards empty docs like GREATEST.
UDF_SQL_SURFACE_SQL = """
SELECT doc_id,
       round(length(text) * 1.0
             / GREATEST(len(regexp_split_to_array(trim(text), '\\s+')), 1), 6)
         AS chars_per_token
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Grouped-aggregate pandas UDAF — the custom-aggregate escape hatch.
# The function receives each group's column as ONE Arrow batch and
# returns a scalar; np.median sorts the group internally, so the result
# is independent of partition/shuffle order — which is what makes an
# exact DuckDB oracle (quantile_cont 0.5, same even-count midpoint
# interpolation) possible for a UDAF at all.
#
# Scale note: a grouped-agg UDAF materializes the WHOLE group in one
# executor batch — fine for bounded group cardinalities like
# event_type, wrong for unbounded ones (there, use the mergeable
# percentile_approx; `operators/sketches.py` shows both stances).
def _median(v: pd.Series) -> float:
    import numpy as np

    return float(np.median(v.to_numpy()))


def _size(v: pd.Series) -> int:
    return int(len(v))


def udaf_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orionld_to_hive_spark.sources.warehouse import load_table

    # Catalyst refuses to mix pandas and JVM aggregates in one Aggregate
    # node ([INVALID_PANDAS_UDF_PLACEMENT]), so the row count is a
    # pandas UDAF as well — both run in the same Arrow batch per group.
    median_agg = pandas_udf(_median, "double")
    count_agg = pandas_udf(_size, "long")
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.round(median_agg("value"), 6).alias("median_value"),
            count_agg("value").alias("n_events"),
        )
    )


UDAF_MEDIAN_SQL = """
SELECT event_type,
       round(median(value), 6) AS median_value,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""


QUERIES = {
    "udf_sql_surface": udf_sql_surface,
    "udaf_median_value": udaf_median_value,
}
ORACLES = {
    "udf_sql_surface": UDF_SQL_SURFACE_SQL,
    "udaf_median_value": UDAF_MEDIAN_SQL,
}
