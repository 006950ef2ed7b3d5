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
        ORDER BY doc_id
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


QUERIES = {"udf_sql_surface": udf_sql_surface}
ORACLES = {"udf_sql_surface": UDF_SQL_SURFACE_SQL}
