"""Interchange formats: CSV / JSON-lines / parquet writers and readers
with schema round-trip fidelity.

The reference's only interchange surface is headerless TSV in
(reference `insert.py:74`) and NGSI-LD JSON over HTTP (reference
`subscriber.py:104-123`). An engine users migrate onto also needs to
EXPORT — and to re-ingest its own exports losslessly. These helpers pin
the options that make round-trips exact:

  - explicit schema on read (never inferSchema — a 100 TB read must not
    pay an inference pre-pass, and inference can't distinguish
    INT/LONG or TIMESTAMP/STRING reliably);
  - microsecond timestamp format on CSV/JSON (default truncates);
  - header on CSV so column order is self-describing.

Parquet and ORC need no options — both are µs-timestamp columnar
formats with native schemas; parquet is the warehouse format
(warehouse.py) and appears here only so callers can treat format
choice as data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
# TIMESTAMP and TIMESTAMP_NTZ columns are formatted by different options;
# set both so µs precision survives regardless of the column's zone-ness.
_TS_OPTS = {"timestampFormat": _TS_FMT, "timestampNTZFormat": _TS_FMT}


def write_table(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    w = df.write.mode("overwrite")
    if fmt == "csv":
        w.option("header", True).options(**_TS_OPTS).csv(path)
    elif fmt == "json":
        w.options(**_TS_OPTS).json(path)
    elif fmt == "parquet":
        w.parquet(path)
    elif fmt == "orc":
        w.orc(path)
    else:
        raise ValueError(f"unsupported format {fmt!r}")


def read_table(
    spark: SparkSession, path: str, schema: T.StructType, fmt: str = "parquet"
) -> DataFrame:
    r = spark.read.schema(schema)
    if fmt == "csv":
        return r.option("header", True).options(**_TS_OPTS).csv(path)
    if fmt == "json":
        return r.options(**_TS_OPTS).json(path)
    if fmt == "parquet":
        return r.parquet(path)
    if fmt == "orc":
        return r.orc(path)
    raise ValueError(f"unsupported format {fmt!r}")
