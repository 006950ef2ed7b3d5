"""Python UDTF surface — user-defined TABLE functions (Spark 4).

The reference has no UDF/UDTF surface at all (SURVEY.md §2.11); this
completes ours: scalar Python work is Arrow-batched pandas UDFs
(similarity/multimodal modules), table-valued Python work is a UDTF.

`sentence_split` explodes a document into sentence rows with position
and length — the lateral/table-function shape (one input row → N output
rows with computed columns) that powers chunking in training-data
pipelines.

Scale stance: a UDTF runs partition-local in the Python worker (Arrow
transfer, no shuffle introduced); the cost model is the same as
mapInPandas. Logic kept expressible in ANSI SQL too, so the operator
keeps a DuckDB oracle — the UDTF's value over `explode(split(...))`
is carrying stateful per-row Python (tokenizers, chunkers) once logic
outgrows SQL.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from orionld_to_hive_spark.sources.warehouse import load_table

_SENT_RE = re.compile(r"\.\s+")


@udtf(returnType="sent_idx int, sentence string, n_chars int")
class SentenceSplit:
    """One row per '. '-delimited sentence; trailing periods trimmed."""

    def eval(self, text: str):
        if text is None:
            return
        for i, raw in enumerate(_SENT_RE.split(text)):
            s = raw.strip().rstrip(".")
            if s:
                yield i, s, len(s)


def sentence_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral-join the UDTF over documents: doc_id × sentences."""
    spark.udtf.register("sentence_split", SentenceSplit)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence, s.n_chars
        FROM docs_udtf d, LATERAL sentence_split(d.text) s
        """
    )


SENTENCE_SPLIT_SQL = r"""
WITH split AS (
  SELECT doc_id,
         generate_subscripts(regexp_split_to_array(text, '\.\s+'), 1) - 1
           AS sent_idx,
         unnest(regexp_split_to_array(text, '\.\s+')) AS raw
  FROM documents
),
cleaned AS (
  SELECT doc_id, sent_idx, rtrim(trim(raw), '.') AS sentence
  FROM split
)
SELECT doc_id, CAST(sent_idx AS INTEGER) AS sent_idx, sentence,
       CAST(length(sentence) AS INTEGER) AS n_chars
FROM cleaned
WHERE sentence <> ''
ORDER BY doc_id, sent_idx
"""


QUERIES = {
    "sentence_split_docs": sentence_split_docs,
}

ORACLES = {
    "sentence_split_docs": SENTENCE_SPLIT_SQL,
}
