"""Batch MERGE (upsert) into the partitioned-parquet warehouse —
copy-on-write, touching ONLY the partitions the updates land in.

The batch twin of `streaming/upsert.py`'s latest-wins entity upsert
(reference `subscriber.py:97-123` holds the per-entity latest-state
precedent), and the plain-parquet expression of what Delta/Hudi/Iceberg
call MERGE INTO with copy-on-write:

  1. prune: collect the DISTINCT partition values present in the
     updates (an aggregate over the small update batch, not the table);
  2. read back ONLY those partitions of the target (partition-pruned
     scan — the 100 TB table contributes just the touched slice);
  3. latest-wins dedup of (existing ∪ updates) per key by a version
     column, deterministic tiebreak on provenance (update beats
     existing at equal version);
  4. dynamic partition-overwrite of exactly those partitions
     (`overwrite_partitions`) — untouched partitions keep their files
     byte-for-byte (asserted by mtime in tests).

Scale: cost is O(touched partitions + update batch), independent of
table size. The latest-wins dedup is one window over (key) within the
touched slice — at 10⁹ rows per partition you'd bucket the table by
key to make this shuffle-free; the warehouse's bucketed path
(`sources/bucketing.py`) shows that layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from orionld_to_hive_spark.sources.warehouse import overwrite_partitions


def merge_upsert(
    target_path: str,
    updates: DataFrame,
    key_cols: tuple[str, ...],
    version_col: str,
    partition_cols: tuple[str, ...],
) -> int:
    """MERGE `updates` into the parquet table at `target_path`.

    Latest `version_col` per key wins; at equal version the update row
    wins (idempotent re-merge). Returns the number of partitions
    rewritten."""
    spark = updates.sparkSession
    touched = updates.select(*partition_cols).distinct()
    touched_rows = touched.collect()  # small: one row per touched partition
    if not touched_rows:
        return 0

    target = spark.read.parquet(target_path)
    # partition-pruned read of the touched slice only: a disjunction of
    # partition-value conjunctions, which Catalyst folds into partition
    # pruning (PartitionFilters in the scan).
    pred = None
    for r in touched_rows:
        conj = None
        for c in partition_cols:
            term = F.col(c) == F.lit(r[c])
            conj = term if conj is None else (conj & term)
        pred = conj if pred is None else (pred | conj)
    existing = target.filter(pred).select(*updates.columns)

    merged = existing.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(), F.col("_src").desc()
    )
    latest = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
    overwrite_partitions(latest, target_path, partition_cols)
    return len(touched_rows)
