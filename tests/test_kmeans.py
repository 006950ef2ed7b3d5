"""Units for the DataFrame-iterative k-means fit (IVF training)."""

from __future__ import annotations

from pyspark.sql import functions as F

from orionld_to_hive_spark.operators.similarity import (
    KMEANS_K,
    _assign,
    _emb,
    kmeans_embeddings_report,
)


def test_kmeans_partitions_all_vectors(spark, sf_smoke):
    report = kmeans_embeddings_report(spark, sf_smoke).collect()
    total = _emb(spark, sf_smoke).count()
    assert sum(r["n_points"] for r in report) == total
    assert 1 <= len(report) <= KMEANS_K
    assert all(r["inertia"] >= 0.0 for r in report)


def test_kmeans_is_run_to_run_deterministic(spark, sf_smoke):
    a = [tuple(r) for r in kmeans_embeddings_report(spark, sf_smoke).collect()]
    b = [tuple(r) for r in kmeans_embeddings_report(spark, sf_smoke).collect()]
    assert a == b


def test_kmeans_iterations_do_not_increase_inertia(spark, sf_smoke):
    # Lloyd's guarantee: total inertia after the fit is <= the inertia
    # of the initial (vec_id < k) centroids.
    emb = _emb(spark, sf_smoke).select("vec_id", "vec")
    init = emb.filter(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("vec").alias("cvec")
    )
    init_inertia = _assign(emb, init).agg(F.sum("d")).collect()[0][0]
    fitted = kmeans_embeddings_report(spark, sf_smoke).agg(
        F.sum("inertia")
    ).collect()[0][0]
    assert fitted <= init_inertia + 1e-6
