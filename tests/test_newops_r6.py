"""Round-6 additions: exact-oracle ANN graduations, sampling twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from orionld_to_hive_spark.operators.similarity import (
    LSH_BITS,
    ann_bruteforce_topk,
    ann_lsh_topk,
    ann_ivf_topk,
    _emb,
    _lsh_bucket_udf,
)


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def test_ann_lsh_portable_buckets_are_deterministic_and_spread(spark, sf_smoke):
    emb = _emb(spark, sf_smoke).withColumn(
        "bucket", _lsh_bucket_udf()(F.col("vec"))
    )
    a = sorted((r.vec_id, r.bucket) for r in emb.collect())
    b = sorted((r.vec_id, r.bucket) for r in emb.collect())
    assert a == b
    buckets = {bk for _, bk in a}
    # not degenerate: vectors actually spread across the 2^LSH_BITS grid
    assert 1 < len(buckets) <= 1 << LSH_BITS


def test_ann_lsh_and_ivf_recall_vs_bruteforce(spark, sf_smoke):
    exact = _pairs(ann_bruteforce_topk(spark, sf_smoke))
    lsh = _pairs(ann_lsh_topk(spark, sf_smoke))
    ivf = _pairs(ann_ivf_topk(spark, sf_smoke))
    assert len(exact) == 50
    # approximate paths must return full top-k rows and be usefully
    # correlated with the exact answer (guards against a degenerate
    # projection that isolates every vector or lumps them all together)
    assert len(lsh) == 50 and len(ivf) == 50
    assert len(exact & lsh) / len(exact) >= 0.2
    # single-probe IVF with label cells recalls less by design — the
    # bound only rules out a fully uncorrelated routing
    assert len(exact & ivf) / len(exact) >= 0.1


def test_hash_sample_is_stable_under_repartition(spark, sf_smoke):
    """The content-addressed Bernoulli twin must select the SAME rows
    regardless of physical layout (the property the RNG variant lacks)."""
    from orionld_to_hive_spark.operators.parity import p6_sample_hash
    from orionld_to_hive_spark.sources.warehouse import load_table

    import orionld_to_hive_spark.operators.parity as parity

    base = {r.event_id for r in p6_sample_hash(spark, sf_smoke).collect()}
    ev = load_table(spark, sf_smoke, "events")
    n = ev.count()
    # fraction lands near 0.5 (binomial 3σ at smoke scale)
    assert abs(len(base) / n - 0.5) < 0.1
    relaid = (
        ev.repartition(13, "user_id")
        .sortWithinPartitions(F.col("value").desc())
        .filter(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("event_id").cast("string"), F.lit(":p6"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            < parity._P6_THRESHOLD
        )
        .select("event_id")
    )
    assert {r.event_id for r in relaid.collect()} == base


def test_stratified_hash_respects_strata(spark, sf_smoke):
    from orionld_to_hive_spark.operators.pipeline import (
        STRATA_FRACTIONS,
        stratified_sample_hash,
    )
    from orionld_to_hive_spark.sources.warehouse import load_table

    sample = stratified_sample_hash(spark, sf_smoke)
    got = {r.lang: r.n for r in sample.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    tot = {
        r.lang: r.n
        for r in load_table(spark, sf_smoke, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(got) <= set(STRATA_FRACTIONS)
    for lang, f in STRATA_FRACTIONS.items():
        if lang in tot and tot[lang] >= 20:
            assert abs(got.get(lang, 0) / tot[lang] - f) < 0.25
