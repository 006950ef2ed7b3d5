"""Round-4 operator units: source KL divergence properties."""

from __future__ import annotations

SF_SMOKE = "/root/testdata/sf0.001"


def test_source_kl_is_nonnegative_and_asymmetric(spark):
    from orionld_to_hive_spark.operators.curation import source_kl_divergence

    rows = source_kl_divergence(spark, SF_SMOKE).collect()
    assert rows, "documents table has >= 2 sources"
    kl = {(r.source_a, r.source_b): r.kl_div for r in rows}
    for (a, b), v in kl.items():
        assert a != b
        # add-one smoothed distributions are true distributions -> Gibbs
        assert v >= -1e-9, (a, b, v)
        # both directions are present (KL is directed)
        assert (b, a) in kl
    # directed pairs over every source pair
    n_src = len({a for a, _ in kl})
    assert len(kl) == n_src * (n_src - 1)


def test_source_kl_zero_for_identical_distribution(spark):
    # a source compared against an exact copy of itself must score 0:
    # feed a two-source frame where both sources hold the same text.
    from orionld_to_hive_spark.operators import curation

    docs = spark.createDataFrame(
        [
            (1, "a b c a", "en", "s1", 7),
            (2, "a b c a", "en", "s2", 7),
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    orig = curation._docs
    curation._docs = lambda spark, sf_dir: docs
    try:
        rows = curation.source_kl_divergence(spark, SF_SMOKE).collect()
    finally:
        curation._docs = orig
    assert len(rows) == 2
    for r in rows:
        assert abs(r.kl_div) < 1e-9, r
