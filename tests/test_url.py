"""URL normalization units: rule-by-rule pins, the JVM-only plan gate
(no Python evaluator anywhere in the chain), and rollup correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from orionld_to_hive_spark.operators.url import (
    _normalize,
    domain_rollup,
    url_normalize_report,
)
from orionld_to_hive_spark.plans.explain import count_shuffles, formatted


def _norm_one(spark, raw: str) -> str:
    df = spark.createDataFrame([(raw,)], "u STRING").select(
        _normalize(F.col("u")).alias("n")
    )
    return df.collect()[0]["n"]


def test_rules_rule_by_rule(spark):
    n = lambda s: _norm_one(spark, s)  # noqa: E731
    # scheme+authority lowercased, PATH CASE PRESERVED
    assert n("HTTPS://Example.COM/Doc/X") == "https://example.com/Doc/X"
    # default ports stripped, non-default kept
    assert n("http://a.com:80/x") == "http://a.com/x"
    assert n("https://a.com:443/x") == "https://a.com/x"
    assert n("https://a.com:8443/x") == "https://a.com:8443/x"
    assert n("http://a.com:80") == "http://a.com"
    # the :80 rule must not fire on https (and vice versa)
    assert n("https://a.com:80/x") == "https://a.com:80/x"
    # fragment removed
    assert n("http://a.com/x#frag?y=1") == "http://a.com/x"
    # tracking params: mid, leading, only, two leading in a row
    assert n("http://a.com/x?utm_source=f&y=1") == "http://a.com/x?y=1"
    assert n("http://a.com/x?y=1&utm_source=f") == "http://a.com/x?y=1"
    assert n("http://a.com/x?fbclid=z") == "http://a.com/x"
    assert (n("http://a.com/x?utm_a=1&gclid=2&y=3")
            == "http://a.com/x?y=3")
    # non-tracking params never touched
    assert n("http://a.com/x?gclid_not=1") == "http://a.com/x?gclid_not=1"


def test_registered_domain_and_host(spark, sf_smoke):
    rows = {r["asset_id"]: r
            for r in url_normalize_report(spark, sf_smoke).collect()}
    assert rows[1]["host"] == "www.news-site.org"
    assert rows[1]["registered_domain"] == "news-site.org"
    assert rows[3]["host"] == "sub.domain.example.com"
    assert rows[3]["registered_domain"] == "example.com"
    assert rows[0]["norm_url"].startswith("https://example.com/Doc/")
    assert "#" not in rows[0]["norm_url"]
    assert "utm" not in rows[0]["norm_url"]


def test_plan_is_jvm_only(spark, sf_smoke):
    """The whole chain must stay inside codegen: no Python evaluator
    nodes, and the report is shuffle-free (the rollup pays exactly
    its aggregation exchanges)."""
    rep = url_normalize_report(spark, sf_smoke)
    plan = formatted(rep)
    assert "EvalPython" not in plan and "ArrowEval" not in plan, plan
    assert "InPandas" not in plan and "PythonUDF" not in plan, plan
    # the whole normalization collapses into the scan's Project —
    # shuffle-FREE since r13 dropped the presentation orderBy (its
    # range partitioning was the plan's only exchange)
    assert "Project" in plan, plan
    assert count_shuffles(rep) == 0, plan
    roll = domain_rollup(spark, sf_smoke)
    plan = formatted(roll)
    assert "EvalPython" not in plan and "ArrowEval" not in plan, plan


def test_rollup_partitions_docs_exactly(spark, sf_smoke):
    rows = domain_rollup(spark, sf_smoke).collect()
    total = sum(r["n_docs"] for r in rows)
    assert total == url_normalize_report(spark, sf_smoke).count()
    doms = {r["registered_domain"] for r in rows}
    assert doms == {"example.com", "example.net", "example.org",
                    "news-site.org", "example.co.uk", "site.com.au"}


def test_public_suffix_registered_domain(spark, sf_smoke):
    rows = {r["asset_id"]: r
            for r in url_normalize_report(spark, sf_smoke).collect()}
    # doc 6: co.uk suffix → THREE labels kept
    assert rows[6]["host"] == "shop.example.co.uk"
    assert rows[6]["registered_domain"] == "example.co.uk"
    # doc 7: com.au suffix
    assert rows[7]["registered_domain"] == "site.com.au"
    # non-listed multi-label host still collapses to two labels
    assert rows[3]["registered_domain"] == "example.com"
