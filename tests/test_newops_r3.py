"""Round-3 operator units — properties the oracle diff can't express.

Each new op is oracle-checked by tools/sweep.py; these assert the
algorithmic invariants: interpolation passes through observations and
stays inside its bracket, fertility is ≥ 1 by construction, the bigram
LM emits exactly n_words−1 bigrams per doc, and the UDAF median is
order-statistic-sane.
"""

from __future__ import annotations

from conftest import SF_SMOKE

from pyspark.sql import functions as F

from orionld_to_hive_spark.functions import udfs
from orionld_to_hive_spark.operators import temporal, text
from orionld_to_hive_spark.sources.warehouse import load_table


def test_interpolation_passes_through_observations(spark):
    rows = temporal.interpolate_hourly_values(spark, SF_SMOKE).collect()
    assert rows, "grid must be non-empty"
    for r in rows:
        assert r["v_interp"] is not None
        if not r["is_interpolated"]:
            assert r["v_obs"] == r["v_interp"], r


def test_interpolation_bracketed_by_neighbors(spark):
    # Linear interpolation between two observed points never leaves
    # [min(prev, next), max(prev, next)]. Walk each type's series.
    rows = temporal.interpolate_hourly_values(spark, SF_SMOKE).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for series in by_type.values():
        series.sort(key=lambda r: r["hour"])
        obs_idx = [i for i, r in enumerate(series) if not r["is_interpolated"]]
        for i, r in enumerate(series):
            if not r["is_interpolated"]:
                continue
            prevs = [j for j in obs_idx if j < i]
            nxts = [j for j in obs_idx if j > i]
            if prevs and nxts:
                a = series[prevs[-1]]["v_obs"]
                b = series[nxts[0]]["v_obs"]
                lo, hi = min(a, b), max(a, b)
                assert lo - 1e-6 <= r["v_interp"] <= hi + 1e-6, r


def test_fertility_at_least_one(spark):
    rows = text.tokenizer_fertility_report(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # Every whitespace word contributes ≥ 1 pretoken.
        assert r["fertility"] >= 1.0, r
        assert r["chars_per_pretoken"] > 0
        assert r["bytes_per_pretoken"] >= r["chars_per_pretoken"] - 1e-9


def test_bigram_lm_counts_and_signs(spark):
    scores = {
        r["doc_id"]: r
        for r in text.bigram_logprob_score(spark, SF_SMOKE).collect()
    }
    words = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .select(
            "doc_id",
            F.size(
                F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != "")
            ).alias("n"),
        )
        .collect()
    }
    for doc_id, r in scores.items():
        assert r["n_bigrams"] == words[doc_id] - 1, (doc_id, r)
        assert r["avg_logprob"] < 0
        assert r["perplexity"] > 1.0


def test_udaf_median_is_order_statistic(spark):
    med = {
        r["event_type"]: r["median_value"]
        for r in udfs.udaf_median_value(spark, SF_SMOKE).collect()
    }
    bounds = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    assert set(med) == set(bounds)
    for t, m in med.items():
        lo, hi = bounds[t]
        assert lo <= m <= hi, (t, m)


def test_audio_energy_matches_naive_reference(spark):
    import math

    from orionld_to_hive_spark.operators import multimodal

    assets = multimodal.assets_from_documents(spark, SF_SMOKE)
    got = {
        r["asset_id"]: r
        for r in multimodal.multimodal_audio_energy(spark, SF_SMOKE).collect()
    }
    W, H = multimodal.AUDIO_WIN, multimodal.AUDIO_HOP
    for row in assets.limit(8).collect():
        b = bytes(row["payload"])
        if len(b) >= W:
            starts = range(0, len(b) - W + 1, H)
            wins = [b[s : s + W] for s in starts]
        elif b:
            wins = [b]
        else:
            wins = []
        rms = [
            math.sqrt(sum((x - 128.0) ** 2 for x in w) / len(w)) for w in wins
        ]
        r = got[row["asset_id"]]
        assert r["n_windows"] == len(wins), row["asset_id"]
        if wins:
            assert abs(r["mean_rms"] - sum(rms) / len(rms)) < 1e-4
            assert abs(r["max_rms"] - max(rms)) < 1e-4
            assert r["n_active"] == sum(
                1 for x in rms if x > multimodal.AUDIO_ACTIVE_RMS
            )


def test_phash_pairs_are_oriented_and_close(spark):
    from orionld_to_hive_spark.operators import multimodal

    rows = multimodal.multimodal_phash_neardup(spark, SF_SMOKE).collect()
    for r in rows:
        assert r["asset_a"] < r["asset_b"]
        assert 0 <= r["hamming"] <= multimodal.PHASH_HAMMING_MAX


def test_recency_engagement_bounded_by_raw_value_sum(spark):
    from orionld_to_hive_spark.operators import analytics

    top = analytics.recency_weighted_engagement(spark, SF_SMOKE).collect()
    assert len(top) > 0
    sums = {
        r["user_id"]: r["s"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.sum(F.when(F.col("value") > 0, F.col("value")).otherwise(0)).alias("s"))
        .collect()
    }
    for r in top:
        # every weight is in (0, 1] ⇒ engagement ≤ sum of positive values
        assert r["engagement"] <= sums[r["user_id"]] + 1e-6


def test_fuzzy_pairs_share_block_and_distance(spark):
    from orionld_to_hive_spark.operators import curation

    names = {
        r["c_custkey"]: r["c_name"]
        for r in load_table(spark, SF_SMOKE, "customer").collect()
    }
    rows = curation.fuzzy_name_blocking_pairs(spark, SF_SMOKE).collect()
    assert rows
    for r in rows[:200]:
        a, b = names[r["cust_a"]], names[r["cust_b"]]
        assert a[:16] == b[:16]
        assert r["dist"] <= 1
        # levenshtein <= 1 on equal-length strings = at most one
        # differing character
        assert sum(x != y for x, y in zip(a, b)) <= 1 or len(a) != len(b)
