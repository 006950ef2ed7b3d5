"""Benchmark harness — reimplements the reference's timing methodology
(reference `hive.py:105-138`: per query 1 warm-up + N timed repetitions,
mean/stddev/95% CI) over the Spark engine at $SPARK_GRAFT_SF_DIR.

The LAST stdout line is exactly ONE compact JSON object:
  {"metric": "...", "value": <total mean sec>, "unit": "sec",
   "queries": {name: mean_sec, ...}, "sf": ...}
kept deliberately small (r1 lesson: the driver tail-captures stdout and
a multi-KB line came back unparseable). Full per-query stats (warmup /
stdev / CI95), the baseline comparison, and the multi-scale ladder
(reference PDF §4 runs 25/50/75/100% scales; we run the headline set at
each $SPARK_GRAFT_SF_LADDER scale with fewer reps) are written to
BENCH_DETAIL.json next to this file.

Each timed repetition executes the full query (plan → execute →
collect), matching the reference's cursor.execute + fetchall timing
window. Runs on local[$SPARK_GRAFT_CPUS].

BENCH_DETAIL.json (the committed artifact) is only written when
publishing (`--publish` argv or BENCH_PUBLISH=1): the driver's verify
smoke re-runs bench.py with non-exclusive settings, and before r8 that
clobbered the committed exclusive-run numbers in the working tree
(VERDICT r7 item 6). Non-publish runs write the same payload to
.ladder/BENCH_DETAIL.scratch.json so nothing is lost, and `git status`
stays clean after a driver smoke.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from orionld_to_hive_spark import registry
from orionld_to_hive_spark.session import get_spark

REPS = int(os.environ.get("BENCH_REPS", "5"))

# BENCH_HIGH_REPS=0 disables the per-query HIGH_REPS overrides below —
# for verify smokes that only check the JSON contract, where paying 30
# reps on the parity quartet buys nothing. Publication runs leave it on.
HIGH_REPS_ENABLED = os.environ.get("BENCH_HIGH_REPS", "1") != "0"

# r14: clear the Spark cache between queries (see run_scale) — the
# unpersist-discipline fix. =0 only for measuring the methodology delta.
CLEAR_CACHE = os.environ.get("BENCH_CLEAR_CACHE", "1") != "0"

# Per-query rep OVERRIDES at the headline scale (max of this and REPS).
# The reference methodology runs 30 reps (hive.py:105-138); running the
# whole headline set at 30 would cost ~25 min, so the budget goes where
# variance matters: the four baseline-parity queries (the official 2×
# gate) at the full 30, and the six queries that regressed >10% r1→r2
# with no code change (suspected JVM/GC noise at n=2) at 15 — enough to
# shrink the CI below the observed 10-50% swings.
HIGH_REPS = {
    "q1_time_filter": 30,
    "q2_hourly_avg": 30,
    "q3_union_cube": 30,
    "q4_join_hourly": 30,
    "trailing_hour_stats": 15,
    "multi_distinct_agg": 15,
    "having_large_orders": 15,
    "pipeline_curation_report": 15,
    "word_freq_explode": 15,
    "tpch_q21_waiting_suppliers": 15,
    # r3 headliners and the three r2→r3 >10% drifters with no code
    # change (VERDICT r3 item 5). The iterative/stateful queries
    # (pagerank: ~120 stages/run; session windows) carry inherent
    # ~0.2-0.4 s GC/scheduling stdev, so they get 30 reps — CI lands
    # ~±0.07 s, the floor reachable without hundreds of reps; the rest
    # of the >1 s set pins under ±0.05 s at 15.
    "graph_nation_trade_pagerank": 30,
    "interpolate_hourly_values": 30,
    "session_window_stats": 30,
    "bigram_logprob_score": 20,
    # r7: the A/B (PLANS.md) measured warmed stdev ~0.11 — the largest
    # of any headliner — so its official mean needs the full 30
    "dedup_minhash_lsh": 30,
    "sessionize_events": 15,
    "dwell_time_profile": 15,
    "stats_moments": 15,
    "tumbling_window_agg": 15,
    "latest_event_per_user": 15,
    "tpch_q1_pricing": 15,
    # r5: Q3 re-planned (shuffle_hash build from the filtered
    # orders⋈cust side) — pin its regression history at ≥15 reps
    "tpch_q3_shipping": 15,
    # r8: +17% r6→r7 drift adjudicated as rep-count noise — the r7
    # refactor's optimized plan is byte-identical to r6's (PLANS.md:
    # asof_click_before_purchase); pin the mean at 15 reps
    "asof_click_before_purchase": 15,
    # r14 (VERDICT r13 item 4): the XML-discovery/robots chain read
    # 2.4-4.2 s in the r13 driver bench purely from host gusts (their
    # own records: robots_gate mean 2.67 / median 2.03 / stdev 1.31;
    # the same-core publication run measured 0.55-0.64 s) — pin their
    # official means at 15 reps so one gust rep can't triple them
    "robots_gate_report": 15,
    "robots_sitemap_discovery": 15,
    "frontier_from_sitemap_index": 15,
}

# Every headliner >0.5 s at sf0.1 (official r5 numbers) re-measured at
# the generated sf0.3 replica (high-end ladder honesty, VERDICT r4
# item 7, widened per VERDICT r5 item 5). The six heaviest — the
# original r4 set — additionally get an sf1.0 point (10 replicas,
# tools/gen_ladder.py 1.0) and more reps; the widened tail runs 3 reps
# (means there are ~0.5-1 s — CI lands well under the 1.5×-per-3×
# flagging threshold the scaling report applies).
SF1_LADDER_QUERIES = (
    "graph_nation_trade_pagerank",
    "bigram_logprob_score",
    "interpolate_hourly_values",
    "dedup_minhash_lsh",
    "sessionize_events",
    "session_window_stats",
    # r8 (VERDICT r7 item 3): the six queries that carried the coarser
    # 3x-growth flag with no sf1.0 point now get the full 10x ladder +
    # engine/fetch split, so their exponents are measured, not inferred
    "trailing_hour_stats",
    "quality_ensemble_report",
    "doc_entropy_report",
    "doc_repetition_report",
    "span_dedup_report",
    "ann_bruteforce_topk",
    # r9 (VERDICT r8 item 7): the newest headliners ≥0.4 s at sf0.1
    # with no sf1.0 row yet — measured exponents for every headline
    "bpe_token_accounting",
    "quality_classifier_score",
    "doc_chunks",
    "dwell_time_profile",
    # r9: overlapping exact-substring dedup (the heaviest headline —
    # every overlapping 8-gram shuffles twice by design)
    "exact_substr_rewrite",
    # r10 (VERDICT r9 item 6): the JPEG codec queries — the heaviest
    # Python stage in the repo finally carries measured exponents
    "multimodal_jpeg_stats",
    "multimodal_jpeg_selective_stats",
    "multimodal_jpeg_tall_stats",
    # r10 continuation: the session's new headliners — GIF decode
    # (codec family, byte-proportional), SemDeDup (fit overhead is
    # scale-flat, pair stage n²/K), unigram Viterbi (distinct-word
    # bounded)
    "multimodal_gif_frames",
    "semdedup_prune_report",
    "unigram_tokenize_report",
    # r11: the 4-component CMYK decode — 4/3 the plane work of the
    # color path, same Arrow-batched codec family
    "multimodal_jpeg_cmyk_stats",
)
HIGH_LADDER_QUERIES = SF1_LADDER_QUERIES + (
    "tpch_q1_pricing",
    "stats_moments",
    "having_large_orders",
    "tpch_q21_waiting_suppliers",
    "rollup_pricing",
    # r12: the byte-proportional walker headliners (post core-spread,
    # ~1 s at sf0.1 is mostly fixed fan-out overhead — the sf0.3 point
    # shows whether the per-byte walk scales linearly under it)
    "multimodal_pdf_meta",
    "eml_text_extraction",
    "zip_manifest",
    "multimodal_ogg_meta",
    "robots_gate_report",
    # r13: the new byte-proportional walkers + the two-level XML
    # discovery lineage — sf0.3 points for their scaling exponents
    "pdf_xref_stream_meta",
    "avro_container_meta",
    "warc_cdx_index",
    "sitemap_index_discovery",
    "html_main_content",
)

# Headline set: the four reference-parity queries plus one representative
# of each scale-relevant operator family.
HEADLINE = (
    "q1_time_filter",
    "q2_hourly_avg",
    "q3_union_cube",
    "q4_join_hourly",
    "tpch_q1_pricing",
    "tpch_q6_forecast",
    "tpch_q19_disjunctive",
    "tpch_q3_shipping",
    "regional_revenue",
    "latest_event_per_user",
    "sessionize_events",
    "dedup_minhash_lsh",
    "ann_bruteforce_topk",
    "text_quality_score",
    "asof_click_before_purchase",
    "tumbling_window_agg",
    "rollup_pricing",
    "ndv_exact_users_per_type",
    "skew_join_order_revenue",
    "intersect_buyers_clickers",
    "session_window_stats",
    "stats_moments",
    "pipeline_curation_report",
    "having_large_orders",
    "trailing_hour_stats",
    "multi_distinct_agg",
    "word_freq_explode",
    "tpch_q9_profit",
    "tpch_q13_custdist",
    "tpch_q21_waiting_suppliers",
    # round-2 operator families (embedding_neardup_lsh is deliberately
    # NOT here: at the corpus's low 0.4 cosine threshold banded LSH
    # cannot prune below ~n² candidates — see similarity.py — so it
    # benches as a slower exact join; the family is represented by
    # ann_bruteforce_topk above)
    "doc_repetition_report",
    "span_dedup_report",
    "doc_entropy_report",
    "gopher_quality_report",
    "vocab_coverage_report",
    "ohlc_bars_hourly",
    "zscore_outlier_events",
    "embedding_quantization_report",
    "quality_classifier_score",
    "doc_chunks",
    "dwell_time_profile",
    "quality_ensemble_report",
    # round-3 operator families: iterative graph (join-per-iteration
    # PageRank), portable-hash sketch, spine interpolation, bigram LM
    "graph_nation_trade_pagerank",
    "countmin_freq_estimate",
    "interpolate_hourly_values",
    "bigram_logprob_score",
    # round-8: real BPE tokenizer apply (merge table compiled into the
    # plan as a replace chain over the distinct-word frame)
    "bpe_token_accounting",
    # round-9: the production ANN path (balanced LSH + radius-2
    # multiprobe + exact re-rank; brute force above is the baseline)
    "ann_multiprobe_r2_topk",
    # round-9: overlapping exact-substring dedup (ExactSubstr) — a new
    # family next to the near-dup representatives above: every
    # overlapping 8-gram is detected and cut, not just tiled blocks
    "exact_substr_rewrite",
    # round-10: the multimodal JPEG codec family (Arrow-batched
    # mapInPandas decode) — full decode, the r9 selective query (its
    # predicate keeps ~100% on this corpus: pays dims-pass overhead,
    # an honest upper bound), and the tall variant whose ~1/3 survivor
    # fraction demonstrates the decode-only-survivors saving
    "multimodal_jpeg_stats",
    "multimodal_jpeg_selective_stats",
    "multimodal_jpeg_tall_stats",
    # round-10 continuation: animated-GIF frame sampling (real LZW
    # decode + compositing, the video-shaped 1:N fan-out), SemDeDup
    # (k-means + within-cluster cosine prune), and the unigram-LM
    # tokenizer (Viterbi over the distinct-word frame — the
    # SentencePiece-family twin of bpe_token_accounting above)
    "multimodal_gif_frames",
    "semdedup_prune_report",
    "unigram_tokenize_report",
    # round-11: CMYK/Adobe JPEG (the 4-component decode path), MP3
    # metadata triage (frame-header walk, no codec), and the
    # IVF-multiprobe ANN operating point (recall ≥ 0.88 at ~25%
    # fan-out — replaces wide-code LSH, measured out in PLANS.md)
    "multimodal_jpeg_cmyk_stats",
    "multimodal_mp3_meta",
    "multimodal_warc_meta",
    "warc_text_extraction",
    "webdataset_manifest",
    "multimodal_flac_meta",
    "ann_ivf_multiprobe_topk",
    # round-12: the crawl-container walkers hardened for real-world
    # inputs — PAX/GNU-tolerant WebDataset audit, charset-aware WARC
    # text extraction (declared → utf-8 → latin-1), and FLAC
    # VORBIS_COMMENT tag extraction
    "webdataset_manifest_tolerant",
    "warc_text_extraction_charset",
    "multimodal_flac_vorbis",
    # round-12 continuation: HTML→text (the crawl stage between WARC
    # and dedup; warc_html_extraction is the full container→text
    # chain), ID3v2 tag extraction, EXIF/TIFF IFD walk
    "html_text_extraction",
    "warc_html_extraction",
    "multimodal_mp3_id3",
    "multimodal_exif_meta",
    # round-12 continuation: ZIP audit (CRC-verified central-directory
    # walk), WebP/PDF structural triage, and the robots.txt gate (pure
    # JVM parse + longest-match windows)
    "zip_manifest",
    "multimodal_webp_meta",
    "multimodal_pdf_meta",
    "robots_gate_report",
    # round-12 continuation: MIME/EML bit-exact extraction, the JVM
    # XPath sitemap surface, Ogg page walk with real CRC verification
    "eml_text_extraction",
    "sitemap_url_extract",
    "multimodal_ogg_meta",
    "parquet_footer_audit",
    "zstd_frame_meta",
    "crawl_frontier_schedule",
    # round-13: PDF 1.5 xref-stream triage (FlateDecode + PNG
    # predictors), two-level sitemapindex discovery and the frontier
    # fed by it, and Content-Encoding-aware WARC extraction
    "pdf_xref_stream_meta",
    "sitemap_index_discovery",
    "frontier_from_sitemap_index",
    "warc_content_encoding_extraction",
    # round-13 continuation: the complete discovery chain (robots.txt
    # Sitemap directive → index → child sitemaps → urls) and the
    # Crawl-delay-honoring politeness schedule
    "robots_sitemap_discovery",
    "frontier_crawl_delay_schedule",
    "warc_chunked_extraction",
    # round-13 continuation: Avro OCF container walk (varint metadata
    # map, sync chain, per-block record decode, null/deflate codecs)
    "avro_container_meta",
    "warc_cdx_index",
    # round-13 continuation: main-content extraction (jusText-style
    # block segmentation + link-density boilerplate removal)
    "html_main_content",
    # round-13 continuation: ORC postscript/footer audit (generic
    # protobuf wire walk over pyarrow-written files)
    "orc_footer_audit",
    # round-13 continuation: hybrid-reference PDFs (/XRefStm)
    "pdf_hybrid_xref_meta",
)


def time_query(fn, spark, sf_dir: str, reps: int | None = None) -> dict:
    def once() -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        return time.perf_counter() - t0

    warmup = once()
    times = [once() for _ in range(reps if reps is not None else REPS)]
    mean = statistics.mean(times)
    stdev = statistics.stdev(times) if len(times) > 1 else 0.0
    return {
        "warmup": round(warmup, 4),
        "mean": round(mean, 4),
        # the scaling/ladder tables read the median: a single in-run
        # GC storm at 5 reps can multiply the mean (r8: minhash sf0.3
        # published 9.6 s mean / stdev 5.6 while an exclusive re-check
        # measured ~2.1 s — above the measured sf1.0 point, which is
        # physically impossible) and flip the superlinearity flags.
        # The headline metric stays mean-of-reps for longitudinal and
        # reference comparability.
        "median": round(statistics.median(times), 4),
        "stdev": round(stdev, 4),
        "ci95": round(1.96 * stdev / (len(times) ** 0.5), 4),
    }


def time_engine(fn, spark, sf_dir: str, reps: int = 3) -> float:
    """Engine-only timing: execute the FULL physical plan (including
    final sorts) into the noop sink — no driver-side row transfer.
    The official metric stays collect()-timed (the reference's
    cursor.execute + fetchall window, kept for longitudinal
    comparability); this companion isolates distributed compute from
    result materialization. r7 finding: the two sessionization
    headliners return ~1M session rows at sf1.0 and 84-87% of their
    collect-timed cost is PySpark Row deserialization on the driver —
    engine time is 1.1-1.4 s and grows at exponent 0.13-0.24, so the
    'steepest curves' in the scaling report are fetch-bound, not a
    shuffle bottleneck (PLANS.md: sessionize_events)."""

    def once() -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    once()  # warmup
    return round(min(once() for _ in range(reps)), 4)


def _sf_of(sf_dir: str) -> float | str:
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return float(sf) if sf.replace(".", "").isdigit() else sf


def run_scale(
    spark, sf_dir: str, reps: int, high_reps: bool = False,
    engine_split: bool = False,
) -> tuple[dict, dict]:
    """Time the headline set at one scale; returns (per_query, detail).
    With high_reps (the headline scale only), queries in HIGH_REPS get
    max(HIGH_REPS[name], reps) repetitions. With engine_split (the
    headline scale only, VERDICT r7 item 7), every detail row also
    carries `engine_s` — the noop-sink companion — so a fetch-bound
    collect number (e.g. the sessionization pair's ~1M result rows)
    can't be misread as distributed-compute cost."""
    queries = registry.all_queries()
    detail: dict[str, dict] = {}
    per_query: dict[str, float] = {}
    for name in HEADLINE:
        n = (
            max(HIGH_REPS.get(name, 0), reps)
            if high_reps and HIGH_REPS_ENABLED
            else reps
        )
        stats = time_query(queries[name], spark, sf_dir, reps=n)
        stats["reps"] = n
        if engine_split:
            stats["engine_s"] = time_engine(
                queries[name], spark, sf_dir, reps=2
            )
        detail[name] = stats
        per_query[name] = stats["mean"]
        # r14 (VERDICT r13 items 1/5 — unpersist discipline): drop
        # every cached frame the query registered before the next
        # query runs. In-query persist() sites are lazily consumed so
        # the operators cannot release them; without this, 91 queries'
        # InMemoryRelations accumulate in executor storage for the
        # whole bench (at larger SFs they evict and distort the late
        # queries). OUTSIDE the timed region: each query's own warmup
        # rep rebuilds its own caches, reps stay warm-cache like the
        # reference methodology. Honesty note: queries that previously
        # inherited a SHARED subplan cache from an earlier query (e.g.
        # the minhash shingle frame) now pay their own warmup build —
        # that cost lands in `warmup`, not the timed mean.
        # BENCH_CLEAR_CACHE=0 restores the pre-r14 accumulate-forever
        # behavior, kept ONLY so the methodology delta itself can be
        # measured and reported; publication runs leave it unset.
        if CLEAR_CACHE:
            spark.catalog.clearCache()
    return per_query, detail


# --------------------------------------------------------------------------
# Ambient-noise canary (VERDICT r9 item 4): two rounds of ±18% host
# drift on UNTOUCHED queries made cross-round raw sums unreadable.
# A fixed probe set — scan-bound, CPU-bound, shuffle-bound — is timed
# at the START and END of every publication run; ambient_index is the
# geometric mean of (measured / pinned-reference) medians, so a reader
# can divide any raw time by it to separate host weather from code.
# CANARY_REF pins the r10 exclusive publication run's own medians at
# sf0.1 (index ≡ 1.0 that round by construction); it must NEVER be
# re-pinned, or the yardstick moves with the weather it measures.
CANARY_QUERIES = ("q1_time_filter", "stats_moments",
                  "skew_join_order_revenue")
# r12 protocol change (VERDICT r11 item 5, after two consecutive
# rounds published under drifty ambient): (a) the bracket is LONGER
# (5 reps, median — the index itself was a 3-sample median of ~0.1 s
# queries, noisy at exactly the 10% the gate tests); (b) a MID
# bracket lands right after the headline phase, and the publication
# gate + value_normalized key on the START↔MID pair that actually
# brackets the headline — a host shift during the sf0.3/sf1.0
# ladders (the longest phase, AFTER the headline is already measured)
# no longer forces a 50-minute re-run or poisons the headline
# normalization. drift_within_run (start↔end) is still published as
# the whole-run weather signal.
CANARY_REPS = 5
# Publication runs re-measure (up to this many passes) when the
# within-run ambient drift exceeds the gate (VERDICT r10 item 7).
DRIFT_GATE = 1.10
DRIFT_GATE_ATTEMPTS = 2
# The references are only meaningful at this scale: a repointed
# SPARK_GRAFT_SF_DIR run skips the canary rather than publishing a
# normalized headline against the wrong yardstick.
CANARY_REF_SF = 0.1
CANARY_REF = {
    # Medians (s): the r10 exclusive PUBLICATION run's own start/end
    # averages — pinned from the regime the index is used in (a
    # deep-warm full run; a shallow 2-pass pre-pin read 1.37x slower
    # and would have biased every future index by that constant).
    # r10's published ambient_index ≡ 1.0 by construction; FIXED from
    # r10 onward — re-pinning would move the yardstick with the
    # weather it measures. (Two provisional value sets existed
    # mid-r10; no cross-round artifact was published against them.)
    "q1_time_filter": 0.1044,
    "stats_moments": 0.9516,
    "skew_join_order_revenue": 0.388,
}


def run_canary(spark, sf_dir: str, qmap) -> dict:
    out = {}
    for name in CANARY_QUERIES:
        fn = qmap[name]
        fn(spark, sf_dir).collect()  # warm
        ts = []
        for _ in range(CANARY_REPS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            ts.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(ts), 4)
    return out


def canary_index(probe: dict) -> float | None:
    ratios = [
        probe[n] / CANARY_REF[n]
        for n in CANARY_QUERIES
        if CANARY_REF.get(n) and probe.get(n)
    ]
    if not ratios:
        return None
    return round(statistics.geometric_mean(ratios), 4)


def _measure_once(spark, sf_dir, qmap, ladder_dirs):
    """One full measurement pass (canary bracket + ladders + headline).
    Split out of main() so the publication drift gate can re-run the
    whole pass when the host shifted mid-run (VERDICT r10 item 7)."""
    # canary only at the pinned reference scale — normalizing a
    # repointed-sf run against sf0.1 medians would publish a
    # meaningless value_normalized (r10 self-review finding)
    canary_on = _sf_of(sf_dir) == CANARY_REF_SF
    canary_start = run_canary(spark, sf_dir, qmap) if canary_on else {}

    ladder: dict[str, float] = {}
    ladder_detail: dict[str, dict] = {}
    for d in ladder_dirs:
        pq, det = run_scale(spark, d, reps=max(2, REPS // 2))
        ladder[str(_sf_of(d))] = round(sum(pq.values()), 4)
        ladder_detail[str(_sf_of(d))] = det

    per_query, detail = run_scale(
        spark, sf_dir, REPS, high_reps=True, engine_split=True
    )
    total = round(sum(per_query.values()), 4)
    # MID ambient bracket: closes the (start → headline) window the
    # publication gate and value_normalized key on (r12 protocol
    # change — see CANARY_REPS comment)
    canary_mid = run_canary(spark, sf_dir, qmap) if canary_on else {}

    # High-end ladder point (VERDICT r4 item 7): the expensive
    # headliners only, at a generated 3× replica of sf0.1 (see
    # tools/gen_ladder.py) — confirms the top of the scaling curve
    # that the sf0.01→sf0.1 step only suggests. Skipped silently when
    # the replica hasn't been generated.
    high_dir = os.environ.get(
        "SPARK_GRAFT_SF_HIGH",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".ladder", "sf0.3"),
    )
    high: dict[str, float] = {}
    high_detail: dict[str, dict] = {}
    high_sf = _sf_of(high_dir)
    if os.path.isdir(high_dir):
        for name in HIGH_LADDER_QUERIES:
            n = 5 if name in SF1_LADDER_QUERIES else 3
            stats = time_query(qmap[name], spark, high_dir, reps=n)
            stats["reps"] = n
            high_detail[name] = stats
            high[name] = stats["median"]
    # sf1.0 point for the six heaviest (VERDICT r5 item 5): 10-replica
    # build of sf0.1 — the top of the scaling curve. Skipped silently
    # when the replica hasn't been generated (tools/gen_ladder.py 1.0).
    sf1_dir = os.environ.get(
        "SPARK_GRAFT_SF_FULL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".ladder", "sf1.0"),
    )
    sf1: dict[str, float] = {}
    sf1_detail: dict[str, dict] = {}
    sf1_sf = _sf_of(sf1_dir)
    if os.path.isdir(sf1_dir):
        for name in SF1_LADDER_QUERIES:
            stats = time_query(qmap[name], spark, sf1_dir, reps=3)
            stats["reps"] = 3
            # engine-only companion at both ends of the 10× step: the
            # collect-vs-noop split shows whether a steep curve is
            # distributed compute or driver result-fetch
            stats["engine_s"] = time_engine(qmap[name], spark, sf1_dir)
            # keyed by the HEADLINE dir's actual sf, not a hardcoded
            # "sf0.1" — with SPARK_GRAFT_SF_DIR repointed, a point
            # published under the wrong scale name defeats the ladder
            stats[f"engine_s_sf{_sf_of(sf_dir)}"] = time_engine(
                qmap[name], spark, sf_dir
            )
            sf1_detail[name] = stats
            sf1[name] = stats["median"]

    # END ambient bracket AFTER the sf0.3/sf1.0 ladders — they are the
    # longest phase of a publication run, and a host shift during them
    # must land in drift_within_run (r10 self-review finding; the
    # first draft bracketed only the headline section)
    canary_end = run_canary(spark, sf_dir, qmap) if canary_on else {}
    idx_start, idx_end = canary_index(canary_start), canary_index(canary_end)
    idx_mid = canary_index(canary_mid)
    ambient = {
        "queries": list(CANARY_QUERIES),
        "ref": CANARY_REF,
        "canary_sf": CANARY_REF_SF if canary_on else None,
        "start": canary_start,
        "mid": canary_mid,
        "end": canary_end,
        "index_start": idx_start,
        "index_mid": idx_mid,
        "index_end": idx_end,
        # whole-run average (kept for cross-round continuity)
        "ambient_index": (
            round((idx_start + idx_end) / 2, 4)
            if idx_start and idx_end else None
        ),
        # the bracket that actually surrounds the headline phase —
        # value_normalized divides by THIS (r12 protocol change)
        "headline_ambient_index": (
            round((idx_start + idx_mid) / 2, 4)
            if idx_start and idx_mid else None
        ),
        # the publication gate keys on this pair (r12): a shift during
        # the post-headline sf0.3/sf1.0 ladders doesn't invalidate the
        # already-measured headline
        "drift_headline": (
            round(max(idx_start, idx_mid) / min(idx_start, idx_mid), 4)
            if idx_start and idx_mid else None
        ),
        # >~1.2 means the host shifted DURING the run — treat even
        # normalized numbers with suspicion that round
        "drift_within_run": (
            round(max(idx_start, idx_end) / min(idx_start, idx_end), 4)
            if idx_start and idx_end else None
        ),
    }
    return dict(ladder=ladder, ladder_detail=ladder_detail,
                per_query=per_query, detail=detail, total=total,
                high=high, high_detail=high_detail, high_sf=high_sf,
                sf1=sf1, sf1_detail=sf1_detail, sf1_sf=sf1_sf,
                ambient=ambient)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench")

    # Scaling ladder (reference PDF §4 methodology: same queries at
    # increasing data scales). Smaller scales run fewer reps — they
    # exist to show the curve, not the headline number.
    ladder_dirs = [
        d
        for d in os.environ.get(
            "SPARK_GRAFT_SF_LADDER",
            os.pathsep.join(
                ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
            ),
        ).split(os.pathsep)
        if d and os.path.isdir(d) and os.path.abspath(d) != os.path.abspath(sf_dir)
    ]
    # Session-level warmup: run every headline query once, untimed, at
    # the smallest available scale. Per-query warmup reps (time_query)
    # don't cover session-wide JVM/JIT/codegen-cache effects, which
    # otherwise land in whichever scale runs first and invert the
    # scaling curve (r2 observation: sf0.001 timed slower than sf0.01).
    warm_dir = min(
        ladder_dirs + [sf_dir],
        key=lambda d: _sf_of(d) if isinstance(_sf_of(d), float) else 1e9,
    )
    qmap = registry.all_queries()
    for name in HEADLINE:
        qmap[name](spark, warm_dir).collect()
    # the warm-dir caches are dead weight for the timed scales (plans
    # key on the data dir) — release them before measuring (r14)
    spark.catalog.clearCache()

    # Publication drift gate (VERDICT r10 item 7): a run whose ambient
    # canary moved >10% start->end measured two different hosts — the
    # r10 BENCH_DETAIL run drifted 1.19 and was published with only a
    # flag. Now the pass is RE-RUN (bounded retries) instead; if the
    # host never settles, the run is still published but carries an
    # explicit drift_gate failure so no reader mistakes it for clean.
    publish_env = "--publish" in sys.argv or os.environ.get(
        "BENCH_PUBLISH", ""
    ) not in ("", "0")
    attempts: list[dict] = []
    for attempt in range(1, DRIFT_GATE_ATTEMPTS + 1):
        m = _measure_once(spark, sf_dir, qmap, ladder_dirs)
        # r12: gate on the bracket surrounding the headline phase
        # (start↔mid); fall back to start↔end when no mid bracket ran
        drift = m["ambient"].get("drift_headline") or m["ambient"].get(
            "drift_within_run"
        )
        m["ambient"]["drift_gate"] = {
            "threshold": DRIFT_GATE,
            "attempt": attempt,
            "passed": drift is None or drift <= DRIFT_GATE,
        }
        attempts.append(m)
        if not publish_env or drift is None or drift <= DRIFT_GATE:
            break
        print(
            f"bench: drift_headline {drift} > {DRIFT_GATE} "
            f"(attempt {attempt}/{DRIFT_GATE_ATTEMPTS})"
            + (" — re-measuring" if attempt < DRIFT_GATE_ATTEMPTS
               else " — publishing the cleanest attempt with "
                    "drift_gate.passed=false"),
            file=sys.stderr,
        )
    # r13 protocol (VERDICT r12 item 9): when the gate never passes,
    # publish the attempt whose HEADLINE bracket was cleanest (lowest
    # drift), and record every attempt's normalized headline plus
    # their median — the committed number then reflects the calmest
    # weather observed, not whichever attempt happened to run last.
    def _drift_of(a: dict) -> float:
        return (a["ambient"].get("drift_headline")
                or a["ambient"].get("drift_within_run") or 0.0)

    m = min(attempts, key=_drift_of)
    m["ambient"]["drift_gate"]["attempts_run"] = len(attempts)
    if len(attempts) > 1:
        norms = [
            round(a["total"] / idx, 4)
            for a in attempts
            if (idx := (a["ambient"].get("headline_ambient_index")
                        or a["ambient"].get("ambient_index")))
        ]
        m["ambient"]["attempts_normalized"] = norms
        if norms:
            m["ambient"]["value_normalized_median"] = round(
                statistics.median(norms), 4
            )
    ladder = m["ladder"]; ladder_detail = m["ladder_detail"]
    per_query = m["per_query"]; detail = m["detail"]; total = m["total"]
    high = m["high"]; high_detail = m["high_detail"]; high_sf = m["high_sf"]
    sf1 = m["sf1"]; sf1_detail = m["sf1_detail"]; sf1_sf = m["sf1_sf"]
    ambient = m["ambient"]

    # headline scale is the third ladder point (BASELINE.md Tables 1-5
    # style 3-point scaling curve) — measured once, reported in both.
    ladder[str(_sf_of(sf_dir))] = total
    ladder_detail[str(_sf_of(sf_dir))] = detail
    # Reference context (BASELINE.md, PDF Table 5 @100% of its 187K-row
    # corpus): mean latencies Q1 0.730 + Q2 5.064 + Q3 8.091 + Q4 10.533.
    # Our q1..q4 parity twins are directly comparable; the rest of the
    # headline set has no reference counterpart (reference ran 4 queries).
    parity_total = round(
        sum(per_query[q] for q in ("q1_time_filter", "q2_hourly_avg",
                                   "q3_union_cube", "q4_join_hourly")), 4)

    # Scaling report (VERDICT r5 item 5): per-query growth ratios and
    # log-scale exponents across the generated ladder points. exponent
    # 1.0 = linear in data size; the flag marks anything growing >1.5×
    # per 3× data (the verdict's drift threshold) — on a fixed-resource
    # box constant overheads usually keep ratios well below 3.
    import math

    # Scaling rows use the MEDIAN at every point (see time_query):
    # growth ratios between a mean and a storm-inflated mean flag
    # phantom superlinearity. The headline metric above stays mean.
    scaling: dict[str, dict] = {}
    for name in HIGH_LADDER_QUERIES:
        base = detail.get(name, {}).get("median")
        if not base:
            continue
        row: dict[str, float | bool] = {"sf0.1": base}
        if name in high:
            row["sf0.3"] = high[name]
            row["ratio_3x"] = round(high[name] / base, 3)
            row["exp_3x"] = round(math.log(high[name] / base) / math.log(3), 3)
        if name in sf1:
            row["sf1.0"] = sf1[name]
            row["ratio_10x"] = round(sf1[name] / base, 3)
            row["exp_10x"] = round(
                math.log(sf1[name] / base) / math.log(10), 3
            )
        # Growth-ratio gate, not a superlinearity test: fires when cost
        # grows >1.5x per 3x data (exponent ~0.37) — the verdict's drift
        # threshold. A true superlinearity flag would compare exp_3x /
        # exp_10x against 1.0; that is reported alongside for readers.
        row["flag_steep_growth"] = bool(row.get("ratio_3x", 0) > 1.5)
        row["flag_superlinear_exp"] = bool(
            row.get("exp_3x", 0) > 1.0 or row.get("exp_10x", 0) > 1.0
        )
        # engine-only exponent over the 10× step, when measured: the
        # collect-timed exponent above includes O(result_rows) driver
        # fetch; this one is the distributed-compute growth the 100 TB
        # claim actually rests on
        eng1 = sf1_detail.get(name, {}).get("engine_s")
        eng01 = sf1_detail.get(name, {}).get(f"engine_s_sf{_sf_of(sf_dir)}")
        # `is not None`: a sub-resolution noop run legitimately rounds
        # to 0.0 and must be REPORTED, not silently omitted (the
        # exponent is skipped — log of 0 — but the points stay visible)
        if eng1 is not None and eng01 is not None:
            row[f"engine_sf{_sf_of(sf_dir)}"] = eng01
            row[f"engine_sf{sf1_sf}"] = eng1
            if eng1 > 0 and eng01 > 0:
                try:
                    ratio = float(sf1_sf) / float(_sf_of(sf_dir))
                    row["engine_exp_10x"] = round(
                        math.log(eng1 / eng01) / math.log(ratio), 3
                    )
                except (TypeError, ValueError, ZeroDivisionError):
                    pass
        scaling[name] = row

    # Layout-payoff table (VERDICT r5 item 9): files/row-groups a
    # footer-stats reader skips under time+user and user-only
    # predicates for plain vs time-sorted vs z-ordered layouts of the
    # events table — the z-order component's evidence. Layout builds
    # are cached under .ladder/; the measurement itself is ~1 s.
    try:
        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
        )
        from layoutstats import layout_skip_report

        layout_root = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            ".ladder",
            f"layouts-{os.path.basename(sf_dir.rstrip('/'))}",
        )
        layout_skip = layout_skip_report(spark, sf_dir, layout_root)
    except Exception as e:  # measurement is evidence, not a gate
        layout_skip = {"error": repr(e)}

    repo_dir = os.path.dirname(os.path.abspath(__file__))
    publish = "--publish" in sys.argv or os.environ.get(
        "BENCH_PUBLISH", ""
    ) not in ("", "0")
    detail_path = (
        os.path.join(repo_dir, "BENCH_DETAIL.json")
        if publish
        else os.path.join(repo_dir, ".ladder", "BENCH_DETAIL.scratch.json")
    )
    os.makedirs(os.path.dirname(detail_path), exist_ok=True)
    with open(detail_path, "w") as f:
        json.dump(
            {
                "reps": REPS,
                "sf": _sf_of(sf_dir),
                "detail": detail,
                "ladder_detail": ladder_detail,
                "high_ladder_sf": high_sf if high_detail else None,
                "high_ladder_detail": high_detail,
                "sf1_ladder_sf": sf1_sf if sf1_detail else None,
                "sf1_ladder_detail": sf1_detail,
                "scaling": scaling,
                "ambient": ambient,
                "layout_skip": layout_skip,
                "baseline": {
                    "reference_parity_total_s_at_100pct": 24.418,
                    "ours_parity_total_s": parity_total,
                    "n_headline_queries": len(HEADLINE),
                },
            },
            f,
            indent=1,
        )

    # The driver tail-captures stdout and parses the LAST line as JSON —
    # keep it SMALL. r6 lesson: widening the high-ladder dicts pushed
    # the line past the driver's tail window and BENCH_r06.json came
    # back `parsed: None`. r12 lesson (VERDICT r12 What's-wrong #1): the
    # 77-entry `queries` map alone blew past the window even after the
    # `ladder` pop — the guard must bound the line HARD, not pop one key
    # and hope. Strategy: parity four always present in `queries`; the
    # remaining headliners are added only while the encoded line stays
    # under LINE_BUDGET. Full per-query map lives in BENCH_DETAIL.json.
    LINE_BUDGET = 1800
    parity_q = ("q1_time_filter", "q2_hourly_avg",
                "q3_union_cube", "q4_join_hourly")
    summary = {
        "metric": "sum_of_mean_latencies_headline",
        "value": total,
        "unit": "sec",
        "queries": {k: round(per_query[k], 3) for k in parity_q
                    if k in per_query},
        "sf": _sf_of(sf_dir),
        "parity_total": parity_total,
        "n_queries": len(per_query),
        "queries_truncated": True,  # flipped below if everything fits
        "ambient_index": ambient["ambient_index"],
        # normalized by the bracket that surrounds the headline phase
        # (r12 protocol change); falls back to the whole-run index
        "value_normalized": (
            round(total / (ambient.get("headline_ambient_index")
                           or ambient["ambient_index"]), 4)
            if (ambient.get("headline_ambient_index")
                or ambient["ambient_index"])
            else None
        ),
    }
    line = json.dumps(summary, separators=(",", ":"))
    # Greedily admit the remaining queries (slowest first — the ones a
    # reader wants) while the line stays inside the budget.
    rest = sorted(
        (k for k in per_query if k not in summary["queries"]),
        key=lambda k: -per_query[k],
    )
    for k in rest:
        summary["queries"][k] = round(per_query[k], 3)
        candidate = json.dumps(summary, separators=(",", ":"))
        if len(candidate) > LINE_BUDGET:
            del summary["queries"][k]
            break
        line = candidate
    if len(summary["queries"]) == len(per_query):
        summary["queries_truncated"] = False
        line = json.dumps(summary, separators=(",", ":"))
    assert len(line) <= 2000, "bench summary line exceeded tail window"
    sys.stdout.flush()
    print(line, flush=True)


if __name__ == "__main__":
    main()
