"""Round-7 additions: PII redaction, portable exact quantiles."""

from __future__ import annotations

from pyspark.sql import functions as F

from orionld_to_hive_spark.operators.pipeline import _pii_redact_col


def test_pii_redaction_on_planted_literals(spark):
    rows = [
        ("reach me at jane.doe+spam@corp-mail.example.org today",
         "reach me at [EMAIL] today"),
        ("ssn is 123-45-6789 ok", "ssn is [SSN] ok"),
        ("dial +44-555-0142 now", "dial [PHONE] now"),
        ("cfg: api_key=sk_live_abc123XYZ end", "cfg: [SECRET] end"),
        ("token=short7 stays", "token=short7 stays"),  # <8 chars: no match
        ("a@b.c too short tld", "a@b.c too short tld"),  # 1-char TLD
        ("two hits x@y.io and 999-88-7777 done",
         "two hits [EMAIL] and [SSN] done"),
        ("clean text with no identifiers at all",
         "clean text with no identifiers at all"),
    ]
    df = spark.createDataFrame(rows, ["t", "expect"]).withColumn(
        "red", _pii_redact_col(F.col("t"))
    )
    for r in df.collect():
        assert r.red == r.expect, (r.t, r.red, r.expect)


def test_pii_report_counts_cover_all_pattern_families(spark, sf_smoke):
    from orionld_to_hive_spark.operators.pipeline import pii_redaction_report

    out = pii_redaction_report(spark, sf_smoke).toPandas()
    # every planted family fires somewhere in the corpus, and hit docs
    # never exceed scanned docs
    assert out["n_emails"].sum() > 0
    assert out["n_phones"].sum() > 0
    assert out["n_ssns"].sum() > 0
    assert out["n_secrets"].sum() > 0
    assert (out["docs_with_pii"] <= out["docs"]).all()


def test_png_roundtrip_exercises_all_five_filters():
    import numpy as np

    from orionld_to_hive_spark.operators.multimodal import (
        decode_png,
        encode_png_gray,
    )

    rng = np.random.RandomState(7)
    for n in (0, 1, 5, 31, 32, 33, 64, 200, 1000):
        raw = rng.randint(0, 256, size=n).astype(np.uint8)
        px, w, h, *_ = decode_png(encode_png_gray(raw))
        exp_h = max(1, -(-n // 32))
        assert (w, h) == (32, exp_h)
        exp = np.zeros(exp_h * 32, dtype=np.uint8)
        exp[:n] = raw
        # n=1000 → 32 rows → the 0..4 filter cycle runs 6+ times; a
        # reconstruction bug in ANY filter breaks this equality
        assert np.array_equal(px, exp), n


def test_png_decode_rejects_corruption_and_non_png():
    import numpy as np
    import pytest

    from orionld_to_hive_spark.operators.multimodal import (
        decode_png,
        encode_png_gray,
    )

    good = bytearray(
        encode_png_gray(np.arange(100, dtype=np.uint8))
    )
    good[40] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(good))
    with pytest.raises(ValueError):
        decode_png(b"GIF89a not a png")


def test_quantile_portable_matches_exact_percentile_disc(spark, sf_smoke):
    """The histogram+cumsum quantile equals Spark's own exact
    percentile_disc-style lower quantile computed the naive way."""
    from orionld_to_hive_spark.operators.sketches import (
        quantile_portable_value,
    )
    from orionld_to_hive_spark.sources.warehouse import load_table

    got = {
        r.event_type: r
        for r in quantile_portable_value(spark, sf_smoke).collect()
    }
    ev = (
        load_table(spark, sf_smoke, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    for et, rows in (
        ev.groupBy("event_type")
        .agg(F.sort_array(F.collect_list("value")).alias("vs"))
        .collect()
    ):
        import math

        vs = rows
        for frac, field in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            k = math.ceil(len(vs) * frac)
            assert got[et][field] == vs[k - 1], (et, field)
        assert got[et]["n_values"] == len(vs)


def test_balanced_lsh_on_isotropic_corpus_spreads_and_multiprobe_expands(
    spark,
):
    """On an isotropic (synthetic, seeded) corpus the balanced codes
    spread across the grid and 1-bit XOR probes reach populated
    buckets — multiprobe candidates strictly contain single-probe
    candidates."""
    import numpy as np

    from orionld_to_hive_spark.operators.similarity import (
        EMBED_DIM,
        LSH_BITS,
        balanced_buckets,
    )

    rng = np.random.RandomState(11)
    rows = [
        (i, [float(x) for x in rng.randn(EMBED_DIM)]) for i in range(300)
    ]
    emb = spark.createDataFrame(rows, "vec_id LONG, vec ARRAY<DOUBLE>")
    buckets = {r.vec_id: r.bucket for r in balanced_buckets(emb).collect()}
    import collections

    byb = collections.Counter(buckets.values())
    assert len(byb) > 8  # codes spread, not the 2-bucket degenerate case
    single = sum(byb[buckets[q]] - 1 for q in range(10))
    multi = sum(
        byb[buckets[q]]
        - 1
        + sum(byb.get(buckets[q] ^ (1 << b), 0) for b in range(LSH_BITS))
        for q in range(10)
    )
    assert multi > single  # probes actually reach populated neighbors


def test_lsh_hyperplanes_are_distinct_and_multiprobe_lifts_recall(
    spark, sf_smoke
):
    """Pin the r7 hyperplane fix: the original sign hash never wrapped
    mod p, so all six rows were ONE plane and every corpus collapsed
    to codes {0, 63}. With distinct planes the corpus spreads over the
    grid and multiprobe strictly beats single-probe recall against the
    brute-force reference."""
    import collections

    from orionld_to_hive_spark.operators.similarity import (
        _LSH_SIGNS,
        _emb,
        balanced_buckets,
        ann_bruteforce_topk,
        ann_lsh_topk,
        ann_lsh_multiprobe_topk,
    )

    assert len({tuple(r) for r in _LSH_SIGNS}) == len(_LSH_SIGNS)
    emb = _emb(spark, sf_smoke).select("vec_id", "vec")
    byb = collections.Counter(
        r.bucket for r in balanced_buckets(emb).collect()
    )
    assert len(byb) > 16  # spread across the grid, not 2 codewords
    bf = {
        (r.query_id, r.neighbor_id)
        for r in ann_bruteforce_topk(spark, sf_smoke).collect()
    }
    sp = {
        (r.query_id, r.neighbor_id)
        for r in ann_lsh_topk(spark, sf_smoke).collect()
    }
    mp = {
        (r.query_id, r.neighbor_id)
        for r in ann_lsh_multiprobe_topk(spark, sf_smoke).collect()
    }
    assert len(mp & bf) > len(sp & bf)  # multiprobe lifts recall


def test_cdc_changelog_semantics_against_independent_replay(
    spark, sf_smoke
):
    """Cross-check the CDC ops against a driver-side python replay of
    the changelog (independent of both Spark windows and the DuckDB
    oracle): live/deleted key counts and the one-current-row-per-live-
    key SCD2 invariant."""
    from orionld_to_hive_spark.operators.cdc import (
        _changelog,
        cdc_apply_changelog,
        cdc_scd2_history,
    )

    log = _changelog(spark, sf_smoke)
    rows = log.select("user_id", "ts", "event_id", "is_delete").collect()
    n_del = sum(1 for r in rows if r.is_delete)
    assert 0 < n_del < len(rows)  # both op classes present (~5% deletes)
    last: dict[int, tuple] = {}
    for r in rows:
        k = (r.ts, r.event_id)
        if r.user_id not in last or k > last[r.user_id][0]:
            last[r.user_id] = (k, r.is_delete)
    n_live = sum(1 for _, d in last.values() if not d)

    state = cdc_apply_changelog(spark, sf_smoke).collect()
    assert sum(r.n_live_users for r in state) == n_live
    assert sum(r.n_deleted_users for r in state) == len(last) - n_live

    cur = cdc_scd2_history(spark, sf_smoke).filter("is_current").collect()
    assert len(cur) == n_live  # delete-terminated keys have no current row
    assert len({r.user_id for r in cur}) == n_live  # exactly one each


def test_span_dedup_rewrite_invariants_and_planted_duplicate(
    spark, sf_smoke, tmp_path
):
    """(1) Corpus-wide: removed blocks == total block occurrences minus
    distinct spans (every span keeps exactly its first occurrence,
    including same-doc repeats). (2) Planted: a block shared by two
    docs survives only in the lower doc_id; unique text is untouched."""
    from orionld_to_hive_spark.operators.text import (
        SPAN_TOKENS,
        span_dedup_rewrite,
    )

    out = span_dedup_rewrite(spark, sf_smoke)
    tot = out.agg(
        F.sum("n_blocks").alias("b"), F.sum("n_removed").alias("r")
    ).collect()[0]
    from orionld_to_hive_spark.sources.warehouse import load_table

    docs = load_table(spark, sf_smoke, "documents")
    distinct_spans = (
        docs.select(
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.floor(
                            F.size(F.split("text", " ")) / SPAN_TOKENS
                        ).cast("int")
                        - 1,
                    ),
                    lambda i: F.array_join(
                        F.slice(
                            F.split("text", " "),
                            i * SPAN_TOKENS + 1,
                            SPAN_TOKENS,
                        ),
                        " ",
                    ),
                )
            ).alias("span")
        )
        .filter(F.col("span").isNotNull())
        .distinct()
        .count()
    )
    assert tot.r == tot.b - distinct_spans and tot.r > 0

    dup = " ".join(f"w{i}" for i in range(SPAN_TOKENS))
    uniq = " ".join(f"u{i}" for i in range(SPAN_TOKENS))
    planted = spark.createDataFrame(
        [
            (0, f"{dup} tail0", "en", "s", 1),
            (1, f"{dup} {uniq} tail1", "en", "s", 1),
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    d = str(tmp_path / "sf")
    planted.write.parquet(f"{d}/documents.parquet")
    got = {
        r.doc_id: (r.n_removed, r.cleaned_text)
        for r in span_dedup_rewrite(spark, d).collect()
    }
    assert got[0] == (0, f"{dup} tail0")  # first occurrence kept intact
    assert got[1] == (1, f"{uniq} tail1")  # shared block cut, rest kept


def test_decode_png_paletted_roundtrip_and_guards():
    """Color-type-3 PNGs decode through the PLTE palette to the same
    RGB a truecolor encoding of the identical image yields; invalid
    palettes and tRNS alpha fail loudly."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from orionld_to_hive_spark.operators.multimodal import decode_png

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 7, 7])  # 4 colors
    w, h = 5, 4
    rows = [[(x + y) % 4 for x in range(w)] for y in range(h)]
    raw = b"".join(b"\x00" + bytes(r) for r in rows)  # filter 0 rows

    def build(plte=pal, extra=b""):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
        return (
            sig
            + chunk(b"IHDR", ihdr)
            + chunk(b"PLTE", plte)
            + extra
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    px, gw, gh, *_ = decode_png(build())
    assert (gw, gh) == (w, h)
    want = np.array(
        [pal[3 * rows[y][x] + c] for y in range(h) for x in range(w)
         for c in range(3)],
        dtype=np.uint8,
    )
    assert np.array_equal(px, want)

    with pytest.raises(ValueError, match="palette index"):
        decode_png(build(plte=pal[:9]))  # 3 colors, image uses index 3
    # r8: paletted tRNS now DECODES to RGBA — a short chunk (one entry)
    # sets alpha for index 0 and defaults the rest to opaque, per spec
    pxa, aw, ah, *_ = decode_png(build(extra=chunk(b"tRNS", b"\x80")))
    assert (aw, ah) == (w, h) and pxa.size == w * h * 4
    rgba = pxa.reshape(-1, 4)
    assert np.array_equal(rgba[:, :3].reshape(-1), want)
    alphas = {rows[y][x]: rgba[y * w + x][3]
              for y in range(h) for x in range(w)}
    assert alphas == {0: 0x80, 1: 255, 2: 255, 3: 255}
    with pytest.raises(ValueError, match="tRNS longer"):
        decode_png(build(extra=chunk(b"tRNS", b"\x10" * 5)))


def test_quantile_cont_matches_numpy_linear(spark, sf_smoke):
    """quantile_cont_portable implements type-7 interpolation; numpy's
    default percentile is the independent reference (the DuckDB oracle
    shares our formula, so it alone can't catch a shared bug)."""
    import numpy as np

    from orionld_to_hive_spark.operators.sketches import (
        quantile_cont_portable,
    )
    from orionld_to_hive_spark.sources.warehouse import load_table

    got = {
        r.event_type: (r.n_values, r.q50, r.q95, r.q99)
        for r in quantile_cont_portable(spark, sf_smoke).collect()
    }
    rows = (
        load_table(spark, sf_smoke, "events")
        .select("event_type", "value")
        .filter("value IS NOT NULL")
        .collect()
    )
    by_type: dict[str, list[float]] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.value)
    assert set(got) == set(by_type)
    for et, vs in by_type.items():
        arr = np.array(sorted(vs))
        n, q50, q95, q99 = got[et]
        assert n == len(vs)
        for frac, q in ((0.5, q50), (0.95, q95), (0.99, q99)):
            ref = float(np.percentile(arr, frac * 100))
            assert abs(q - ref) < 1e-9, (et, frac, q, ref)


def test_hll_sliding_merge_equals_recount_per_window(spark, sf_smoke):
    """Mergeability law: the 7-day sliding estimate built by MERGING
    daily registers must equal the estimate you'd get by recounting
    the raw events of that window through the same sketch."""
    from orionld_to_hive_spark.operators.sketches import (
        _hll_daily_registers,
        hll_sliding_window_ndv,
    )

    out = hll_sliding_window_ndv(spark, sf_smoke).collect()
    assert out
    daily = _hll_daily_registers(spark, sf_smoke).collect()
    import collections
    import datetime

    regs: dict[tuple, dict[int, int]] = collections.defaultdict(dict)
    for r in daily:
        k = (r.event_type, r.day)
        regs[k][r.bucket] = max(regs[k].get(r.bucket, 0), r.rho)
    # python re-merge for three sampled output rows
    for r in (out[0], out[len(out) // 2], out[-1]):
        merged: dict[int, int] = {}
        for d in range(7):
            day = r.day - datetime.timedelta(days=d)
            for b, rho in regs.get((r.event_type, day), {}).items():
                merged[b] = max(merged.get(b, 0), rho)
        assert len(merged) == r.registers_used


def test_growth_accounting_invariants(spark, sf_smoke):
    """Conservation laws: active = new + retained + resurrected each
    day; every activity RUN starts as new-or-resurrected and ends in
    exactly one churn, so the lifetime totals match; total new equals
    distinct users."""
    from orionld_to_hive_spark.operators.analytics import growth_accounting
    from orionld_to_hive_spark.sources.warehouse import load_table

    rows = growth_accounting(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r.n_active == r.n_new + r.n_retained + r.n_resurrected
    assert sum(r.n_new for r in rows) == (
        load_table(spark, sf_smoke, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.n_churned_after for r in rows) == sum(
        r.n_new + r.n_resurrected for r in rows
    )
