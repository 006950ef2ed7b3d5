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
    # IVF routes to a whole label cell, so it always fills top-k; LSH
    # buckets hold ~n/2^bits vectors after the r7 hyperplane fix (the
    # pre-fix "full top-k + 0.72 recall" came from all six sign rows
    # being ONE plane — half the corpus per bucket), so sparse buckets
    # may return fewer than k rows. Correlation with the exact answer
    # still guards against degenerate routing, and the multiprobe op
    # is the recall knob (see test_newops_r7).
    assert len(ivf) == 50
    assert 0 < len(lsh) <= 50
    assert len(exact & lsh) / len(exact) >= 0.1
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


def test_decode_wav_roundtrip_and_formats():
    import io
    import struct
    import wave

    import numpy as np

    from orionld_to_hive_spark.operators.multimodal import decode_asset, decode_wav

    pcm = np.array([0, 1000, -1000, 32767, -32768], dtype="<i2")
    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(pcm.tobytes())
    samples, rate = decode_wav(bio.getvalue())
    assert rate == 8000
    assert np.array_equal(samples * 32768.0, pcm.astype(np.float64))

    # stereo averages to mono
    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(np.array([100, 300, -50, -150], dtype="<i2").tobytes())
    samples, _ = decode_wav(bio.getvalue())
    assert np.allclose(samples * 32768.0, [200.0, -100.0])

    # 8-bit PCM: unsigned, centered at 128
    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(16000)
        w.writeframes(bytes([128, 255, 0]))
    samples, _ = decode_wav(bio.getvalue())
    assert np.array_equal(samples * 128.0, [0.0, 127.0, -128.0])

    # odd-sized extra chunk before data must be skipped (word alignment)
    hdr = b"RIFF" + struct.pack("<I", 0) + b"WAVE"
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, 1, 16000, 32000, 2, 16
    )
    junk = b"LIST" + struct.pack("<I", 3) + b"abc\x00"  # padded to 4
    data = b"data" + struct.pack("<I", 2) + struct.pack("<h", 4096)
    samples, _ = decode_wav(hdr + fmt + junk + data)
    assert np.array_equal(samples * 32768.0, [4096.0])

    # non-WAV payloads still refuse loudly
    import pytest

    with pytest.raises(ValueError):
        decode_wav(b"\x89PNG\r\n\x1a\nnotawave")
    # r7: a PNG signature now routes to the real PNG decoder, which
    # rejects the corrupt body loudly; only genuinely unsupported
    # formats stay NotImplementedError
    with pytest.raises(ValueError):
        decode_asset(b"\x89PNG\r\n\x1a\nnotawave")
    with pytest.raises(NotImplementedError):
        decode_asset(b"GIF89a not decodable here")


def test_wav_rms_matches_byte_domain_rescale(spark, sf_smoke):
    """Real-decode WAV rms must equal the raw-byte audio_energy rms / 128
    (the synthesized samples are an exact power-of-two rescale)."""
    from orionld_to_hive_spark.operators.multimodal import (
        multimodal_audio_energy,
        multimodal_wav_rms,
    )

    byte_rows = {
        r.asset_id: r for r in multimodal_audio_energy(spark, sf_smoke).collect()
    }
    wav_rows = {r.asset_id: r for r in multimodal_wav_rms(spark, sf_smoke).collect()}
    assert set(byte_rows) == set(wav_rows)
    for aid, wr in wav_rows.items():
        br = byte_rows[aid]
        assert wr.n_windows == br.n_windows
        assert wr.n_active == br.n_active
        assert abs(wr.max_rms - br.max_rms / 128.0) < 2e-6
        assert abs(wr.mean_rms - br.mean_rms / 128.0) < 2e-6


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
