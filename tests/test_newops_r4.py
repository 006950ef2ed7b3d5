"""Round-4 operator units: source KL divergence properties and
streaming redelivery dedup."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

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


def test_stream_dedup_drops_redelivered_notifications(spark, tmp_path):
    """A broker retry redelivers the same notification (same entity +
    observedAt, later arrival): the stream must emit the reading ONCE,
    matching the batch dropDuplicates twin, while genuinely new
    readings pass through."""
    from orionld_to_hive_spark.schemas import NGSI_NOTIFICATION_SCHEMA
    from orionld_to_hive_spark.streaming.ingest import (
        parse_notifications,
        read_notification_stream,
    )
    from orionld_to_hive_spark.streaming.stream_dedup import (
        dedup_notifications,
    )

    def notif(room, iso, temp):
        return json.dumps(
            {
                "id": "urn:ngsi-ld:Notification:1",
                "type": "Notification",
                "subscriptionId": "urn:ngsi-ld:Subscription:r4",
                "data": [
                    {
                        "id": f"urn:ngsi-ld:{room}:{room}",
                        "type": room,
                        "temperature": {
                            "type": "Property",
                            "value": temp,
                            "observedAt": iso,
                        },
                    }
                ],
            }
        )

    in_dir = tmp_path / "dedup_in"
    in_dir.mkdir()
    (in_dir / "f1.json").write_text(
        notif("Kitchen", "2024-01-01T00:10:00.000Z", 20.0) + "\n"
    )
    time.sleep(0.05)
    # redelivery in a LATER micro-batch (same entity + observedAt) plus
    # one genuinely new reading
    (in_dir / "f2.json").write_text(
        notif("Kitchen", "2024-01-01T00:10:00.000Z", 20.0)
        + "\n"
        + notif("Kitchen", "2024-01-01T00:12:00.000Z", 21.0)
        + "\n"
    )

    parsed = read_notification_stream(
        spark, str(in_dir), max_files_per_trigger=1
    )
    q = (
        dedup_notifications(parsed)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None, q.exception()

    streamed = [
        (r.entityid, str(r.event_ts), r.temperature)
        for r in spark.sql(
            "SELECT * FROM dedup_out ORDER BY event_ts"
        ).collect()
    ]
    assert streamed == [
        ("urn:ngsi-ld:Kitchen:Kitchen", "2024-01-01 00:10:00", 20.0),
        ("urn:ngsi-ld:Kitchen:Kitchen", "2024-01-01 00:12:00", 21.0),
    ]

    # batch twin: same rows, same identity-keyed dedup
    lines = [
        p.read_text().strip() for p in sorted(in_dir.glob("*.json"))
    ]
    raw = spark.read.schema(NGSI_NOTIFICATION_SCHEMA).json(
        spark.sparkContext.parallelize(
            [ln for blob in lines for ln in blob.splitlines()]
        )
    )
    batch = [
        (r.entityid, str(r.event_ts), r.temperature)
        for r in parse_notifications(raw)
        .dropDuplicates(["entityid", "event_ts"])
        .orderBy("event_ts")
        .collect()
    ]
    assert streamed == batch
