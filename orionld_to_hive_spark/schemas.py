"""Fixed StructTypes for the engine's data shapes.

Derived from the reference's three data layers (SURVEY.md §1):
  - readings: the unified queryable fact table replacing the six per-room
    Hive tables (`hive.py:32-38` + the `room` tag from `hive.py:70-80`).
  - raw TSV: headerless (epoch_seconds, value) sensor files
    (`insert.py:74`).
  - NGSI-LD notification: the streaming payload received at
    `subscriber.py:104-123`, shape per `real_time_data_simulator.py:42-48`.
"""

from __future__ import annotations

from pyspark.sql import types as T

ROOMS = ("kitchen", "room1", "room2", "room3", "bathroom", "toilet")
SENSORS = ("temperature", "humidity", "brightness")

# One fact table, partitioned by room, replaces six per-room tables; the
# reference's 6-way UNION ALL (`hive.py:69-81`) becomes a plain scan.
READINGS_SCHEMA = T.StructType(
    [
        T.StructField("room", T.StringType(), False),
        T.StructField("entityid", T.StringType(), True),
        T.StructField("temperature", T.DoubleType(), True),  # sparse
        T.StructField("humidity", T.IntegerType(), True),  # sparse
        T.StructField("brightness", T.DoubleType(), True),  # sparse
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Headerless tab-separated (epoch, value) per `insert.py:74`.
RAW_TSV_SCHEMA = T.StructType(
    [
        T.StructField("epoch_s", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def _property_struct() -> T.StructType:
    # NGSI-LD Property: {"type": "Property", "value": x, "observedAt": iso}
    return T.StructType(
        [
            T.StructField("type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("observedAt", T.StringType(), True),
        ]
    )


# Orion-LD notification envelope: {"id", "type", "subscriptionId",
# "data": [entity, ...]} — entities carry sparse Property attributes.
NGSI_NOTIFICATION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("subscriptionId", T.StringType(), True),
        T.StructField(
            "data",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType(), True),
                        T.StructField("type", T.StringType(), True),
                        T.StructField("temperature", _property_struct(), True),
                        T.StructField("humidity", _property_struct(), True),
                        T.StructField("brightness", _property_struct(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)
