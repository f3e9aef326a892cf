"""Structured Streaming counterpart of the batch windowed aggregation
(operators/events.py): the same tumbling 1-hour window per event_type,
run incrementally with a watermark for late data.

The reference has no streaming surface (SURVEY.md §2.8); this is the
engine's forward-looking stream path. The batch and streaming forms share
semantics: for a finite input, ``run_available_now`` produces exactly the
batch ``windowed_agg`` rows (asserted in tests/test_streaming.py).

Scale: stateful windowed aggregation keyed (event_type, window) —
watermark bounds state; on a cluster this shards across executors via the
state store. ``withWatermark`` of 2 hours tolerates that much event-time
disorder before a window finalizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType, TimestampNTZType)

from birli_spark.functions.complex import f32
from birli_spark.sources.corpus import with_ts_ns


def events_schema(ts_type=TimestampNTZType()) -> StructType:
    """Stream source schema. ``ts`` defaults to TIMESTAMP_NTZ (the driver
    parquet's current physical type, microseconds); pass ``LongType()``
    for nanos-as-long data. Either way the stream is normalized to int64
    nanos by :func:`read_events_stream` via ``with_ts_ns``."""
    return StructType([
        StructField("event_id", LongType()),
        StructField("ts", ts_type),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ])


EVENTS_SCHEMA = events_schema()


def _ts_is_timestamp(path: str) -> bool:
    """Probe the parquet footer: True if ``ts`` is a (non-nano) timestamp
    column, False for int64 / TIMESTAMP(NANOS) (nanosAsLong) data."""
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq
        t = pq.read_schema(path).field("ts").type
        return pa.types.is_timestamp(t) and t.unit != "ns"
    except Exception:
        return True


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file = one
    micro-batch under availableNow; a production feed would be Kafka).
    Emits ``ts`` as int64 nanoseconds regardless of the file's physical
    timestamp type."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ts_type = (TimestampNTZType()
               if _ts_is_timestamp(f"{sf_dir}/events.parquet")
               else LongType())
    return with_ts_ns(
        spark.readStream
        .schema(events_schema(ts_type))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir))


def windowed_counts(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour event-time window per event_type with a watermark.

    Uses the native ``window()`` operator over a proper timestamp (from
    the nano epoch), so the incremental state machinery applies; output
    is normalized to the batch operator's (event_type, hour_epoch) shape.
    """
    # exact integer division (joins.py's pattern): float `/` promotes
    # the int64 nano epoch to double, whose 53-bit mantissa can round a
    # microsecond-grain timestamp down by one
    with_ts = stream.withColumn(
        "ts_ts", F.expr("timestamp_micros(ts div 1000)"))
    return (with_ts
            .withWatermark("ts_ts", watermark)
            .groupBy(F.window("ts_ts", "1 hour").alias("win"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.expr(f32("SUM(value)")).alias("sum_value"))
            .select("event_type",
                    F.unix_timestamp("win.start").alias("hour_epoch"),
                    "n_events", "sum_value"))


def run_available_now(spark: SparkSession, sf_dir: str,
                      query_name: str = "windowed_counts") -> DataFrame:
    """Drain the finite source with trigger(availableNow) into an
    in-memory sink; returns the completed result as a DataFrame."""
    out = windowed_counts(read_events_stream(spark, sf_dir))
    from birli_spark.streaming import drain_to_memory
    return drain_to_memory(out, query_name, "complete")
