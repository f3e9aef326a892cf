"""Stream-stream interval join — the streaming twin of the batch
attribution operator (operators/events.py::attribution_pairs).

Structured Streaming's stateful equi-join with a time-range condition:
clicks and views are two watermarked event-time streams; each click
joins every view by the same user within the trailing attribution
window. The watermark + range condition bound the join state — views
older than (watermark − window) and clicks older than the watermark are
evicted, so state is O(traffic in one window), not O(history). On a
cluster the state shards across executors via the state store, keyed by
the join's user_id hash.

Batch/stream parity is asserted in tests/test_streaming_joins.py: over
a finite input the drained stream equals the batch band-join exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from birli_spark.operators.events import ATTR_WINDOW_US
from birli_spark.streaming.windows import read_events_stream


def attribution_stream(stream: DataFrame,
                       window_us: int = ATTR_WINDOW_US,
                       watermark: str = "2 hours") -> DataFrame:
    """Clicks ⋈ views (same user, view within ``window_us`` before the
    click, inclusive) as an incremental stream-stream inner join.

    Both sides carry event-time watermarks; the join condition's time
    range lets the engine prove when a buffered row can no longer match
    and evict it. Output mode append: a pair is emitted once, when both
    sides have arrived."""
    ev = stream.withColumn("tt", F.expr("timestamp_micros(ts div 1000)"))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("tt").alias("c_tt"))
              .withWatermark("c_tt", watermark))
    views = (ev.filter(F.col("event_type") == "view")
             .select(F.col("user_id").alias("v_user"),
                     F.col("event_id").alias("view_id"),
                     F.col("tt").alias("v_tt"))
             .withWatermark("v_tt", watermark))
    cond = F.expr(
        "c_user = v_user AND "
        f"v_tt >= c_tt - make_interval(0, 0, 0, 0, 0, 0, {window_us} / 1e6)"
        " AND v_tt <= c_tt")
    return (clicks.join(views, cond)
            .select(F.col("c_user").alias("user_id"),
                    "click_id",
                    F.unix_micros("c_tt").alias("click_tu"),
                    "view_id",
                    F.unix_micros("v_tt").alias("view_tu")))


def run_available_now(spark: SparkSession, sf_dir: str,
                      query_name: str = "attribution_join") -> DataFrame:
    """Drain the finite source through the join into a memory sink."""
    out = attribution_stream(read_events_stream(spark, sf_dir))
    from birli_spark.streaming import drain_to_memory
    return drain_to_memory(out, query_name, "append")
