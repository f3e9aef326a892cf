"""Streaming per-user EWMA: the stateful twin of
``operators/events.user_ewma`` (E16).

State per user is two numbers — the running EWMA and the count — the
O(1) footprint the batch docstring promises for unbounded history
(the batch form folds the user's full event list; the stream never
re-reads it). Each micro-batch folds its time-ordered values into the
carried EWMA with the identical ``α·v + (1−α)·acc`` recurrence, so the
final snapshot per user equals the batch fold exactly (same operations
in the same order — IEEE determinism, not tolerance).

**Ordering assumption**: exact parity holds only when micro-batches
arrive in per-user event-time order (true for this repo's availableNow
file source). An out-of-order feed needs a watermark-delayed reorder
buffer upstream — an EWMA folds values in time order by definition and
a late value cannot be retro-folded into the carried state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, LongType, StructField,
                               StructType)

from birli_spark.operators.events import EWMA_ALPHA
from birli_spark.streaming.windows import read_events_stream

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("first_value", DoubleType()),
    StructField("ewma", DoubleType()),
])

STATE_SCHEMA = StructType([
    StructField("ewma", DoubleType()),
    StructField("first_value", DoubleType()),
    StructField("n", LongType()),
])


def _ewma_update(user_id: int, ev: pd.DataFrame,
                 prev: tuple | None) -> tuple[pd.DataFrame, tuple]:
    """Pure transition: fold the batch's (time, event_id)-ordered values
    into the carried EWMA with plain Python floats (= IEEE doubles, the
    same ops the batch SQL fold performs)."""
    a = float(EWMA_ALPHA)
    srt = ev.sort_values(["ts_us", "event_id"], ignore_index=True)
    vals = [float(v) for v in srt["value"]]
    if prev is None:
        ewma, first, n = vals[0], vals[0], 1
        vals = vals[1:]
    else:
        ewma, first, n = float(prev[0]), float(prev[1]), int(prev[2])
    for v in vals:
        ewma = a * v + (1.0 - a) * ewma
        n += 1
    out = pd.DataFrame([{
        "user_id": int(user_id), "n_events": n,
        "first_value": first, "ewma": ewma,
    }])
    return out, (ewma, first, n)


def ewma_stream(stream: DataFrame) -> DataFrame:
    with_us = stream.selectExpr("user_id", "event_id", "value",
                                "(ts div 1000) AS ts_us")

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        batch = pd.concat(list(pdfs), ignore_index=True)
        prev = tuple(state.get) if state.exists else None
        out, new_state = _ewma_update(user_id, batch, prev)
        state.update(new_state)
        yield out

    return (with_us
            .groupBy("user_id")
            .applyInPandasWithState(
                fn, OUTPUT_SCHEMA, STATE_SCHEMA, "update",
                GroupStateTimeout.NoTimeout))


def latest_snapshots(updates: DataFrame) -> DataFrame:
    """Each user's final (max n_events) snapshot — the batch operator's
    output shape."""
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (updates.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select("user_id", "n_events", "first_value", "ewma"))


def run_available_now(spark: SparkSession, sf_dir: str,
                      query_name: str = "stream_ewma") -> DataFrame:
    out = ewma_stream(read_events_stream(spark, sf_dir))
    from birli_spark.streaming import drain_to_memory
    return drain_to_memory(out, query_name, "update")
