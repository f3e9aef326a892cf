"""Custom stateful streaming operator: incremental gap-based
sessionization via ``applyInPandasWithState`` — the streaming counterpart
of operators/events.sessionize (and the ``applyInPandasWithState``
showcase the reference, a batch pipeline, has no analogue of).

State per user: (last event micro-epoch, current session sequence number,
open-session accumulators). Each micro-batch merges its events into the
open session or starts new ones, emits every session touched in the batch
(output mode ``update`` — downstream sinks upsert on (user_id,
session_seq)), and persists the open tail. The pure-pandas transition
function :func:`_session_update` is separated from the Spark wiring so
multi-batch continuation is unit-testable without a streaming harness.

Scale: state is O(users), sharded by the state store across executors;
an event-time timeout (`GroupStateTimeout.EventTimeTimeout` + watermark)
would finalize idle sessions and bound state for infinite streams — the
finite-source form here keeps NoTimeout and emits on every batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, IntegerType, LongType, StructField,
                               StructType)

from birli_spark.operators.events import SESSION_GAP_US
from birli_spark.streaming.windows import read_events_stream

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_seq", IntegerType()),
    StructField("n_events", LongType()),
    StructField("start_us", LongType()),
    StructField("end_us", LongType()),
    StructField("sum_value", DoubleType()),
])

#: (last_ts_us, session_seq, n_events, start_us, sum_value) of the open tail
STATE_SCHEMA = StructType([
    StructField("last_ts_us", LongType()),
    StructField("session_seq", IntegerType()),
    StructField("n_events", LongType()),
    StructField("start_us", LongType()),
    StructField("sum_value", DoubleType()),
])


def _session_update(user_id: int, events: pd.DataFrame,
                    prev: tuple | None,
                    gap_us: int = SESSION_GAP_US) -> tuple[pd.DataFrame, tuple]:
    """Pure transition function: merge a batch of events (any order) into
    the session state → (sessions touched this batch, new state).

    ``sum_value`` accumulates in f64; the emitted value is f32-demoted to
    match the batch operator exactly.
    """
    ev = events.sort_values(["ts_us", "event_id"], ignore_index=True)
    ts = ev["ts_us"].to_numpy(np.int64)
    val = ev["value"].to_numpy(np.float64)
    if prev is None:
        last, seq, n, start, acc = None, 0, 0, 0, 0.0
    else:
        last, seq, n, start, acc = prev
    out = []
    for i in range(len(ev)):
        if last is None or ts[i] - last > gap_us:
            if n > 0:
                out.append((user_id, seq, n, start, last, acc))
            seq += 1
            n, start, acc = 0, int(ts[i]), 0.0
        n += 1
        acc += val[i]
        last = int(ts[i])
    out.append((user_id, seq, n, start, last, acc))
    sessions = pd.DataFrame(
        out, columns=["user_id", "session_seq", "n_events", "start_us",
                      "end_us", "sum_value"])
    sessions["sum_value"] = sessions["sum_value"].astype(np.float32).astype(
        np.float64)
    return sessions, (last, seq, n, start, acc)


def sessionize_stream(stream: DataFrame,
                      gap_us: int = SESSION_GAP_US) -> DataFrame:
    """The stateful operator: groupBy(user) → applyInPandasWithState."""
    with_us = stream.selectExpr("user_id", "event_id", "(ts div 1000) AS ts_us",
                                "value")

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        batch = pd.concat(list(pdfs), ignore_index=True)
        prev = tuple(state.get) if state.exists else None
        sessions, new_state = _session_update(user_id, batch, prev, gap_us)
        state.update(new_state)
        yield sessions

    return (with_us
            .groupBy("user_id")
            .applyInPandasWithState(
                fn, OUTPUT_SCHEMA, STATE_SCHEMA, "update",
                GroupStateTimeout.NoTimeout))


def run_available_now(spark: SparkSession, sf_dir: str,
                      query_name: str = "stream_sessions") -> DataFrame:
    out = sessionize_stream(read_events_stream(spark, sf_dir))
    from birli_spark.streaming import drain_to_memory
    return drain_to_memory(out, query_name, "update")
