"""Custom stateful streaming operator: incremental trailing-burst
detection via ``applyInPandasWithState`` — the streaming twin of
``operators/events.trailing_burst_counts`` (same causal semantics: per
event, how many preceding same-user events fall in the trailing
window).

State per user: the timestamps still inside the trailing window (an
array column — everything older can never affect a future count and is
pruned every batch, so state is bounded by the user's max event rate ×
window, not history). The pure-pandas transition
:func:`_burst_update` is separated from the Spark wiring so multi-batch
continuation is unit-testable without a streaming harness.

Scale: state is O(users × events-per-window), sharded by the state
store; an event-time timeout + watermark would expire idle users for
infinite streams (finite-source form keeps NoTimeout).

Known append-mode divergence from the batch twin: EQUAL-timestamp
peers that straddle micro-batches. The batch RANGE frame counts ties
symmetrically (each of two equal-ts events counts the other); in
append mode an event's count is emitted with its batch and cannot be
retracted, so an equal-ts peer arriving in a LATER batch raises only
the later event's count — the earlier event's emitted count is final.
Counts are therefore "as of arrival": peers with ts <= t that arrived
no later than the event's own batch. Same-batch ties match the batch
operator exactly (the parity test covers them); cross-batch ties
under-count the earlier event by the number of late-arriving peers.
An ordered feed only produces cross-batch ties when a batch boundary
splits an equal-ts run — if exact tie symmetry matters, batch by
complete timestamps (the file-per-timestep source does).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (ArrayType, LongType, StructField, StructType)

from birli_spark.operators.events import BURST_WINDOW_US
from birli_spark.streaming.windows import read_events_stream

OUTPUT_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("user_id", LongType()),
    StructField("n_trailing", LongType()),
])

#: timestamps (micro-epoch) still inside the trailing window
STATE_SCHEMA = StructType([
    StructField("recent_ts", ArrayType(LongType())),
])


def _burst_update(user_id: int, events: pd.DataFrame,
                  prev: list | None,
                  window_us: int = BURST_WINDOW_US
                  ) -> tuple[pd.DataFrame, list]:
    """Pure transition: count, for each batch event (time-ordered, ties
    by event_id), the prior same-user timestamps within
    ``[t - window_us, t]`` (inclusive, matching the RANGE frame) — prior batches' survivors plus earlier rows
    of this batch — then prune state to the new window tail."""
    ev = events.sort_values(["ts_us", "event_id"], ignore_index=True)
    ts = ev["ts_us"].to_numpy(np.int64)
    held = np.array(sorted(prev), dtype=np.int64) if prev else \
        np.empty(0, dtype=np.int64)
    allts = np.concatenate([held, ts])          # sorted: held <= batch order
    allts.sort(kind="stable")
    # for each batch event: #timestamps in (t - w, t] minus itself; peers
    # (equal ts) all count for each other, matching the RANGE frame
    lo = np.searchsorted(allts, ts - window_us, side="left")
    hi = np.searchsorted(allts, ts, side="right")
    n_trailing = (hi - lo - 1).astype(np.int64)
    out = pd.DataFrame({
        "event_id": ev["event_id"].to_numpy(np.int64),
        "user_id": np.int64(user_id),
        "n_trailing": n_trailing,
    })
    cutoff = int(allts[-1]) - window_us
    new_state = [int(t) for t in allts if t >= cutoff]
    return out, new_state


def burst_stream(stream: DataFrame,
                 window_us: int = BURST_WINDOW_US) -> DataFrame:
    """The stateful operator: groupBy(user) → applyInPandasWithState."""
    with_us = stream.selectExpr("user_id", "event_id",
                                "(ts div 1000) AS ts_us")

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        batch = pd.concat(list(pdfs), ignore_index=True)
        prev = list(state.get[0]) if state.exists else None
        out, new_state = _burst_update(user_id, batch, prev, window_us)
        state.update((new_state,))
        yield out

    return (with_us
            .groupBy("user_id")
            .applyInPandasWithState(
                fn, OUTPUT_SCHEMA, STATE_SCHEMA, "append",
                GroupStateTimeout.NoTimeout))


def run_available_now(spark: SparkSession, sf_dir: str,
                      query_name: str = "stream_bursts") -> DataFrame:
    out = burst_stream(read_events_stream(spark, sf_dir))
    from birli_spark.streaming import drain_to_memory
    return drain_to_memory(out, query_name, "append")
