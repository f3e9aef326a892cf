"""Streaming conversion funnel: the stateful twin of
``operators/events.funnel`` (E10) via ``applyInPandasWithState``.

State per user is **fixed-width**: the earliest timestamp of each funnel
stage seen so far (4 longs) plus a cumulative event count — O(1) per
user regardless of history, the ideal stateful-op shape (contrast the
trailing-burst state, which holds a window of timestamps). Each batch
merges the batch-mins into the state mins and emits the updated per-user
snapshot; the funnel report is a tiny batch aggregation over the latest
snapshots (:func:`funnel_counts_from_updates`), identical to the batch
operator's conditional-ordering counts.

Scale: state shards by user across the state-store; an event-time
timeout would expire one-shot visitors on infinite streams (finite
source keeps NoTimeout). Nothing corpus-sized sorts or re-reads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

from birli_spark.operators.events import FUNNEL_STAGES
from birli_spark.streaming.windows import read_events_stream

_N = len(FUNNEL_STAGES)

OUTPUT_SCHEMA = StructType(
    [StructField("user_id", LongType())]
    + [StructField(f"t{i}", LongType()) for i in range(_N)]
    + [StructField("n_seen", LongType())])

STATE_SCHEMA = StructType(
    [StructField(f"t{i}", LongType()) for i in range(_N)]
    + [StructField("n_seen", LongType())])


def _funnel_update(user_id: int, ev: pd.DataFrame,
                   prev: tuple | None) -> tuple[pd.DataFrame, tuple]:
    """Pure transition: fold the batch's per-stage min timestamps into
    the running per-stage mins (None = stage unseen)."""
    mins = list(prev[:_N]) if prev is not None else [None] * _N
    n_seen = int(prev[_N]) if prev is not None else 0
    for i, stage in enumerate(FUNNEL_STAGES):
        sub = ev.loc[ev["event_type"] == stage, "ts_us"]
        if len(sub):
            m = int(sub.min())
            mins[i] = m if mins[i] is None else min(int(mins[i]), m)
    n_seen += len(ev)
    state = (*mins, n_seen)
    out = pd.DataFrame([{
        "user_id": int(user_id),
        **{f"t{i}": mins[i] for i in range(_N)},
        "n_seen": n_seen,
    }])
    return out, state


def funnel_stream(stream: DataFrame) -> DataFrame:
    """groupBy(user) → applyInPandasWithState, emitting the updated
    per-user stage-min snapshot every batch (update mode)."""
    with_us = stream.selectExpr("user_id", "event_type",
                                "(ts div 1000) AS ts_us")

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        batch = pd.concat(list(pdfs), ignore_index=True)
        prev = tuple(state.get) if state.exists else None
        out, new_state = _funnel_update(user_id, batch, prev)
        state.update(new_state)
        yield out

    return (with_us
            .groupBy("user_id")
            .applyInPandasWithState(
                fn, OUTPUT_SCHEMA, STATE_SCHEMA, "update",
                GroupStateTimeout.NoTimeout))


def funnel_counts_from_updates(updates: DataFrame) -> DataFrame:
    """Collapse the update log to each user's latest snapshot (max
    n_seen) and compute the ordered-stage counts — the exact output
    shape of the batch ``events.funnel``."""
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy(F.desc("n_seen"))
    latest = (updates.withColumn("rn", F.row_number().over(w))
              .filter("rn = 1"))
    conds = []
    for i in range(_N):
        c = F.col("t0").isNotNull()
        for j in range(1, i + 1):
            c = (c & F.col(f"t{j}").isNotNull()
                 & (F.col(f"t{j}") >= F.col(f"t{j - 1}")))
        conds.append(c)
    counts = latest.agg(*[
        F.sum(c.cast("long")).alias(f"n{i}") for i, c in enumerate(conds)])
    stack_args = ", ".join(
        f"{i + 1}, '{s}', n{i}" for i, s in enumerate(FUNNEL_STAGES))
    return counts.selectExpr(
        f"stack({_N}, {stack_args}) AS (stage_idx, stage, n_users)")


def run_available_now(spark: SparkSession, sf_dir: str,
                      query_name: str = "stream_funnel") -> DataFrame:
    out = funnel_stream(read_events_stream(spark, sf_dir))
    from birli_spark.streaming import drain_to_memory
    return drain_to_memory(out, query_name, "update")
