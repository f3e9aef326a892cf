"""Streaming Markov transition counter: the stateful twin of
``operators/events.type_transitions`` (E15).

State per user is a single string — the type of the user's latest event
— the smallest possible stateful-op footprint (O(1) per user, no
timestamps, no arrays). Each micro-batch emits the batch's
(from_type → to_type) edge counts for that user; the global transition
matrix is a tiny additive aggregate over the emitted edge rows
(:func:`transition_matrix_from_updates`), identical to the batch
operator's counts because edge emission is append-only and disjoint
across batches.

**Ordering assumption**: batch parity holds only when micro-batches
arrive in per-user event-time order (true for this repo's availableNow
file source, whose files are time-ordered). A feed that can deliver a
user's later events in an earlier micro-batch needs a watermark-delayed
reorder buffer upstream — the carried ``last_type`` cannot be spliced
retroactively. (The funnel twin is order-insensitive — min-merge — and
has no such requirement.)

Scale: state shards by user; counts never re-read prior batches. The
matrix aggregation input is (users × types²) rows per batch at worst,
already far below event grain.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

from birli_spark.streaming.windows import read_events_stream

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("from_type", StringType()),
    StructField("to_type", StringType()),
    StructField("n", LongType()),
])

STATE_SCHEMA = StructType([StructField("last_type", StringType())])


def _transitions_update(user_id: int, ev: pd.DataFrame,
                        prev: str | None) -> tuple[pd.DataFrame, str]:
    """Pure transition: edges between consecutive events of the batch
    (time-ordered, ties by event_id), chained onto the carried-over
    last event type."""
    srt = ev.sort_values(["ts_us", "event_id"], ignore_index=True)
    types = list(srt["event_type"])
    counts: dict[tuple[str, str], int] = {}
    chain = ([prev] if prev is not None else []) + types
    for a, b in zip(chain, chain[1:]):
        counts[(a, b)] = counts.get((a, b), 0) + 1
    out = pd.DataFrame(
        [(int(user_id), a, b, n) for (a, b), n in sorted(counts.items())],
        columns=["user_id", "from_type", "to_type", "n"])
    return out, types[-1] if types else prev


def transitions_stream(stream: DataFrame) -> DataFrame:
    """groupBy(user) → applyInPandasWithState with one-string state."""
    with_us = stream.selectExpr("user_id", "event_id", "event_type",
                                "(ts div 1000) AS ts_us")

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        batch = pd.concat(list(pdfs), ignore_index=True)
        prev = state.get[0] if state.exists else None
        out, last = _transitions_update(user_id, batch, prev)
        if last is not None:
            state.update((last,))
        yield out

    return (with_us
            .groupBy("user_id")
            .applyInPandasWithState(
                fn, OUTPUT_SCHEMA, STATE_SCHEMA, "append",
                GroupStateTimeout.NoTimeout))


def transition_matrix_from_updates(updates: DataFrame) -> DataFrame:
    """Fold the emitted edge rows into the global transition matrix —
    the exact output shape of the batch ``events.type_transitions``."""
    edges = (updates.groupBy("from_type", "to_type")
             .agg(F.sum("n").alias("n_edges")))
    totals = (edges.groupBy("from_type")
              .agg(F.sum("n_edges").alias("n_from"))
              .withColumnRenamed("from_type", "__ft"))
    return (edges.join(F.broadcast(totals),
                       edges["from_type"] == totals["__ft"])
            .drop("__ft"))


def run_available_now(spark: SparkSession, sf_dir: str,
                      query_name: str = "stream_transitions") -> DataFrame:
    out = transitions_stream(read_events_stream(spark, sf_dir))
    from birli_spark.streaming import drain_to_memory
    return drain_to_memory(out, query_name, "append")
