"""Streaming KMV distinct-count sketch — incremental twin of
operators/sketches.py::kmv_distinct_tokens.

A mergeable sketch is streaming-compatible *by construction*: its state
(the k smallest distinct hashes per group) is order-insensitive and
bounded, so each micro-batch folds in with the same merge the batch
operator's two-level aggregation uses. State per source is exactly k
hashes — O(k), independent of stream length; on a cluster the state
store shards by source.

The per-batch emission carries the current estimate; under update mode
the last emission per source is the live value, and after a finite
drain it equals the batch sketch exactly (asserted in
tests/test_streaming_sketch.py — same md5s, same k-minima, same
estimate arithmetic)."""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (ArrayType, DoubleType, LongType, StringType,
                               StructField, StructType)

from birli_spark.operators.sketches import _HEX32_SPACE, KMV_K
from birli_spark.streaming.dedup import read_documents_stream

OUTPUT_SCHEMA = StructType([
    StructField("source", StringType()),
    StructField("n_kmins", LongType()),
    StructField("kmv_distinct", DoubleType()),
    # cumulative docs consumed per source — strictly increasing across
    # batches that touch the source, so the final emission per source is
    # selectable relationally (argmax), without relying on sink order
    StructField("n_docs_seen", LongType()),
])

#: the sketch IS the state: current k-minima, ascending (+ drain marker)
STATE_SCHEMA = StructType([
    StructField("kmins", ArrayType(StringType())),
    StructField("n_docs_seen", LongType()),
])


def _estimate(kmins: list[str], k: int) -> float:
    """Same arithmetic as the SQL estimate (sketches._estimate): exact
    size below k, else (k-1) / h_(k) over the first-8-hex fraction."""
    if len(kmins) < k:
        return float(len(kmins))
    frac = max(int(kmins[k - 1][:8], 16), 1)
    return (k - 1) * _HEX32_SPACE / frac


def _merge(prev: list[str] | None, texts: pd.Series, k: int) -> list[str]:
    # tokenization mirrors the batch SQL exactly: trim spaces off the
    # document, split on single spaces, drop empty tokens
    hs = set(prev or [])
    for text in texts:
        if text is None:
            continue  # batch twin: split(trim(NULL)) yields no rows —
            # str(None) would hash the literal token "None"
        for t in str(text).strip(" ").split(" "):
            if t:
                hs.add(hashlib.md5(t.encode()).hexdigest())
    return sorted(hs)[:k]


def kmv_stream(stream: DataFrame, k: int = KMV_K) -> DataFrame:
    """groupBy(source) → applyInPandasWithState; the transition is the
    sketch merge itself."""

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (source,) = key
        batch = pd.concat(list(pdfs), ignore_index=True)
        prev, seen = (list(state.get[0]), state.get[1]) \
            if state.exists else (None, 0)
        kmins = _merge(prev, batch["text"], k)
        seen += len(batch)
        state.update((kmins, seen))
        yield pd.DataFrame({"source": [source],
                            "n_kmins": [len(kmins)],
                            "kmv_distinct": [_estimate(kmins, k)],
                            "n_docs_seen": [seen]})

    return (stream
            .select("source", "text")
            .groupBy("source")
            .applyInPandasWithState(
                fn, OUTPUT_SCHEMA, STATE_SCHEMA, "update",
                GroupStateTimeout.NoTimeout))


def run_available_now(spark: SparkSession, sf_dir: str,
                      query_name: str = "stream_kmv") -> DataFrame:
    out = kmv_stream(read_documents_stream(spark, sf_dir))
    from birli_spark.streaming import drain_to_memory
    return drain_to_memory(out, query_name, "update")


def kmv_from_updates(updates: DataFrame) -> DataFrame:
    """The drained stream's final per-source estimates: each source's
    emission with the maximum ``n_docs_seen`` (the all-data sketch)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    w = Window.partitionBy("source").orderBy(F.desc("n_docs_seen"))
    return (updates.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("source", "kmv_distinct"))


def kmv_stream_oracle_sql() -> str:
    """The BATCH sk1 oracle minus its exact-count baseline column — the
    drained sketch equals the batch sketch (same md5s, same k-minima,
    same estimate arithmetic), so the batch SQL is the twin's oracle."""
    from birli_spark.operators.sketches import kmv_distinct_tokens_oracle_sql
    return (f"SELECT source, kmv_distinct FROM "
            f"({kmv_distinct_tokens_oracle_sql()}\n) q")
