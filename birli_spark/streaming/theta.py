"""Streaming theta/KMV shingle sketch — incremental twin of
operators/sketches.py::theta_sketch_pairs.

The per-source state is the k-minima sketch itself (O(k) hashes,
order-insensitive, mergeable), so the stream folds every micro-batch in
with the same merge the batch two-level aggregation uses. The pairwise
set algebra (union / intersection / Jaccard estimates) then runs
RELATIONALLY over the drained final sketches — demonstrating the shape
that makes sketches the streaming answer to cross-source analytics: the
100 TB corpus streams through once, and every pairwise question
afterwards costs |sources|² arithmetic on O(k) state.

Parity: the drained sketch equals the batch sketch (same md5s, same
k-minima), so batch sk7's oracle is this twin's oracle — asserted in
tests/test_streaming_theta.py and driver-verified as st8."""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (ArrayType, LongType, StringType, StructField,
                               StructType)

from birli_spark.operators.sketches import THETA_K, THETA_SHINGLE
from birli_spark.streaming.dedup import read_documents_stream

OUTPUT_SCHEMA = StructType([
    StructField("source", StringType()),
    StructField("kmins", ArrayType(StringType())),
    StructField("n_docs_seen", LongType()),
])

STATE_SCHEMA = StructType([
    StructField("kmins", ArrayType(StringType())),
    StructField("n_docs_seen", LongType()),
])


def _shingle_hashes(text: str, n: int) -> list[str]:
    """md5s of the overlapping n-token shingles — the exact hash stream
    the batch operator's explode produces for one document."""
    # empty tokens are KEPT deliberately — bit-parity with the batch
    # shingles (X.toks splits trim(text) without filtering)
    toks = str(text).strip(" ").split(" ")
    return [
        hashlib.md5(" ".join(toks[i:i + n]).encode()).hexdigest()
        for i in range(len(toks) - n + 1)
    ]


def theta_stream(stream: DataFrame, k: int = THETA_K,
                 n: int = THETA_SHINGLE) -> DataFrame:
    """groupBy(source) → applyInPandasWithState; state transition = the
    KMV merge (union hashes, keep k smallest)."""

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (source,) = key
        batch = pd.concat(list(pdfs), ignore_index=True)
        prev, seen = (list(state.get[0]), state.get[1]) \
            if state.exists else ([], 0)
        hs = set(prev)
        for text in batch["text"]:
            hs.update(_shingle_hashes(text, n))
        kmins = sorted(hs)[:k]
        seen += len(batch)
        state.update((kmins, seen))
        yield pd.DataFrame({"source": [source], "kmins": [kmins],
                            "n_docs_seen": [seen]})

    return (stream
            .select("source", "text")
            .groupBy("source")
            .applyInPandasWithState(
                fn, OUTPUT_SCHEMA, STATE_SCHEMA, "update",
                GroupStateTimeout.NoTimeout))


def run_available_now(spark: SparkSession, sf_dir: str,
                      query_name: str = "stream_theta") -> DataFrame:
    out = theta_stream(read_documents_stream(spark, sf_dir))
    from birli_spark.streaming import drain_to_memory
    return drain_to_memory(out, query_name, "update")


def pairs_from_updates(updates: DataFrame,
                       k: int = THETA_K) -> DataFrame:
    """Pairwise theta algebra over the drained final sketches — the
    identical expressions batch sk7 uses, applied to the streaming
    state. Final sketch per source = emission with max n_docs_seen."""
    from pyspark.sql import Window

    from birli_spark.functions import textsql as X
    from birli_spark.operators.sketches import (_HEX32_SPACE, _hex32,
                                                _theta_hex)
    w = Window.partitionBy("source").orderBy(F.desc("n_docs_seen"))
    sk = (updates.withColumn("rn", F.row_number().over(w))
          .filter(F.col("rn") == 1)
          .select("source", "kmins")
          .withColumn("theta", F.expr(_theta_hex(X.SPARK, "kmins", k))))
    a = sk.select(F.col("source").alias("source_a"),
                  F.col("kmins").alias("ka"), F.col("theta").alias("ta"))
    b = sk.select(F.col("source").alias("source_b"),
                  F.col("kmins").alias("kb"), F.col("theta").alias("tb"))
    pairs = (a.join(F.broadcast(b),
                    F.col("source_a") < F.col("source_b"))
             .withColumn("theta", F.least("ta", "tb")))
    below = ("CASE WHEN theta IS NULL THEN {arr} "
             "ELSE filter({arr}, x -> x < theta) END")
    est = (f"CASE WHEN theta IS NULL THEN CAST({{n}} AS DOUBLE) "
           f"ELSE CAST({{n}} AS DOUBLE) * {_HEX32_SPACE!r} / "
           f"GREATEST({_hex32(X.SPARK, 'substr(theta, 1, 8)')}, 1) END")
    return (pairs
            .withColumn("ba", F.expr(below.format(arr="ka")))
            .withColumn("bb", F.expr(below.format(arr="kb")))
            .withColumn("n_inter", F.expr(
                "size(filter(ba, x -> array_contains(bb, x)))"))
            .withColumn("n_union", F.expr(
                "size(array_distinct(concat(ba, bb)))"))
            .select("source_a", "source_b", "n_inter", "n_union",
                    F.expr(est.format(n="n_inter")).alias("est_intersect"),
                    F.expr(est.format(n="n_union")).alias("est_union"),
                    F.expr("CASE WHEN n_union = 0 THEN 0.0 ELSE "
                           "CAST(n_inter AS DOUBLE) / "
                           "CAST(n_union AS DOUBLE) END")
                    .alias("est_jaccard")))


def theta_stream_oracle_sql() -> str:
    """Batch sk7 IS the oracle: the drained streaming sketches are the
    same k-minima the batch two-level aggregation produces."""
    from birli_spark.operators.sketches import theta_sketch_pairs_oracle_sql
    return theta_sketch_pairs_oracle_sql()
