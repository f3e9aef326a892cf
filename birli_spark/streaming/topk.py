"""Streaming heavy hitters — incremental twin of
operators/sketches.py::cms_heavy_hitters (SK2).

The count-min sketch is additive, so its streaming state is the counter
matrix itself: each micro-batch's token counts add into the depth×width
counters, and after a finite drain the counters equal the batch
operator's exactly (same md5 buckets, same fold). A point estimate is
MIN over rows, recomputed from the live counters at every emission —
never cached — so a candidate's estimate is always current.

Candidate tracking is the standard CMS+heap construction (Cormode &
Muthukrishnan 2005 §4): keep the ``cap`` best tokens by current
estimate; a token enters/refreshes whenever it appears in a batch. With
``cap`` ≥ vocabulary the tracked set is exact (the parity test's
configuration); at real scale ``cap`` bounds state at O(cap + d·w)
per group — independent of stream length — and a heavy hitter can only
be missed if it was evicted while light and never re-observed, which
contradicts it being heavy (re-observation refreshes it).

Single global group (SK2 is corpus-global): one state-store entry. To
shard on a cluster, key the groupBy by a hash prefix and merge the
per-shard counter matrices downstream — CMS merges by elementwise add.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (ArrayType, IntegerType, LongType, StringType,
                               StructField, StructType)

from birli_spark.operators.sketches import CMS_DEPTH, CMS_TOP_K, CMS_WIDTH
from birli_spark.streaming.dedup import read_documents_stream

OUTPUT_SCHEMA = StructType([
    StructField("term", StringType()),
    StructField("rank", IntegerType()),
    StructField("cms_estimate", LongType()),
    # cumulative tokens consumed — strictly increasing across non-empty
    # batches, so the drained stream's FINAL emission is selectable
    # relationally (max n_seen), without relying on sink row order
    StructField("n_seen", LongType()),
])

STATE_SCHEMA = StructType([
    StructField("counters", ArrayType(LongType())),
    StructField("candidates", ArrayType(StringType())),
])


def _bucket(seed: int, tok: str, width: int) -> int:
    """Mirrors sketches._cms_bucket: first 8 hex chars of
    md5('<seed>:<tok>') as int, mod width."""
    h = hashlib.md5(f"{seed}:{tok}".encode()).hexdigest()
    return int(h[:8], 16) % width


def _estimate(counters: list[int], tok: str, depth: int, width: int) -> int:
    return min(counters[s * width + _bucket(s, tok, width)]
               for s in range(depth))


def cms_topk_stream(stream: DataFrame, depth: int = CMS_DEPTH,
                    width: int = CMS_WIDTH, top_k: int = CMS_TOP_K,
                    cap: int = 4096) -> DataFrame:
    """groupBy(const) → applyInPandasWithState; the transition adds the
    batch's token counts into the counters and re-ranks candidates."""

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            counters, candidates = list(state.get[0]), set(state.get[1])
        else:
            counters, candidates = [0] * (depth * width), set()
        batch_counts: dict[str, int] = {}
        for pdf_ in pdfs:
            for text in pdf_["text"]:
                for t in str(text).strip(" ").split(" "):
                    if t:
                        batch_counts[t] = batch_counts.get(t, 0) + 1
        for tok, n in batch_counts.items():
            for s in range(depth):
                counters[s * width + _bucket(s, tok, width)] += n
        candidates |= batch_counts.keys()
        ranked = sorted(
            ((_estimate(counters, t, depth, width), t) for t in candidates),
            key=lambda et: (-et[0], et[1]))
        if len(ranked) > cap:
            ranked = ranked[:cap]
            candidates = {t for _, t in ranked}
        state.update((counters, sorted(candidates)))
        top = ranked[:top_k]
        # every token increments exactly one counter per seed row, so
        # the per-seed counter sum IS the cumulative token count
        n_seen = sum(counters[:width])
        yield pd.DataFrame({
            "term": [t for _, t in top],
            "rank": list(range(1, len(top) + 1)),
            "cms_estimate": [e for e, _ in top],
            "n_seen": [n_seen] * len(top),
        })

    return (stream
            .select(F.lit(0).alias("g"), "text")
            .groupBy("g")
            .applyInPandasWithState(
                fn, OUTPUT_SCHEMA, STATE_SCHEMA, "update",
                GroupStateTimeout.NoTimeout))


def run_available_now(spark: SparkSession, sf_dir: str,
                      query_name: str = "stream_cms_topk",
                      **kwargs) -> DataFrame:
    out = cms_topk_stream(read_documents_stream(spark, sf_dir), **kwargs)
    q = (out.writeStream
         .format("memory")
         .queryName(query_name)
         .outputMode("update")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(query_name)


def topk_from_updates(updates: DataFrame) -> DataFrame:
    """The drained stream's final heavy-hitter table: the emission rows
    carrying the maximum ``n_seen`` (counters are cumulative, so that IS
    the all-data state). ``dropDuplicates`` guards the degenerate case
    of a trailing batch with zero tokens re-emitting the same state."""
    mx = updates.agg(F.max("n_seen").alias("n_seen"))
    return (updates.join(F.broadcast(mx), "n_seen")
            .select("term", "rank", "cms_estimate")
            .dropDuplicates())


def topk_stream_oracle_sql() -> str:
    """The BATCH sk2 oracle minus its exact-count column — after a
    finite drain the streamed counters equal the batch sketch's, so the
    batch SQL is the streaming twin's oracle (driver-verified
    batch/stream parity)."""
    from birli_spark.operators.sketches import cms_heavy_hitters_oracle_sql
    return (f"SELECT term, rank, cms_estimate FROM "
            f"({cms_heavy_hitters_oracle_sql()}\n) q")
