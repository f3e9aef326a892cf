"""Streaming heavy hitters — incremental twin of
operators/sketches.py::cms_heavy_hitters (SK2).

The count-min sketch is additive, so its streaming state is the counter
matrix itself: each micro-batch's token counts add into the depth×width
counters, and after a finite drain the counters equal the batch
operator's exactly (same md5 buckets, same fold). A point estimate is
MIN over rows, recomputed from the live counters at every emission —
never cached — so a candidate's estimate is always current.

Candidate tracking keeps an EXACT count per tracked token (the
Space-Saving flavor of the CMS+heap construction, Cormode &
Muthukrishnan 2005 §4) and ranks/selects the top-k by that count —
the SAME ordering the batch operator and its oracle use (exact tf,
term-ascending ties), NOT by CMS estimate: an estimate inflated by
collisions must not reorder or displace the reported set. The CMS
estimates are recomputed from the live counters at emission and
reported alongside, exactly like the batch's estimate join. With
``cap`` ≥ vocabulary the tracked counts are exact and the drained
output equals the batch bit-for-bit even under counter collisions
(the parity configuration); at real scale ``cap`` bounds state at
O(cap + d·w) per group — independent of stream length — and a heavy
hitter can only be missed if it was evicted while light and never
re-observed, which contradicts it being heavy (re-observation
re-enters it, undercounted by at most the evicted mass).

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
    # exact tracked count per candidate (same order as candidates) —
    # the ranking key; CMS estimates are report-only
    StructField("cand_counts", ArrayType(LongType())),
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
            counters = list(state.get[0])
            cand = dict(zip(state.get[1], state.get[2]))
        else:
            counters, cand = [0] * (depth * width), {}
        batch_counts: dict[str, int] = {}
        for pdf_ in pdfs:
            for text in pdf_["text"]:
                if text is None:
                    continue  # batch twin: split(trim(NULL)) -> no rows
                for t in str(text).strip(" ").split(" "):
                    if t:
                        batch_counts[t] = batch_counts.get(t, 0) + 1
        for tok, n in batch_counts.items():
            for s in range(depth):
                counters[s * width + _bucket(s, tok, width)] += n
            cand[tok] = cand.get(tok, 0) + n
        # rank by EXACT tracked count (batch-oracle ordering: tf desc,
        # term asc) — never by CMS estimate, which collisions inflate
        ranked = sorted(cand.items(), key=lambda tn: (-tn[1], tn[0]))
        if len(ranked) > cap:
            ranked = ranked[:cap]
            cand = dict(ranked)
        keys = sorted(cand)
        state.update((counters, keys, [cand[t] for t in keys]))
        top = [(_estimate(counters, t, depth, width), t)
               for t, _ in ranked[:top_k]]
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
    from birli_spark.streaming import drain_to_memory
    return drain_to_memory(out, query_name, "update")


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
