"""P6 time chunking: chunk-size derivation semantics (reference
src/cli.rs:1260-1331) and range-partitioned chunk assignment."""

from __future__ import annotations

import pytest

from birli_spark import pipeline
from birli_spark.operators import chunking
from birli_spark.sources import synthetic as syn


def test_chunk_size_from_memory_matches_reference_semantics():
    # everything fits -> no chunking
    assert chunking.chunk_size_from_memory(1e9, 100, 10, 4) is None
    # floor(mem / block) * avg_time
    assert chunking.chunk_size_from_memory(1000, 100, 100, 4) == 8
    assert chunking.chunk_size_from_memory(799, 100, 100, 4) == 4
    # budget below one averaged block -> error
    with pytest.raises(ValueError, match="averaged block"):
        chunking.chunk_size_from_memory(399, 100, 100, 4)
    with pytest.raises(ValueError, match="byte"):
        chunking.chunk_size_from_memory(0.5, 100, 100, 4)


def test_validate_chunk_multiple_of_avg_time():
    chunking.validate_chunk_size(8, 4)
    with pytest.raises(ValueError, match="multiple"):
        chunking.validate_chunk_size(6, 4)


def test_chunk_assignment_and_partitioning(spark, sf_dir):
    vis = syn.load_vis(spark, sf_dir)
    chunked = chunking.with_time_chunks(vis, 8, avg_time=pipeline.AVG_TIME)
    pairs = {(r.chunk, r.t) for r in
             chunked.select("chunk", "t").distinct().collect()}
    assert pairs == {(t // 8, t) for t in range(syn.NUM_T)}
    # partitions contain whole chunks: no chunk spans two partitions
    chunk_parts = (chunked.select("chunk")
                   .rdd.mapPartitionsWithIndex(
                       lambda i, it: [(i, c.chunk) for c in it])
                   .distinct().collect())
    by_chunk = {}
    for part, chunk in chunk_parts:
        by_chunk.setdefault(chunk, set()).add(part)
    assert all(len(parts) == 1 for parts in by_chunk.values())