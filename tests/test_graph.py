"""Semantic tests for the fixed-point PageRank over the source-overlap
graph: planted topology, mass bounds, determinism."""

from __future__ import annotations

from pyspark.sql import Row

from birli_spark.operators import graph


def _docs(spark):
    # sources a and b share a long common passage (heavy edge);
    # c overlaps nothing (isolated node -> jump mass only)
    shared = "alpha beta gamma delta epsilon zeta eta theta " * 4
    rows = [
        Row(doc_id=0, text=shared + "one more tail", lang="en", source="a",
            n_chars=10),
        Row(doc_id=1, text=shared + "different ending here", lang="en",
            source="b", n_chars=10),
        Row(doc_id=2, text="totally unrelated words nothing in common "
                           "with anyone else at all", lang="en", source="c",
            n_chars=10),
    ]
    return spark.createDataFrame(rows)


def test_pagerank_planted_topology(spark):
    out = {r.source: r for r in
           graph.source_pagerank(_docs(spark)).collect()}
    assert set(out) == {"a", "b", "c"}
    # a<->b symmetric: identical ranks and degrees
    assert out["a"].rank_ticks == out["b"].rank_ticks
    assert out["a"].n_out == out["b"].n_out == 1
    assert out["a"].out_w == out["b"].out_w > 0
    # isolated c keeps only the jump term, far below the connected pair
    assert out["c"].n_out == 0 and out["c"].out_w == 0
    assert out["c"].rank_ticks < out["a"].rank_ticks
    jump = (graph.PR_ONE * (graph.PR_D_DEN - graph.PR_D_NUM)
            // graph.PR_D_DEN) // 3
    assert out["c"].rank_ticks == jump
    # total mass stays within the floor-loss envelope of ONE
    total = sum(r.rank_ticks for r in out.values())
    assert 0 < total <= graph.PR_ONE


def test_pagerank_deterministic(spark):
    docs = _docs(spark).repartition(7)
    a = sorted(map(tuple, graph.source_pagerank(docs).collect()))
    b = sorted(map(tuple, graph.source_pagerank(docs).collect()))
    assert a == b
