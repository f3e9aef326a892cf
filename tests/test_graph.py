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


def test_triangle_stats_constructed(spark):
    from pyspark.sql import Row

    from birli_spark.operators import graph
    # Sources A,B,C share one exact 8-token shingle pairwise (triangle);
    # D overlaps only A (pendant edge); E is isolated.
    shared = "t1 t2 t3 t4 t5 t6 t7 t8"
    ab = "u1 u2 u3 u4 u5 u6 u7 u8"

    def doc(i, src, text):
        return Row(doc_id=i, text=text, lang="en", source=src, n_chars=0)
    docs = spark.createDataFrame([
        doc(1, "A", shared + " xa xb xc"),
        doc(2, "B", shared + " ya yb yc"),
        doc(3, "C", shared + " za zb zc"),
        doc(4, "D", ab + " qa qb qc"),
        doc(5, "A", ab + " ra rb rc"),
        doc(6, "E", "e1 e2 e3 e4 e5 e6 e7"),
    ])
    out = {r.source: r for r in graph.triangle_stats(docs).collect()}
    assert out["A"].degree == 3 and out["A"].n_triangles == 1
    assert out["B"].n_triangles == 1 and out["C"].n_triangles == 1
    assert out["D"].degree == 1 and out["D"].n_triangles == 0
    assert out["E"].degree == 0 and out["E"].clustering_coeff == 0.0
    # A: 1 triangle over C(3,2)=3 possible wedges -> coeff 1/3
    assert abs(out["A"].clustering_coeff - 1 / 3) < 1e-12
    assert out["B"].clustering_coeff == 1.0
