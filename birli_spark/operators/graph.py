"""Graph analytics over derived relations — the iterative-algorithm
family beyond k-means: **fixed-point weighted PageRank** on the
source-overlap graph (which crawl sources share content with which —
the centrality signal a curation pipeline uses to pick canonical
sources).

Everything runs in integer ticks (2^32 = rank 1.0) with floor
divisions, so five distributed iterations are *bit-identical* to the
DuckDB CTE-chain oracle — the same determinism bargain as the k-means
and log2 operators: a deterministic spelling of the textbook recurrence
``r' = (1−d)/N + d·Σ r_src·w/out_w`` with d = 17/20.

Scale shape per iteration: one equi-join (edges ⋈ ranks on src — ranks
is node-sized, broadcastable; at web scale both sides shuffle on the
key and stay co-partitioned across iterations) and one
partial-aggregated groupBy(dst). The corpus is touched exactly once to
derive the edges; iterations run on the (tiny) graph relations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from birli_spark.operators.dedup import OVERLAP_SHINGLE_N

PR_ITERS = 5
#: 2^32 ticks == rank mass 1.0
PR_ONE = 1 << 32
#: damping d = 17/20 = 0.85 as an exact integer ratio
PR_D_NUM, PR_D_DEN = 17, 20


def _edges(docs: DataFrame, n: int = OVERLAP_SHINGLE_N) -> DataFrame:
    """Symmetrized weighted edges from the shared-shingle counts (both
    directions of every overlap pair)."""
    from birli_spark.operators.dedup import cross_source_overlap
    ov = cross_source_overlap(docs, n)
    fwd = ov.select(F.col("source_a").alias("src"),
                    F.col("source_b").alias("dst"),
                    F.col("n_shared_shingles").alias("w"))
    rev = ov.select(F.col("source_b").alias("src"),
                    F.col("source_a").alias("dst"),
                    F.col("n_shared_shingles").alias("w"))
    return fwd.union(rev)


def source_pagerank(docs: DataFrame, iters: int = PR_ITERS,
                    n: int = OVERLAP_SHINGLE_N) -> DataFrame:
    """G1 — weighted PageRank of the source-overlap graph in exact
    integer ticks. Returns one row per source with its final rank and
    degree stats."""
    from pyspark.storagelevel import StorageLevel
    edges = _edges(docs, n).persist(StorageLevel.MEMORY_AND_DISK)
    nodes = docs.select("source").distinct()
    outw = edges.groupBy("src").agg(F.sum("w").alias("out_w"),
                                    F.count("*").alias("n_out"))
    n_nodes_df = nodes.agg(F.count("*").alias("n_nodes"))
    # all-integer seeds/jumps: r0 = ONE // N, jump = (ONE * 3 // 20) // N
    ranks = (nodes.join(F.broadcast(n_nodes_df))
             .select("source", "n_nodes",
                     F.expr(f"CAST({PR_ONE} AS BIGINT) DIV n_nodes")
                     .alias("r")))
    ew = edges.join(outw, "src").select(
        "src", "dst", F.expr("CAST(w AS BIGINT)").alias("w"), "out_w")
    for _ in range(iters):
        contrib = (ew.join(ranks.select(F.col("source").alias("src"), "r"),
                           "src")
                   .select("dst", F.expr("(r * w) DIV out_w").alias("c"))
                   .groupBy("dst").agg(F.sum("c").alias("contrib")))
        base = ranks.select("source", "n_nodes")
        ranks = (base.join(contrib,
                           base["source"] == contrib["dst"], "left")
                 .select("source", "n_nodes", F.expr(
                     f"(CAST({PR_ONE} AS BIGINT) * {PR_D_DEN - PR_D_NUM} "
                     f"DIV {PR_D_DEN}) DIV n_nodes "
                     f"+ ({PR_D_NUM} * COALESCE(contrib, CAST(0 AS BIGINT))) "
                     f"DIV {PR_D_DEN}").alias("r")))
    return (ranks
            .join(outw.withColumnRenamed("src", "source"), "source", "left")
            .select("source", F.col("r").alias("rank_ticks"),
                    F.coalesce("n_out", F.lit(0)).alias("n_out"),
                    F.coalesce("out_w", F.lit(0)).alias("out_w")))


def source_pagerank_oracle_sql(iters: int = PR_ITERS,
                               n: int = OVERLAP_SHINGLE_N) -> str:
    # the overlap-edge derivation embeds the D8 oracle verbatim (one
    # source of truth — the Spark side reuses cross_source_overlap the
    # same way)
    from birli_spark.operators.dedup import cross_source_overlap_oracle_sql
    ov_sql = cross_source_overlap_oracle_sql(n)
    jump = (f"(CAST({PR_ONE} AS BIGINT) * {PR_D_DEN - PR_D_NUM} "
            f"// {PR_D_DEN}) // n_nodes")
    steps = []
    for i in range(iters):
        steps.append(f"""
contrib_{i} AS (
  SELECT e.dst, SUM((r.r * e.w) // e.out_w) AS contrib
  FROM ew e JOIN ranks_{i} r ON e.src = r.source
  GROUP BY e.dst),
ranks_{i + 1} AS (
  SELECT r.source, r.n_nodes,
    {jump} + ({PR_D_NUM} * COALESCE(c.contrib, 0)) // {PR_D_DEN} AS r
  FROM ranks_{i} r LEFT JOIN contrib_{i} c ON r.source = c.dst)""")
    return f"""
WITH ov AS (
  SELECT source_a, source_b, n_shared_shingles AS w FROM ({ov_sql})),
edges AS (
  SELECT source_a AS src, source_b AS dst, CAST(w AS BIGINT) AS w FROM ov
  UNION ALL
  SELECT source_b AS src, source_a AS dst, CAST(w AS BIGINT) AS w FROM ov),
outw AS (
  SELECT src, SUM(w) AS out_w, COUNT(*) AS n_out FROM edges GROUP BY src),
ew AS (
  SELECT e.src, e.dst, e.w, o.out_w FROM edges e JOIN outw o USING (src)),
nodes AS (SELECT DISTINCT source FROM documents),
nn AS (SELECT COUNT(*) AS n_nodes FROM nodes),
ranks_0 AS (
  SELECT source, n_nodes, CAST({PR_ONE} AS BIGINT) // n_nodes AS r
  FROM nodes CROSS JOIN nn),{",".join(steps)}
SELECT r.source, CAST(r.r AS BIGINT) AS rank_ticks,
  COALESCE(o.n_out, 0) AS n_out,
  CAST(COALESCE(o.out_w, 0) AS BIGINT) AS out_w
FROM ranks_{iters} r LEFT JOIN outw o ON r.source = o.src"""


def triangle_stats(docs: DataFrame,
                   n: int = OVERLAP_SHINGLE_N) -> DataFrame:
    """G2 — per-node triangle participation and local clustering
    coefficient over the source-overlap graph (the node-iterator /
    wedge-check algorithm — the canonical distributed triangle count):
    for every source, its degree, the number of triangles through it,
    and ``2T / (d(d−1))`` → (source, degree, n_triangles,
    clustering_coeff).

    Scale shape: the expensive part is the wedge join — u's neighbor
    list squared. At web scale the standard mitigation is degree
    ordering (count each triangle only at its lowest-degree corner); on
    the bounded source graph the symmetric wedge join + canonical-edge
    semi join is one broadcast-sized self-join chain. Nodes without
    edges surface with zeros via the left join; the coefficient is one
    IEEE division of exact integers."""
    from birli_spark.operators.dedup import cross_source_overlap
    ov = cross_source_overlap(docs, n).select(
        F.col("source_a").alias("a"), F.col("source_b").alias("b"))
    und = ov.unionByName(ov.select(F.col("b").alias("a"),
                                   F.col("a").alias("b")))
    wedges = (und.select(F.col("a").alias("u"), F.col("b").alias("v"))
              .join(und.select(F.col("a").alias("u"),
                               F.col("b").alias("w")), "u")
              .filter(F.col("v") < F.col("w")))
    tri = (wedges.join(ov.select(F.col("a").alias("v"),
                                 F.col("b").alias("w")), ["v", "w"],
                       "left_semi")
           .groupBy("u").agg(F.count("*").alias("n_triangles")))
    deg = und.groupBy(F.col("a").alias("u")).agg(
        F.count("*").alias("degree"))
    nodes = docs.select(F.col("source").alias("u")).distinct()
    return (nodes.join(deg, "u", "left").join(tri, "u", "left")
            .select(F.col("u").alias("source"),
                    F.coalesce("degree", F.lit(0)).cast("int")
                    .alias("degree"),
                    F.coalesce("n_triangles", F.lit(0)).cast("int")
                    .alias("n_triangles"),
                    F.expr("CASE WHEN COALESCE(degree, 0) < 2 THEN 0.0 "
                           "ELSE 2.0 * CAST(COALESCE(n_triangles, 0) "
                           "AS DOUBLE) / (CAST(degree AS DOUBLE) * "
                           "CAST(degree - 1 AS DOUBLE)) END")
                    .alias("clustering_coeff")))


def triangle_stats_oracle_sql(n: int = OVERLAP_SHINGLE_N) -> str:
    from birli_spark.operators.dedup import cross_source_overlap_oracle_sql
    return f"""
WITH ov AS (
  SELECT source_a AS a, source_b AS b
  FROM ({cross_source_overlap_oracle_sql(n)})),
und AS (SELECT a, b FROM ov UNION ALL SELECT b, a FROM ov),
wedges AS (
  SELECT e1.a AS u, e1.b AS v, e2.b AS w
  FROM und e1 JOIN und e2 ON e1.a = e2.a
  WHERE e1.b < e2.b),
tri AS (
  SELECT u, COUNT(*) AS n_triangles
  FROM wedges
  WHERE EXISTS (SELECT 1 FROM ov WHERE ov.a = wedges.v
                AND ov.b = wedges.w)
  GROUP BY u),
deg AS (SELECT a AS u, COUNT(*) AS degree FROM und GROUP BY a),
nodes AS (SELECT DISTINCT source AS u FROM documents)
SELECT nodes.u AS source,
  CAST(COALESCE(degree, 0) AS INT) AS degree,
  CAST(COALESCE(n_triangles, 0) AS INT) AS n_triangles,
  CASE WHEN COALESCE(degree, 0) < 2 THEN 0.0
       ELSE 2.0 * CAST(COALESCE(n_triangles, 0) AS DOUBLE)
            / (CAST(degree AS DOUBLE) * CAST(degree - 1 AS DOUBLE)) END
    AS clustering_coeff
FROM nodes
LEFT JOIN deg ON nodes.u = deg.u
LEFT JOIN tri ON nodes.u = tri.u"""
