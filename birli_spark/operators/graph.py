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
SELECT r.source, r.r AS rank_ticks,
  COALESCE(o.n_out, 0) AS n_out, COALESCE(o.out_w, 0) AS out_w
FROM ranks_{iters} r LEFT JOIN outw o ON r.source = o.src"""
