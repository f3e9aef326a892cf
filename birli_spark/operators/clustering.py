"""Distributed k-means clustering over the ``embeddings`` table — the
iterative-algorithm family of the training-data pipeline (the real
version of the coarse quantizer that :mod:`.similarity`'s IVF index
assumes, and the canonical embedding-space corpus-QA pass).

Lloyd's algorithm with **deterministic everything** so the run is
oracle-checkable end-to-end, not just rows-only: initial centroids are
the first ``k`` vectors by ``vec_id``; a fixed iteration count (no
data-dependent convergence test); argmin ties break on the smaller
cluster id; every float reduction is either a sequential fold
(:func:`birli_spark.functions.textsql.dot`) or an f32-demoted group mean,
the two cross-engine-exact reduction shapes this repo standardizes on.

Scale shape per iteration (the same plan MLlib's k-means lowers to,
minus its driver-side centroid collect):

- *assign*: the k centroids collapse to one broadcast array row; each
  corpus row scores ``d² = x·x − 2·x·c + c·c`` (x·x computed once,
  reused every iteration) against all k in a single ``array_min`` fold
  — a pure projection, so **zero** corpus rows shuffle on assignment;
- *update*: ``posexplode`` + groupBy(cell, dim) mean — the shuffle
  carries k×dim×partitions partial sums regardless of corpus size —
  then k tiny rows reassembled into centroid arrays.

The centroids stay a DataFrame throughout (no ``collect``), so the whole
3-iteration run is one lazy plan and the oracle can replay it as a CTE
chain. Reference analogue: none — the reference (a fixed batch
preprocessing pipeline) has no iterative operator; SURVEY.md §2.8 lists
this family as beyond-reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from birli_spark.functions import textsql as X
from birli_spark.functions.complex import f32

K_CLUSTERS = 8
KMEANS_ITERS = 3
EMB_DIM = 64

_D2_SPARK = f"xx - 2 * {X.dot(X.SPARK, 'embedding', 'c.c_emb')} + c.cc"


def _assign(n: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment as a **pure projection**: the k
    centroids collapse to one array row, broadcast onto the corpus, and
    the argmin is ``array_min`` over per-centroid (d², cid) structs —
    struct ordering gives the cid tie-break for free. No corpus rows
    shuffle: the naive join + per-vector groupBy argmin would re-shuffle
    all N embedding rows every iteration; this shuffles only the k
    centroid rows."""
    cents_row = cent.agg(F.expr(
        "array_sort(collect_list(struct(cid, c_emb, cc)))").alias("cents"))
    m = (f"array_min(transform(cents, "
         f"c -> struct({_D2_SPARK} AS d, c.cid AS cid)))")
    return (n.join(F.broadcast(cents_row))
            .select("vec_id", "embedding", "xx", F.expr(m).alias("m"))
            .select("vec_id", "embedding", "xx",
                    F.col("m.cid").alias("cell"), F.col("m.d").alias("d2")))


def _update(assigned: DataFrame) -> DataFrame:
    """Per-cluster per-dimension f32-demoted mean, reassembled into
    centroid arrays (dim-sorted, so the fold order is fixed)."""
    means = (assigned
             .select("cell", F.posexplode("embedding").alias("dim", "v"))
             .groupBy("cell", F.col("dim").cast("int").alias("dim"))
             .agg(F.expr(f32("SUM(CAST(v AS DOUBLE)) / COUNT(*)"))
                  .alias("m")))
    return (means
            .groupBy(F.col("cell").alias("cid"))
            .agg(F.expr("transform(array_sort(collect_list(struct(dim, m)))"
                        ", s -> s.m)").alias("c_emb"))
            .withColumn("cc", F.expr(X.dot(X.SPARK, "c_emb", "c_emb"))))


def _lloyd(emb: DataFrame, k: int,
           iters: int) -> tuple[DataFrame, DataFrame]:
    """Shared Lloyd's core: (final centroids, final assignment)."""
    n = emb.select("vec_id", "embedding",
                   F.expr(X.dot(X.SPARK, "embedding", "embedding"))
                   .alias("xx"))
    cent = (n.filter(F.col("vec_id") < k)
            .select(F.col("vec_id").alias("cid"),
                    F.col("embedding").alias("c_emb"),
                    F.col("xx").alias("cc")))
    for _ in range(iters):
        cent = _update(_assign(n, cent))
    return cent, _assign(n, cent)


def kmeans(emb: DataFrame, k: int = K_CLUSTERS,
           iters: int = KMEANS_ITERS) -> DataFrame:
    """K1 — k-means cluster profile after ``iters`` Lloyd iterations:
    one row per (cluster, dim) with the centroid component, cluster
    population and f32-demoted inertia (sum of member d²)."""
    cent, final = _lloyd(emb, k, iters)
    stats = (final.groupBy(F.col("cell").alias("cid"))
             .agg(F.count("*").alias("n_vectors"),
                  F.expr(f32("SUM(d2)")).alias("inertia")))
    return (cent
            .join(F.broadcast(stats), "cid")
            .select(F.col("cid").cast("int").alias("cluster"),
                    F.posexplode("c_emb").alias("dim", "centroid"),
                    "n_vectors", "inertia")
            .select("cluster", F.col("dim").cast("int").alias("dim"),
                    "centroid", "n_vectors", "inertia"))


def assignments(emb: DataFrame, k: int = K_CLUSTERS,
                iters: int = KMEANS_ITERS) -> DataFrame:
    """Final cluster assignment (vec_id, embedding, xx, cell, d2) after
    ``iters`` Lloyd iterations — the shared front half of :func:`kmeans`
    and :func:`semantic_dedup`."""
    return _lloyd(emb, k, iters)[1]


SEMDEDUP_TAU = 0.35


def semantic_dedup(emb: DataFrame, k: int = K_CLUSTERS,
                   iters: int = KMEANS_ITERS,
                   tau: float = SEMDEDUP_TAU) -> DataFrame:
    """D10 — SemDeDup (Abbas et al. 2023): cluster the embedding space,
    then mark near-duplicates **within each cluster only** — a vector is
    dropped when an earlier (smaller vec_id) same-cluster vector has
    cosine ≥ tau, so exactly one representative of each ε-neighborhood
    chain survives deterministically.

    Scale shape: the O(N²) pairwise cosine of :func:`~.dedup.
    embedding_neardup` becomes Σ|cluster|² — the self-join is an
    **equi-join on the cluster id**, so candidate pairs co-locate by
    cluster and nothing crosses clusters; with balanced k-means cells
    this is N²/k work and shuffles only (vec_id, cell, nrm)-width rows.
    The final keep/drop is a groupBy(vec) count + one left join back."""
    # three consumers (both self-join sides + the join-back) — persist so
    # the kmeans iteration chain runs once, not three times
    from pyspark.storagelevel import StorageLevel
    asg = (assignments(emb, k, iters)
           .withColumn("nrm", F.expr("SQRT(xx)"))
           .persist(StorageLevel.MEMORY_AND_DISK))
    a, b = asg.alias("a"), asg.alias("b")
    cos = (f"{X.dot(X.SPARK, 'a.embedding', 'b.embedding')}"
           f" / (a.nrm * b.nrm)")
    dropped = (a.join(b, F.expr("a.cell = b.cell AND a.vec_id > b.vec_id"))
               .filter(F.expr(cos) >= tau)
               .groupBy(F.expr("a.vec_id").alias("vec_id"))
               .agg(F.count("*").alias("n_dups")))
    return (asg.join(dropped, "vec_id", "left")
            .select("vec_id", F.col("cell").cast("int").alias("cluster"),
                    F.expr("n_dups IS NULL").alias("keep"),
                    F.coalesce("n_dups", F.lit(0)).alias("n_dups")))


def _kmeans_ctes(k: int, iters: int, dim: int) -> str:
    """WITH-chain through ``assign_{iters}`` (the final assignment) —
    shared by the kmeans and semantic-dedup oracles."""
    d2 = (f"n.xx - 2 * {X.dot(X.DUCK, 'n.embedding', 'c.c_emb')}"
          f" + c.cc")
    mean = f32(f"SUM(CAST(embedding[d.dim + 1] AS DOUBLE)) / COUNT(*)")

    def assign(i: int) -> str:
        return f"""
scored_{i} AS (
  SELECT n.vec_id, n.embedding, n.xx, c.cid, {d2} AS d2
  FROM n CROSS JOIN cent_{i} c),
assign_{i} AS (
  SELECT vec_id, embedding, xx, cid AS cell, d2 FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS rn
    FROM scored_{i}) WHERE rn = 1)"""

    def update(i: int) -> str:
        return f"""
means_{i} AS (
  SELECT cell, CAST(d.dim AS INT) AS dim, {mean} AS m
  FROM assign_{i}, dims d GROUP BY cell, d.dim),
cent_{i + 1} AS (
  SELECT cid, c_emb, {X.dot(X.DUCK, 'c_emb', 'c_emb')} AS cc FROM (
    SELECT cell AS cid, list(m ORDER BY dim) AS c_emb
    FROM means_{i} GROUP BY cell))"""

    steps = ",".join(assign(i) + "," + update(i) for i in range(iters))
    return f"""
WITH dims AS (SELECT unnest(generate_series(0, {dim - 1})) AS dim),
n AS (SELECT vec_id, embedding,
             {X.dot(X.DUCK, 'embedding', 'embedding')} AS xx
      FROM embeddings),
cent_0 AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c_emb, xx AS cc
  FROM n WHERE vec_id < {k}),{steps},{assign(iters)}"""


def kmeans_oracle_sql(k: int = K_CLUSTERS, iters: int = KMEANS_ITERS,
                      dim: int = EMB_DIM) -> str:
    return f"""{_kmeans_ctes(k, iters, dim)},
stats AS (
  SELECT cell AS cid, COUNT(*) AS n_vectors, {f32('SUM(d2)')} AS inertia
  FROM assign_{iters} GROUP BY cell)
SELECT CAST(c.cid AS INT) AS cluster, d.dim,
  c.c_emb[d.dim + 1] AS centroid, s.n_vectors, s.inertia
FROM cent_{iters} c
JOIN stats s ON s.cid = c.cid
CROSS JOIN (SELECT CAST(dim AS INT) AS dim FROM dims) d"""


def semantic_dedup_oracle_sql(k: int = K_CLUSTERS,
                              iters: int = KMEANS_ITERS,
                              dim: int = EMB_DIM,
                              tau: float = SEMDEDUP_TAU) -> str:
    cos = (f"{X.dot(X.DUCK, 'a.embedding', 'b.embedding')}"
           f" / (a.nrm * b.nrm)")
    return f"""{_kmeans_ctes(k, iters, dim)},
asg AS (SELECT vec_id, embedding, cell, SQRT(xx) AS nrm
        FROM assign_{iters}),
dropped AS (
  SELECT a.vec_id, COUNT(*) AS n_dups
  FROM asg a JOIN asg b
    ON a.cell = b.cell AND a.vec_id > b.vec_id
  WHERE {cos} >= {tau!r}
  GROUP BY a.vec_id)
SELECT asg.vec_id, CAST(asg.cell AS INT) AS cluster,
  d.n_dups IS NULL AS keep, COALESCE(d.n_dups, 0) AS n_dups
FROM asg LEFT JOIN dropped d ON asg.vec_id = d.vec_id"""
