"""Approximate-nearest-neighbor search over the ``embeddings`` table
(north-star requirement beyond the reference's operator set).

Two tiers:

- :func:`brute_topk` — exact cosine top-k: broadcast the (small) query
  set against the full corpus, rank per query. The baseline every ANN
  variant is measured against. At 100 TB the corpus side streams through
  executors; only queries and the final k rows per query move.
- :func:`lsh_topk` — hyperplane-LSH bucketed search (IVF-style): corpus
  vectors land in sign-pattern buckets of a fixed set of deterministic
  hyperplanes; each query searches only its own bucket. Bucket key
  computation is a pure projection; the candidate join is a bucket
  equi-join, so cost scales with corpus/2^planes per query, not corpus.

Cosines are sequential-fold double dot products (textsql.dot) — exact and
bit-identical to the DuckDB oracle, so ranks match deterministically
(ties broken by vec_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from birli_spark.functions import textsql as X
from birli_spark.functions.complex import f32

N_PLANES = 4
EMB_DIM = 64


def _plane(j: int, dim: int = EMB_DIM) -> list[float]:
    """Frozen deterministic hyperplane j (literal doubles — identical
    expression text in both engines; values pinned in
    functions/lsh_planes.py, see its derivation docstring)."""
    from birli_spark.functions.lsh_planes import PLANES

    assert dim == EMB_DIM, "planes are frozen at EMB_DIM components"
    return list(PLANES[j])


def _plane_literal(j: int, d: str) -> str:
    vals = ", ".join(repr(v) for v in _plane(j))
    if d == X.SPARK:
        return f"array({vals})"
    return f"[{vals}]"


def _bucket_expr(d: str, vec: str, planes: int = N_PLANES) -> str:
    bits = [f"IF({X.dot(d, vec, _plane_literal(j, d))} >= CAST(0 AS DOUBLE),"
            f" '1', '0')" for j in range(planes)]
    return "concat(" + ", ".join(bits) + ")"


def brute_topk(emb: DataFrame, k: int = 5, n_queries: int = 8) -> DataFrame:
    """Exact top-k by cosine for the query set ``vec_id < n_queries``.

    The query side is broadcast (it is tiny by construction); ranking is a
    per-query window — the shuffle moves only (query × corpus-survivor)
    rows, and AQE coalesces the k·queries output."""
    n = emb.select("vec_id", "embedding",
                   F.expr(X.norm(X.SPARK, "embedding")).alias("nrm"))
    q = (n.filter(F.col("vec_id") < n_queries)
         .withColumnsRenamed({"vec_id": "qid", "embedding": "q_emb",
                              "nrm": "q_nrm"}))
    cos = f"{X.dot(X.SPARK, 'q_emb', 'embedding')} / (q_nrm * nrm)"
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (n.join(F.broadcast(q), F.expr("vec_id <> qid"))
            .select("qid", "vec_id", F.expr(cos).alias("cos"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def brute_topk_oracle_sql(k: int = 5, n_queries: int = 8) -> str:
    cos = f"{X.dot(X.DUCK, 'q.embedding', 'c.embedding')} / (q.nrm * c.nrm)"
    return f"""
WITH n AS (SELECT vec_id, embedding, {X.norm(X.DUCK, 'embedding')} AS nrm
           FROM embeddings),
scored AS (
  SELECT q.vec_id AS qid, c.vec_id AS vec_id, {cos} AS cos
  FROM n q JOIN n c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {n_queries}),
ranked AS (
  SELECT qid, vec_id, cos,
    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored)
SELECT qid, vec_id, cos, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}"""


def _bit_flip_expr(bucket: str, j: int, planes: int) -> str:
    """Flip character ``j`` (0-based) of a ``planes``-char sign-pattern
    string — identical SUBSTRING semantics in Spark SQL and DuckDB."""
    head = f"SUBSTRING({bucket}, 1, {j})"
    bit = (f"CASE WHEN SUBSTRING({bucket}, {j + 1}, 1) = '1'"
           f" THEN '0' ELSE '1' END")
    tail = f"SUBSTRING({bucket}, {j + 2}, {planes - j - 1})"
    return f"concat({head}, {bit}, {tail})"


def lsh_topk(emb: DataFrame, k: int = 5, n_queries: int = 8,
             planes: int = N_PLANES,
             multiprobe: bool = True) -> DataFrame:
    """Bucketed ANN: rank only candidates in the query's hyperplane
    sign-pattern bucket — plus, with ``multiprobe`` (default), the
    ``planes`` Hamming-distance-1 buckets (each sign bit flipped once).

    **TEACHING BASELINE — not a recommended default.** Use
    :func:`ivf_topk` (recall@5 0.875 at auto-nprobe) or
    :func:`ivfpq_topk` (0.825) for retrieval. Sign-bit LSH prunes by
    ANGULAR concentration, and the measured decision is committed in
    ``ANN_RECALL_r7.json``: on embeddings whose true top-5 neighbor
    cosines sit near 0.3 (driver corpus — and any corpus without strong
    angular clustering), the production shape (12-16 planes with a
    query-directed multiprobe ladder, Lv et al. 2007) measures 0.0-0.125
    recall@5 even at 64 probes (``tools/ann_recall.py --lsh-grid``),
    because the neighbor collision probability (1 - theta/pi)^planes
    collapses when theta is large. The 4-plane 1+4-probe shape kept
    here (recall 0.55 while scanning ~31% of buckets) exists to teach
    the bucket-equi-join candidate-generation PATTERN that D3/D5/IVF
    build on — not to be picked as a retriever."""
    n = emb.select("vec_id", "embedding",
                   F.expr(X.norm(X.SPARK, "embedding")).alias("nrm"),
                   F.expr(_bucket_expr(X.SPARK, "embedding", planes))
                    .alias("bucket"))
    q = (n.filter(F.col("vec_id") < n_queries)
         .withColumnsRenamed({"vec_id": "qid", "embedding": "q_emb",
                              "nrm": "q_nrm", "bucket": "q_bucket"}))
    if multiprobe:
        flips = ["q_bucket"] + [
            _bit_flip_expr("q_bucket", j, planes) for j in range(planes)]
        q = (q.withColumn("p_bucket",
                          F.explode(F.array(*[F.expr(e) for e in flips])))
             .drop("q_bucket"))
    else:
        q = q.withColumnRenamed("q_bucket", "p_bucket")
    cos = f"{X.dot(X.SPARK, 'q_emb', 'embedding')} / (q_nrm * nrm)"
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (n.join(F.broadcast(q),
                   (F.col("bucket") == F.col("p_bucket"))
                   & F.expr("vec_id <> qid"))
            .select("qid", "vec_id", F.expr(cos).alias("cos"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


IVF_STRIDE = 50
#: default probe count: None = AUTO — the probe count scales with the
#: cell count as ``greatest(4, ceil(2 * sqrt(n_cells)))``, computed
#: IN-PLAN from the centroid table (a 1-row broadcast scalar, so the
#: DuckDB oracle runs the identical rule). Rationale: at the driver
#: scale (10 cells) this resolves to 7 probes — measured recall@5
#: 0.875 (tools/ann_recall.py, ANN_RECALL_r6.json) vs 0.675 at the old
#: fixed nprobe=4 — while at production scale (cells ~ sqrt(N), e.g.
#: 10^4 cells for 10^8 vectors) the same rule probes 2*sqrt(C)/C =
#: 2 % of cells, the standard IVF operating point. An integer value
#: pins the probe count explicitly (the sweep artifact uses this).
IVF_NPROBE: int | None = None

#: the auto rule as engine SQL over a cell-count column/subquery
def _auto_nprobe_sql(n_cells: str) -> str:
    return f"GREATEST(4, CAST(CEIL(2.0 * SQRT({n_cells})) AS INT))"


def _ivf_assignments(emb: DataFrame, n_queries: int, stride: int,
                     nprobe: int | None) -> tuple[DataFrame, DataFrame]:
    """Shared IVF build/search front half: (assigned corpus with
    ``cell``, query probe list) — see :func:`ivf_topk` for the scale
    rationale. ``nprobe=None`` resolves the auto rule in-plan from the
    centroid count (1-row broadcast scalar)."""
    n = emb.select("vec_id", "embedding",
                   F.expr(X.norm(X.SPARK, "embedding")).alias("nrm"))
    cent = (n.filter(F.col("vec_id") % stride == 0)
            .select(F.col("vec_id").alias("cid"),
                    F.col("embedding").alias("c_emb"),
                    F.col("nrm").alias("c_nrm")))
    cos_c = f"{X.dot(X.SPARK, 'embedding', 'c_emb')} / (nrm * c_nrm)"
    scored = (n.join(F.broadcast(cent))
              .select("vec_id", "embedding", "nrm", "cid",
                      F.expr(cos_c).alias("cos_c")))
    assigned = (scored
                .groupBy("vec_id", "embedding", "nrm")
                .agg(F.max(F.struct(F.col("cos_c").alias("c"),
                                    (-F.col("cid")).alias("ncid"))).alias("m"))
                .select("vec_id", "embedding", "nrm",
                        (-F.col("m.ncid")).alias("cell")))
    wq = Window.partitionBy("vec_id").orderBy(F.desc("cos_c"), F.asc("cid"))
    ranked = (scored.filter(F.col("vec_id") < n_queries)
              .withColumn("pr", F.row_number().over(wq)))
    if nprobe is None:
        n_cells = cent.agg(F.count("*").alias("_nc"))
        ranked = (ranked.crossJoin(F.broadcast(n_cells))
                  .filter(F.col("pr")
                          <= F.expr(_auto_nprobe_sql("_nc")))
                  .drop("_nc"))
    else:
        ranked = ranked.filter(F.col("pr") <= nprobe)
    qprobe = ranked.select(F.col("vec_id").alias("qid"),
                           F.col("embedding").alias("q_emb"),
                           F.col("nrm").alias("q_nrm"),
                           F.col("cid").alias("q_cell"))
    return assigned, qprobe


def ivf_topk(emb: DataFrame, k: int = 5, n_queries: int = 8,
             stride: int = IVF_STRIDE, nprobe: int = IVF_NPROBE) -> DataFrame:
    """IVF (inverted-file) ANN: corpus vectors are assigned to their
    nearest **centroid cell**; each query probes only its ``nprobe``
    nearest cells and ranks the candidates living there.

    Centroids are a deterministic corpus subset (``vec_id % stride == 0``
    — a real system would k-means; the cell structure and query plan are
    identical). The scale shape:

    - *build* — one narrow pass: corpus × broadcast(centroids) scored,
      then arg-max per vector via ``max(struct(cos, -cid))``, which is
      map-side combinable (partial aggregation), so only N assignment
      rows shuffle — never the N×C score rows;
    - *search* — probes are a tiny broadcast; candidates come from a
      cell equi-join, so cost per query is ~N/C·nprobe, not N.

    Recall < 1 by design (the IVF approximation); ties broken by cid /
    vec_id so both engines rank identically."""
    assigned, qprobe = _ivf_assignments(emb, n_queries, stride, nprobe)
    cos = f"{X.dot(X.SPARK, 'q_emb', 'embedding')} / (q_nrm * nrm)"
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (assigned.join(F.broadcast(qprobe),
                          (F.col("cell") == F.col("q_cell"))
                          & F.expr("vec_id <> qid"))
            .select("qid", "vec_id", F.expr(cos).alias("cos"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def ivf_topk_oracle_sql(k: int = 5, n_queries: int = 8,
                        stride: int = IVF_STRIDE,
                        nprobe: int | None = IVF_NPROBE) -> str:
    cos_c = (f"{X.dot(X.DUCK, 'n.embedding', 'cent.c_emb')}"
             f" / (n.nrm * cent.c_nrm)")
    cos = f"{X.dot(X.DUCK, 'q.q_emb', 'c.embedding')} / (q.q_nrm * c.nrm)"
    np_sql = (_auto_nprobe_sql("(SELECT COUNT(*) FROM cent)")
              if nprobe is None else str(nprobe))
    return f"""
WITH n AS (SELECT vec_id, embedding, {X.norm(X.DUCK, 'embedding')} AS nrm
           FROM embeddings),
cent AS (SELECT vec_id AS cid, embedding AS c_emb, nrm AS c_nrm
         FROM n WHERE vec_id % {stride} = 0),
scored AS (
  SELECT n.vec_id, n.embedding, n.nrm, cent.cid, {cos_c} AS cos_c
  FROM n CROSS JOIN cent),
assigned AS (
  SELECT vec_id, embedding, nrm, cid AS cell FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY cos_c DESC, cid ASC) AS rn
    FROM scored) WHERE rn = 1),
qprobe AS (
  SELECT vec_id AS qid, embedding AS q_emb, nrm AS q_nrm, cid AS q_cell
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY cos_c DESC, cid ASC) AS pr
    FROM scored WHERE vec_id < {n_queries}) WHERE pr <= {np_sql}),
cand AS (
  SELECT q.qid, c.vec_id, {cos} AS cos
  FROM qprobe q JOIN assigned c ON c.cell = q.q_cell AND c.vec_id <> q.qid),
ranked AS (
  SELECT qid, vec_id, cos, ROW_NUMBER() OVER (
    PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rank
  FROM cand)
SELECT qid, vec_id, cos, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}"""


def lsh_topk_oracle_sql(k: int = 5, n_queries: int = 8,
                        planes: int = N_PLANES,
                        multiprobe: bool = True) -> str:
    cos = f"{X.dot(X.DUCK, 'q.embedding', 'c.embedding')} / (q.nrm * c.nrm)"
    bucket = _bucket_expr(X.DUCK, "embedding", planes)
    if multiprobe:
        arms = ["SELECT vec_id, embedding, nrm, bucket AS p_bucket"
                " FROM nq"] + [
            f"SELECT vec_id, embedding, nrm,"
            f" {_bit_flip_expr('bucket', j, planes)} AS p_bucket FROM nq"
            for j in range(planes)]
        probes = "\nUNION ALL ".join(arms)
    else:
        probes = ("SELECT vec_id, embedding, nrm, bucket AS p_bucket"
                  " FROM nq")
    return f"""
WITH n AS (SELECT vec_id, embedding, {X.norm(X.DUCK, 'embedding')} AS nrm,
                  {bucket} AS bucket
           FROM embeddings),
nq AS (SELECT * FROM n WHERE vec_id < {n_queries}),
probes AS ({probes}),
scored AS (
  SELECT q.vec_id AS qid, c.vec_id AS vec_id, {cos} AS cos
  FROM probes q JOIN n c ON c.bucket = q.p_bucket
   AND c.vec_id <> q.vec_id),
ranked AS (
  SELECT qid, vec_id, cos,
    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored)
SELECT qid, vec_id, cos, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}"""


def label_centroids(emb: DataFrame) -> DataFrame:
    """Per-label embedding centroid — the cluster-profile aggregate of an
    embedding-space QA pass (and the exact form of the reduce step that
    :func:`ivf_topk`'s coarse quantizer would train with).

    ``posexplode`` unfolds the vector column to (label, dim, component)
    rows; the groupBy partial-aggregates map-side, so the shuffle carries
    only ``labels × dim × partitions`` partial sums regardless of corpus
    size — the canonical way to average array columns at 100 TB without
    driver collection. Component sums are f32-demoted to absorb
    order-dependent last-ulp drift of the distributed SUM.
    """
    return (emb.select("label", F.posexplode("embedding")
                       .alias("dim", "component"))
            .groupBy("label", F.col("dim").cast("int").alias("dim"))
            .agg(F.count("*").alias("n_vectors"),
                 F.expr(f32("SUM(CAST(component AS DOUBLE)) / COUNT(*)"))
                  .alias("centroid")))


def label_centroids_oracle_sql(dim: int = EMB_DIM) -> str:
    return f"""
WITH dims AS (SELECT unnest(generate_series(0, {dim - 1})) AS dim)
SELECT label, CAST(d.dim AS INT) AS dim, COUNT(*) AS n_vectors,
  {f32('SUM(CAST(embedding[d.dim + 1] AS DOUBLE)) / COUNT(*)')}
    AS centroid
FROM embeddings, dims d
GROUP BY label, d.dim"""


PREFIX_DIM = 16
RERANK_CAND = 50


def rerank_topk(emb: DataFrame, k: int = 5, n_queries: int = 8,
                prefix: int = PREFIX_DIM,
                cand: int = RERANK_CAND) -> DataFrame:
    """EMB5 — two-stage coarse→rerank ANN (the Matryoshka/production
    retrieval shape): stage 1 scores every corpus vector with only the
    first ``prefix`` dims (4× less arithmetic and — with truncated
    storage — 4× less I/O) and keeps ``cand`` candidates per query;
    stage 2 reranks just those with the full-dimension cosine.

    Scale: stage 1 is the brute pass with a narrower vector (at 100 TB
    the prefix column would be stored separately so the scan reads 16
    floats, not 64); stage 2 touches cand×queries rows — negligible.
    Output marks each hit's coarse rank so recall-vs-full is auditable.
    Fully deterministic: ties break on vec_id at both stages."""
    pfx = f"slice(embedding, 1, {prefix})"
    n = emb.select(
        "vec_id", "embedding",
        F.expr(X.norm(X.SPARK, "embedding")).alias("nrm"),
        F.expr(pfx).alias("p_emb"),
        F.expr(X.norm(X.SPARK, pfx)).alias("p_nrm"))
    q = (n.filter(F.col("vec_id") < n_queries)
         .withColumnsRenamed({"vec_id": "qid", "embedding": "q_emb",
                              "nrm": "q_nrm", "p_emb": "qp_emb",
                              "p_nrm": "qp_nrm"}))
    cos_p = f"{X.dot(X.SPARK, 'qp_emb', 'p_emb')} / (qp_nrm * p_nrm)"
    wp = Window.partitionBy("qid").orderBy(
        F.desc("cos_p"), F.asc("vec_id"))
    coarse = (n.join(F.broadcast(q), F.expr("vec_id <> qid"))
              .withColumn("cos_p", F.expr(cos_p))
              .withColumn("coarse_rank", F.row_number().over(wp))
              .filter(F.col("coarse_rank") <= cand))
    cos = f"{X.dot(X.SPARK, 'q_emb', 'embedding')} / (q_nrm * nrm)"
    wf = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (coarse
            .withColumn("cos", F.expr(cos))
            .withColumn("rank", F.row_number().over(wf))
            .filter(F.col("rank") <= k)
            .select("qid", "vec_id", "cos", "rank",
                    F.col("coarse_rank").cast("int").alias("coarse_rank")))


def rerank_topk_oracle_sql(k: int = 5, n_queries: int = 8,
                           prefix: int = PREFIX_DIM,
                           cand: int = RERANK_CAND) -> str:
    pfx = lambda col: f"{col}[1:{prefix}]"
    cos_p = (f"{X.dot(X.DUCK, pfx('q.embedding'), pfx('c.embedding'))}"
             f" / (q.p_nrm * c.p_nrm)")
    cos = f"{X.dot(X.DUCK, 'q.embedding', 'c.embedding')} / (q.nrm * c.nrm)"
    return f"""
WITH n AS (
  SELECT vec_id, embedding,
    {X.norm(X.DUCK, 'embedding')} AS nrm,
    {X.norm(X.DUCK, f'embedding[1:{prefix}]')} AS p_nrm
  FROM embeddings),
coarse AS (
  SELECT qid, vec_id, nrm, q_nrm, coarse_rank FROM (
    SELECT q.vec_id AS qid, c.vec_id AS vec_id, c.nrm, q.nrm AS q_nrm,
      ROW_NUMBER() OVER (PARTITION BY q.vec_id
                         ORDER BY {cos_p} DESC, c.vec_id ASC)
        AS coarse_rank
    FROM n q JOIN n c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < {n_queries})
  WHERE coarse_rank <= {cand}),
reranked AS (
  SELECT co.qid, co.vec_id, {cos} AS cos, co.coarse_rank,
    ROW_NUMBER() OVER (PARTITION BY co.qid
                       ORDER BY {cos} DESC, co.vec_id ASC) AS rank
  FROM coarse co
  JOIN n q ON q.vec_id = co.qid
  JOIN n c ON c.vec_id = co.vec_id)
SELECT qid, vec_id, cos, CAST(rank AS INT) AS rank,
  CAST(coarse_rank AS INT) AS coarse_rank
FROM reranked WHERE rank <= {k}"""


#: ADC shortlist size = refine x k — measured recall@5 (tools/
#: ann_recall.py): refine=4 -> 0.45, 8 -> 0.575 at nprobe=4; with the
#: round-6 AUTO nprobe (7 at driver scale) refine=16 measures 0.875
#: recall@5 (ANN_RECALL_r6.json). The exact rerank touches
#: refine*k*queries rows either way (negligible)
IVFPQ_REFINE = 16


def ivfpq_topk(emb: DataFrame, k: int = 5, n_queries: int = 8,
               stride: int = IVF_STRIDE, nprobe: int | None = IVF_NPROBE,
               refine: int = IVFPQ_REFINE) -> DataFrame:
    """ANN5 — the complete FAISS-style **IVF-PQ + rerank** retrieval
    recipe in one plan (Jégou et al. 2011): coarse IVF cells prune the
    corpus, PQ codes + a per-query ADC lookup table give cheap
    approximate distances to shortlist ``refine × k`` candidates, and
    an exact-cosine rerank produces the final top-k.

    Scale shape per stage:

    - *build*: cell assignment and PQ coding are both pure projections
      against broadcast codebooks (zero corpus shuffles — see
      :func:`ivf_topk`, :func:`~.quantization.pq_codes`);
    - *ADC*: the lookup table is queries × subspaces × codebook =
      8×8×16 rows — broadcast; the approximate distance per candidate
      is 8 broadcast equi-joins on (qid, code), never a vector op;
    - *rerank*: the exact 64-dim cosine fold runs only on the
      ``refine × k`` shortlisted rows per query.

    Determinism: sub-distance folds are sequential; the ADC sum adds
    subspace terms in literal order; both ranks tie-break on vec_id."""
    from birli_spark.operators.quantization import (PQ_K, PQ_M, PQ_SUB,
                                                    _d2_spark)
    assigned, qprobe = _ivf_assignments(emb, n_queries, stride, nprobe)
    # PQ codes per corpus vector (per-subspace codeword columns)
    cb_row = (emb.filter(F.col("vec_id") < PQ_K)
              .select(F.col("vec_id").alias("cid"),
                      F.col("embedding").alias("c_emb"))
              .agg(F.expr("array_sort(collect_list("
                          "struct(cid AS k, c_emb)))").alias("cbs")))
    coded = assigned.join(F.broadcast(cb_row))
    for m in range(PQ_M):
        best = (f"array_min(transform(cbs, "
                f"c -> struct({_d2_spark(m)} AS d, c.k AS k)))")
        coded = coded.withColumn(f"k_{m}", F.expr(f"{best}.k"))
    coded = coded.drop("cbs")
    # ADC lookup table: d2(query subvector m, codebook entry j)
    cb = (emb.filter(F.col("vec_id") < PQ_K)
          .select(F.col("vec_id").alias("j"),
                  F.col("embedding").alias("c_emb")))
    lut = qprobe.select("qid", F.col("q_emb").alias("embedding")).distinct()
    lut = lut.join(F.broadcast(cb.withColumnRenamed("c_emb", "__ce")))
    luts = []
    for m in range(PQ_M):
        d2 = _d2_spark(m).replace("c.c_emb", "__ce")
        luts.append(lut.select(
            "qid", F.lit(m).alias("m"), "j", F.expr(d2).alias("d2")))
    lut_long = luts[0]
    for l_ in luts[1:]:
        lut_long = lut_long.unionByName(l_)
    # candidates from probed cells; ADC = sum of 8 LUT lookups
    cand = (coded.join(F.broadcast(qprobe),
                       (F.col("cell") == F.col("q_cell"))
                       & F.expr("vec_id <> qid"))
            .select("qid", "vec_id", "embedding", "nrm", "q_emb", "q_nrm",
                    *[f"k_{m}" for m in range(PQ_M)]))
    for m in range(PQ_M):
        lm = F.broadcast(lut_long.filter(F.col("m") == m)
                         .select("qid", F.col("j").alias(f"k_{m}"),
                                 F.col("d2").alias(f"d_{m}")))
        cand = cand.join(lm, ["qid", f"k_{m}"])
    adc = "(" * (PQ_M - 1) + " + ".join(
        f"d_{m}" if m == 0 else f"d_{m})" for m in range(PQ_M))
    ws = Window.partitionBy("qid").orderBy(F.asc("adc"), F.asc("vec_id"))
    short = (cand.withColumn("adc", F.expr(adc))
             .withColumn("sr", F.row_number().over(ws))
             .filter(F.col("sr") <= refine * k))
    cos = f"{X.dot(X.SPARK, 'q_emb', 'embedding')} / (q_nrm * nrm)"
    wf = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (short.select("qid", "vec_id", F.expr(cos).alias("cos"),
                         F.expr(f32("adc")).alias("adc"))
            .withColumn("rank", F.row_number().over(wf))
            .filter(F.col("rank") <= k))


def ivfpq_topk_oracle_sql(k: int = 5, n_queries: int = 8,
                          stride: int = IVF_STRIDE,
                          nprobe: int | None = IVF_NPROBE,
                          refine: int = IVFPQ_REFINE) -> str:
    from birli_spark.operators.quantization import PQ_K, PQ_M, PQ_SUB
    cos_c = (f"{X.dot(X.DUCK, 'n.embedding', 'cent.c_emb')}"
             f" / (n.nrm * cent.c_nrm)")
    np_sql = (_auto_nprobe_sql("(SELECT COUNT(*) FROM cent)")
              if nprobe is None else str(nprobe))

    def d2(vec: str, m: str) -> str:
        return (f"list_sum(list_transform(range(1, {PQ_SUB} + 1), i -> "
                f"(CAST({vec}[{m} * {PQ_SUB} + i] AS DOUBLE) "
                f"- CAST(cb.c_emb[{m} * {PQ_SUB} + i] AS DOUBLE)) * "
                f"(CAST({vec}[{m} * {PQ_SUB} + i] AS DOUBLE) "
                f"- CAST(cb.c_emb[{m} * {PQ_SUB} + i] AS DOUBLE))))")

    kcols = ", ".join(
        f"MAX(CASE WHEN m = {m} THEN k END) AS k_{m}" for m in range(PQ_M))
    adc_joins = "\n  ".join(
        f"JOIN lut l{m} ON l{m}.qid = pb.qid AND l{m}.m = {m} "
        f"AND l{m}.j = cd.k_{m}" for m in range(PQ_M))
    adc = "(" * (PQ_M - 1) + " + ".join(
        f"l_0.d2" if False else (f"l_{m}.d2" if m == 0 else f"l_{m}.d2)")
        for m in range(PQ_M))
    adc = adc.replace("l_", "l")
    cos = f"{X.dot(X.DUCK, 'pb.q_emb', 'cd.embedding')} / (pb.q_nrm * cd.nrm)"
    return f"""
WITH n AS (SELECT vec_id, embedding, {X.norm(X.DUCK, 'embedding')} AS nrm
           FROM embeddings),
cent AS (SELECT vec_id AS cid, embedding AS c_emb, nrm AS c_nrm
         FROM n WHERE vec_id % {stride} = 0),
scored AS (
  SELECT n.vec_id, n.embedding, n.nrm, cent.cid, {cos_c} AS cos_c
  FROM n CROSS JOIN cent),
assigned AS (
  SELECT vec_id, embedding, nrm, cid AS cell FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY cos_c DESC, cid ASC) AS rn
    FROM scored) WHERE rn = 1),
qprobe AS (
  SELECT vec_id AS qid, embedding AS q_emb, nrm AS q_nrm, cid AS q_cell
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY cos_c DESC, cid ASC) AS pr
    FROM scored WHERE vec_id < {n_queries}) WHERE pr <= {np_sql}),
cb AS (SELECT vec_id AS k, embedding AS c_emb FROM embeddings
       WHERE vec_id < {PQ_K}),
subs AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m),
code_scored AS (
  SELECT a.vec_id, s.m, cb.k AS k, {d2('a.embedding', 's.m')} AS d2
  FROM assigned a CROSS JOIN (SELECT k AS k, c_emb FROM cb) cb
  CROSS JOIN subs s),
codes AS (
  SELECT vec_id, {kcols} FROM (
    SELECT vec_id, m, k FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                   ORDER BY d2 ASC, k ASC) AS rn
      FROM code_scored) WHERE rn = 1)
  GROUP BY vec_id),
lut AS (
  SELECT q.qid, s.m, cb.k AS j, {d2('q.q_emb', 's.m')} AS d2
  FROM (SELECT DISTINCT qid, q_emb FROM qprobe) q
  CROSS JOIN (SELECT k AS k, c_emb FROM cb) cb CROSS JOIN subs s),
cand AS (
  SELECT pb.qid, cd.vec_id, cd.embedding, cd.nrm, pb.q_emb, pb.q_nrm,
    c.* EXCLUDE (vec_id)
  FROM qprobe pb
  JOIN assigned cd ON cd.cell = pb.q_cell AND cd.vec_id <> pb.qid
  JOIN codes c ON c.vec_id = cd.vec_id),
shortl AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY qid ORDER BY adc ASC, vec_id ASC) AS sr
  FROM (
    SELECT cd.qid, cd.vec_id, cd.embedding, cd.nrm, cd.q_emb, cd.q_nrm,
      {adc} AS adc
    FROM (SELECT * FROM cand) cd(qid, vec_id, embedding, nrm, q_emb,
                                 q_nrm, {', '.join(f'k_{m}' for m in range(PQ_M))})
    {adc_joins.replace('pb.qid', 'cd.qid').replace('cd.k_', 'cd.k_')}
  )),
ranked AS (
  SELECT qid, vec_id,
    {cos.replace('pb.', '').replace('cd.', '')} AS cos,
    {f32('adc')} AS adc,
    ROW_NUMBER() OVER (PARTITION BY qid
                       ORDER BY {cos.replace('pb.', '').replace('cd.', '')}
                       DESC, vec_id ASC) AS rank
  FROM shortl WHERE sr <= {refine * k})
SELECT qid, vec_id, cos, adc, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}"""
