"""Int8 embedding quantization QA — the compression pass a vector store
runs before indexing 100 TB of embeddings (beyond-reference, training-
data north star).

Per vector: symmetric max-abs int8 quantization
``q_i = clamp(floor(x_i/scale·127 + 0.5), −127, 127)`` with
``scale = max|x_i|``, plus the stats a pipeline gates on — f32-demoted
reconstruction MSE, saturation count, and a content hash of the code
array (the dedup key of the quantized store).

Everything is a **pure narrow projection** (whole-stage codegen over the
scan, zero shuffle): the max and the MSE are per-row array ops, not
group aggregates. Rounding is spelled ``FLOOR(x + 0.5)`` — half-up in
both engines — instead of ROUND, whose tie semantics differ across
engines; the MSE is a sequential fold (:func:`textsql.dot` over the
error array), the repo's cross-engine-exact reduction shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from birli_spark.functions import textsql as X
from birli_spark.functions.complex import f32

EMB_DIM = 64


def _exprs(d: str, dim: int = EMB_DIM) -> dict[str, str]:
    e = "embedding"
    absd = X.ltransform(d, e, "x -> ABS(CAST(x AS DOUBLE))")
    scale = X.arr_max(d, absd)
    # 1-based element access in both dialects
    el = (lambda i: f"element_at({e}, {i})") if d == X.SPARK \
        else (lambda i: f"{e}[{i}]")
    idx = X.seq(d, "1", str(dim))
    qi = (f"CAST(GREATEST(CAST(-127 AS DOUBLE), LEAST(CAST(127 AS DOUBLE), "
          f"FLOOR(CAST({el('i')} AS DOUBLE) / scale * CAST(127 AS DOUBLE) "
          f"+ CAST(0.5 AS DOUBLE)))) AS INT)")
    q = X.ltransform(d, idx, f"i -> {qi}")
    err = (f"CAST({el('i')} AS DOUBLE) "
           f"- CAST(element_at(q, i) AS DOUBLE) * scale / CAST(127 AS DOUBLE)"
           if d == X.SPARK else
           f"CAST({el('i')} AS DOUBLE) "
           f"- CAST(q[i] AS DOUBLE) * scale / CAST(127 AS DOUBLE)")
    errs = X.ltransform(d, idx, f"i -> {err}")
    mse = f"{X.dot(d, 'errs', 'errs')} / CAST({dim} AS DOUBLE)"
    clipped = X.size(d, X.lfilter(d, "q", "x -> ABS(x) = 127"))
    qstr = X.ltransform(d, "q", "x -> CAST(x AS STRING)") if d == X.SPARK \
        else X.ltransform(d, "q", "x -> CAST(x AS VARCHAR)")
    join = (f"concat_ws(',', {qstr})" if d == X.SPARK
            else f"array_to_string({qstr}, ',')")
    return {"scale_expr": scale, "q_expr": q, "errs_expr": errs,
            "mse": f32(mse), "n_clipped": f"CAST({clipped} AS INT)",
            "q_md5": f"md5({join})"}


def quantize_stats(emb: DataFrame, dim: int = EMB_DIM) -> DataFrame:
    """EMB3 — per-vector int8 quantization stats: scale, reconstruction
    MSE, saturated-code count, and the md5 of the code array."""
    e = _exprs(X.SPARK, dim)
    return (emb
            .select("vec_id",
                    F.expr(e["scale_expr"]).alias("scale"),
                    "embedding")
            .withColumn("q", F.expr(e["q_expr"]))
            .withColumn("errs", F.expr(e["errs_expr"]))
            .select("vec_id",
                    F.expr(f32("scale")).alias("scale"),
                    F.expr(e["mse"]).alias("mse"),
                    F.expr(e["n_clipped"]).alias("n_clipped"),
                    F.expr(e["q_md5"]).alias("q_md5")))


def quantize_oracle_sql(dim: int = EMB_DIM) -> str:
    e = _exprs(X.DUCK, dim)
    return f"""
WITH scaled AS (
  SELECT vec_id, {e['scale_expr']} AS scale, embedding FROM embeddings),
coded AS (
  SELECT vec_id, scale, embedding, {e['q_expr']} AS q FROM scaled),
erred AS (
  SELECT vec_id, scale, q, {e['errs_expr']} AS errs FROM coded)
SELECT vec_id, {f32('scale')} AS scale, {e['mse']} AS mse,
  {e['n_clipped']} AS n_clipped, {e['q_md5']} AS q_md5
FROM erred"""


PQ_M = 8          # subspaces
PQ_SUB = EMB_DIM // PQ_M
PQ_K = 16         # codebook entries per subspace


def _d2_spark(m: int) -> str:
    """Squared L2 between subvector m of the row and of codebook entry
    ``c`` — a sequential fold over the 8 dims (cross-engine-exact)."""
    a = f"slice(embedding, {m * PQ_SUB + 1}, {PQ_SUB})"
    b = f"slice(c.c_emb, {m * PQ_SUB + 1}, {PQ_SUB})"
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> "
            f"(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
            f"(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
            f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)")


def pq_codes(emb: DataFrame, k: int = PQ_K) -> DataFrame:
    """EMB4 — product quantization (Jégou et al. 2011): split each
    vector into {PQ_M} subvectors, assign each to its nearest codebook
    entry (deterministic codebook = the first ``k`` vectors, the same
    seeding rule as the k-means operator), emit the code word and the
    exact reconstruction error.

    Scale shape: the codebook collapses to ONE broadcast array row (the
    kmeans-assign trick), so coding is a pure projection over the scan —
    zero corpus shuffles; the {PQ_M}-way argmin runs inside one
    ``transform``/``array_min`` expression per subspace. PQ is the
    memory-bound half of an IVF-PQ index: 64 f32 dims become {PQ_M}
    bytes, and `ann_ivf_topk`'s coarse cells + these codes are the full
    FAISS-style recipe.

    Determinism: per-subspace d² is a sequential fold; the total error
    adds the 8 subspace minima in literal order; argmin ties break on
    the smaller codebook id via struct ordering."""
    cb_row = (emb.filter(F.col("vec_id") < k)
              .select(F.col("vec_id").alias("cid"),
                      F.col("embedding").alias("c_emb"))
              .agg(F.expr("array_sort(collect_list("
                          "struct(cid AS k, c_emb)))").alias("cbs")))
    out = emb.join(F.broadcast(cb_row))
    for m in range(PQ_M):
        best = (f"array_min(transform(cbs, "
                f"c -> struct({_d2_spark(m)} AS d, c.k AS k)))")
        out = out.withColumn(f"__b{m}", F.expr(best))
    code = "concat_ws(',', " + ", ".join(
        f"CAST(__b{m}.k AS STRING)" for m in range(PQ_M)) + ")"
    err = "(" * (PQ_M - 1) + " + ".join(
        f"__b{m}.d" if m == 0 else f"__b{m}.d)"
        for m in range(PQ_M))
    n_zero = " + ".join(
        f"CAST(__b{m}.d = CAST(0 AS DOUBLE) AS INT)" for m in range(PQ_M))
    return out.select(
        "vec_id",
        F.expr(code).alias("pq_code"),
        F.expr(f32(err)).alias("sq_err"),
        F.expr(f"CAST({n_zero} AS INT)").alias("n_exact_sub"))


def pq_codes_oracle_sql(k: int = PQ_K) -> str:
    d2 = (f"list_sum(list_transform(range(1, {PQ_SUB} + 1), i -> "
          f"(CAST(e.embedding[s.m * {PQ_SUB} + i] AS DOUBLE) "
          f"- CAST(c.c_emb[s.m * {PQ_SUB} + i] AS DOUBLE)) * "
          f"(CAST(e.embedding[s.m * {PQ_SUB} + i] AS DOUBLE) "
          f"- CAST(c.c_emb[s.m * {PQ_SUB} + i] AS DOUBLE))))")
    dcols = ", ".join(
        f"MAX(CASE WHEN m = {m} THEN d2 END) AS d_{m}"
        for m in range(PQ_M))
    kcols = ", ".join(
        f"MAX(CASE WHEN m = {m} THEN k END) AS k_{m}"
        for m in range(PQ_M))
    code = " || ',' || ".join(f"CAST(k_{m} AS VARCHAR)"
                              for m in range(PQ_M))
    err = "(" * (PQ_M - 1) + " + ".join(
        f"d_{m}" if m == 0 else f"d_{m})" for m in range(PQ_M))
    n_zero = " + ".join(
        f"CAST(d_{m} = CAST(0 AS DOUBLE) AS INT)" for m in range(PQ_M))
    return f"""
WITH cb AS (
  SELECT vec_id AS k, embedding AS c_emb FROM embeddings
  WHERE vec_id < {k}),
subs AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m),
scored AS (
  SELECT e.vec_id, s.m, c.k, {d2} AS d2
  FROM embeddings e CROSS JOIN cb c CROSS JOIN subs s),
best AS (
  SELECT vec_id, m, k, d2 FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                 ORDER BY d2 ASC, k ASC) AS rn
    FROM scored) WHERE rn = 1),
wide AS (
  SELECT vec_id, {dcols}, {kcols} FROM best GROUP BY vec_id)
SELECT vec_id, {code} AS pq_code, {f32(err)} AS sq_err,
  CAST({n_zero} AS INT) AS n_exact_sub
FROM wide"""
