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
