"""O5 — size-balanced dataset shard export (the HuggingFace-datasets /
WebDataset publication shape): write a curated corpus as N-doc parquet
shards whose boundaries come from a deterministic token-budget plan, plus
a manifest table the loader consumes.

Scale shape: the plan is the same per-partition cumsum binning as
sequence packing (t24) — shard ids derive from a window cumsum keyed by
the corpus' natural partition column (``source``), so no global ordering
or driver-side state exists; the write is one
``partitionBy(source, shard)`` parquet job whose file sizes track the
token budget. The manifest aggregate is shard-cardinality, not corpus
cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from birli_spark.functions import textsql as X

SHARD_TOKENS = 4000   #: token budget per shard


def shard_plan(docs: DataFrame,
               shard_tokens: int = SHARD_TOKENS) -> DataFrame:
    """Assign every document a (source, shard) by running-token-budget
    bucketing in doc_id order within its source."""
    n = f"CAST({X.size(X.SPARK, X.toks(X.SPARK))} AS BIGINT)"
    w = ("SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id "
         "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    return (docs
            .select("doc_id", "source", F.expr(n).alias("n_tokens"))
            .withColumn("shard", F.expr(
                f"CAST(FLOOR(({w} - 1) / {shard_tokens}) AS INT)")))


def manifest_from_plan(plan: DataFrame) -> DataFrame:
    """Aggregate a :func:`shard_plan` relation into the loader-facing
    manifest: one row per (source, shard) with doc count, token count,
    and the doc-id range the shard spans."""
    return (plan
            .groupBy("source", "shard")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"),
                 F.min("doc_id").alias("first_doc"),
                 F.max("doc_id").alias("last_doc")))


def shard_manifest(docs: DataFrame,
                   shard_tokens: int = SHARD_TOKENS) -> DataFrame:
    """The manifest straight from the docs (derives the plan)."""
    return manifest_from_plan(shard_plan(docs, shard_tokens))


def shard_manifest_oracle_sql(shard_tokens: int = SHARD_TOKENS) -> str:
    n = f"CAST({X.size(X.DUCK, X.toks(X.DUCK))} AS BIGINT)"
    return f"""
WITH plan AS (
  SELECT doc_id, source, {n} AS n_tokens,
    CAST(FLOOR((SUM({n}) OVER (PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
      / {shard_tokens}) AS INT) AS shard
  FROM documents)
SELECT source, shard, COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM plan GROUP BY source, shard"""


def write_shards(docs: DataFrame, out_dir: str,
                 shard_tokens: int = SHARD_TOKENS) -> DataFrame:
    """Execute the export: docs land under
    ``out_dir/source=<s>/shard=<k>/``; returns the manifest."""
    # ONE plan execution (it tokenizes the whole corpus and runs the
    # per-source window cumsum): persist it, feed both the write join
    # and the manifest aggregate from the persisted copy, materialize
    # the (shard-cardinality) manifest, then release
    plan = shard_plan(docs, shard_tokens).persist()
    try:
        (docs.join(plan.select("doc_id", "shard"), "doc_id")
             .write.mode("overwrite")
             .partitionBy("source", "shard")
             .parquet(out_dir))
        return manifest_from_plan(plan).localCheckpoint(eager=True)
    finally:
        plan.unpersist()
