"""Loaders for the training-corpus tables (TESTDATA.md): ``documents``
(text + metadata), ``embeddings`` (64-dim float vectors), ``events``
(timestamped stream).

Same local-mode fixup as the vis loader: the driver parquet is a single
row group, so scans are repartitioned up to default parallelism once. On
real multi-row-group data the branch never triggers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _fan_out(spark: SparkSession, df: DataFrame) -> DataFrame:
    n = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        df = df.repartition(n)
    return df


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _fan_out(spark, spark.read.parquet(f"{sf_dir}/documents.parquet"))


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _fan_out(spark, spark.read.parquet(f"{sf_dir}/embeddings.parquet"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with ``ts`` as BIGINT **nanoseconds** since epoch.

    The driver parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; ``nanosAsLong`` maps it to int64 nanos. All downstream
    time arithmetic stays in integer nanos (exact, oracle-identical —
    DuckDB side uses ``epoch_ns(ts)``).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return _fan_out(spark, spark.read.parquet(f"{sf_dir}/events.parquet"))
