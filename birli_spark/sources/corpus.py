"""Loaders for the training-corpus tables (TESTDATA.md): ``documents``
(text + metadata), ``embeddings`` (64-dim float vectors), ``events``
(timestamped stream).

Same local-mode fixup as the vis loader: the driver parquet is a single
row group, so scans are repartitioned up to default parallelism once. On
real multi-row-group data the branch never triggers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType


def with_ts_ns(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to BIGINT **nanoseconds** since epoch.

    The driver regenerates the testdata between rounds and has shipped both
    TIMESTAMP(NANOS) (which Spark reads as int64 nanos under
    ``nanosAsLong``) and TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ).
    Downstream time arithmetic is all integer-nanos, so fold the physical
    representation here. The session timezone is pinned to UTC, so the
    NTZ→TZ cast is exact and matches DuckDB's ``epoch_us`` on naive
    timestamps.
    """
    t = df.schema[col].dataType
    if isinstance(t, (TimestampType, TimestampNTZType)):
        df = df.withColumn(
            col, F.unix_micros(F.col(col).cast("timestamp")) * F.lit(1000))
    return df


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
    """Events with ``ts`` as BIGINT **nanoseconds** since epoch, whatever
    the parquet's physical timestamp type (see :func:`with_ts_ns`)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return _fan_out(spark, with_ts_ns(
        spark.read.parquet(f"{sf_dir}/events.parquet")))
