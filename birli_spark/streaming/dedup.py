"""Streaming counterpart of exact dedup (operators/dedup.py D1): drop
content-duplicate documents as they arrive, keyed on ``md5(text)``.

The reference has no streaming surface (SURVEY.md §2.8); this is the
engine's forward-looking stream path for corpus ingestion: upstream
crawls re-deliver identical pages, and the ingest stream must admit only
the first copy.

Scale: ``dropDuplicatesWithinWatermark`` keeps one state-store entry per
content hash seen within the watermark horizon — state is bounded by
(arrival rate x watermark), not corpus size, and shards across executors
by hash. The batch D1 pass remains the ground truth for full-corpus
dedup; the stream guard only needs to catch re-deliveries close in time
(the overwhelmingly common case for crawl feeds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

DOCS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
    StructField("source", StringType()),
    StructField("n_chars", LongType()),
])


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents parquet (one file = one
    micro-batch under availableNow; a production feed would be Kafka)."""
    return (spark.readStream
            .schema(DOCS_SCHEMA)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir))


def dedup_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Admit only the first arrival of each distinct text.

    Event time is synthesized from ``doc_id`` here (the synthetic corpus
    has no arrival timestamp); a real feed would use its ingest time.
    The base offset keeps every synthetic time strictly above the
    initial watermark (epoch 0) — a row at exactly the watermark is
    late-dropped. ``dropDuplicatesWithinWatermark`` (not
    ``dropDuplicates``) bounds state: a hash older than the watermark
    horizon is forgotten.
    """
    with_ts = (stream
               .withColumn("text_md5", F.md5("text"))
               .withColumn("arrival_ts",
                           F.timestamp_seconds(F.col("doc_id") + 86400)))
    return (with_ts
            .withWatermark("arrival_ts", watermark)
            .dropDuplicatesWithinWatermark(["text_md5"])
            .select("doc_id", "text_md5", "lang", "source", "n_chars"))


def run_available_now(spark: SparkSession, sf_dir: str,
                      query_name: str = "dedup_stream") -> DataFrame:
    """Drain the finite source with trigger(availableNow) into an
    in-memory sink; returns the admitted rows as a DataFrame."""
    out = dedup_stream(read_documents_stream(spark, sf_dir))
    from birli_spark.streaming import drain_to_memory
    return drain_to_memory(out, query_name, "append")
