"""S6 — JSONL interchange for the documents corpus.

JSONL (one JSON object per line) is the lingua franca of LLM training
data pipelines (raw crawls, filtered dumps, instruction sets all ship
this way), so the engine needs a first-class JSONL source and sink next
to the parquet-canonical form — the document-side analogue of the
reference keeping UVFITS/mwaf interchange formats next to its in-memory
cube (SURVEY.md §2.7).

Spark shape: ``df.write.json`` / ``spark.read.schema(...).json`` are
built-in distributed line-format codecs — each task writes/reads its own
files, no driver funnel, splittable on read by line boundaries (at
100 TB, JSONL reads parallelize per-file/per-split exactly like text).
An **explicit schema** on read is mandatory at scale: schema inference
is a full extra pass over the data, and a drifting inferred type (e.g.
an all-null shard inferring ``string``) breaks downstream plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: canonical documents schema, spelled explicitly for the JSONL reader
DOCUMENTS_SCHEMA = ("doc_id bigint, text string, lang string, "
                    "source string, n_chars int")


def write_documents_jsonl(docs: DataFrame, path: str) -> None:
    """Distributed JSONL sink (one file per task; gzip-able via option)."""
    docs.write.mode("overwrite").json(path)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Distributed JSONL scan with the canonical explicit schema."""
    return spark.read.schema(DOCUMENTS_SCHEMA).json(path)


def roundtrip_stats(spark: SparkSession, docs: DataFrame,
                    path: str) -> DataFrame:
    """Write ``docs`` as JSONL, read it back, and emit per-document
    fingerprints (doc_id, lang, source, n_chars, text_md5) — equal to
    the same projection of the parquet source iff the roundtrip is
    lossless, which is what the oracle asserts."""
    from pyspark.sql import functions as F
    write_documents_jsonl(docs, path)
    back = read_documents_jsonl(spark, path)
    return back.select("doc_id", "lang", "source", "n_chars",
                       F.md5("text").alias("text_md5"))


def roundtrip_oracle_sql() -> str:
    return """
SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
FROM documents"""
