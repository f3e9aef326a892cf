"""Streaming KMV: the drained stream's final per-source estimates must
equal the batch sketch exactly, and state must fold across micro-batches
(split-source test)."""

from __future__ import annotations

import os

import pandas as pd

from birli_spark.operators import sketches
from birli_spark.sources import corpus
from birli_spark.streaming import sketch


def _last_per_source(got: pd.DataFrame) -> pd.DataFrame:
    return (got.groupby("source", as_index=False).last()
            .sort_values("source", ignore_index=True))


def test_stream_kmv_matches_batch(spark, sf_dir):
    batch = (sketches.kmv_distinct_tokens(
        corpus.load_documents(spark, sf_dir))
        .orderBy("source").toPandas())
    streamed = _last_per_source(
        sketch.run_available_now(spark, sf_dir).toPandas())
    assert streamed.source.tolist() == batch.source.tolist()
    assert streamed.kmv_distinct.tolist() == batch.kmv_distinct.tolist()


def test_stream_kmv_state_folds_across_batches(spark, sf_dir, tmp_path):
    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")
    src = str(tmp_path / "docs_split")
    os.makedirs(src, exist_ok=True)
    half = len(pdf) // 2
    pdf.iloc[:half].to_parquet(f"{src}/part0.parquet", index=False)
    pdf.iloc[half:].to_parquet(f"{src}/part1.parquet", index=False)
    stream = (spark.readStream
              .schema(sketch.read_documents_stream(spark, sf_dir).schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(src))
    out = sketch.kmv_stream(stream)
    q = (out.writeStream.format("memory").queryName("kmv_mb")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    streamed = _last_per_source(spark.table("kmv_mb").toPandas())
    batch = (sketches.kmv_distinct_tokens(
        corpus.load_documents(spark, sf_dir))
        .orderBy("source").toPandas())
    assert streamed.kmv_distinct.tolist() == batch.kmv_distinct.tolist()
