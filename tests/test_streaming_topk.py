"""Streaming CMS heavy hitters: drained-stream estimates must equal the
batch sketch's for the batch's exact top-k terms, and counters must fold
across micro-batches."""

from __future__ import annotations

import os

import pandas as pd

from birli_spark.operators import sketches
from birli_spark.sources import corpus
from birli_spark.streaming import topk


def _final_emission(got: pd.DataFrame) -> dict[str, int]:
    # update-mode memory sink: later rows supersede earlier; the final
    # emission is the last contiguous rank-1..k block
    last_start = got[got["rank"] == 1].index.max()
    final = got.loc[last_start:]
    return dict(zip(final["term"], final["cms_estimate"]))


def test_stream_cms_matches_batch(spark, sf_dir):
    batch = (sketches.cms_heavy_hitters(
        corpus.load_documents(spark, sf_dir))
        .orderBy("rank").toPandas())
    streamed = _final_emission(
        topk.run_available_now(spark, sf_dir).toPandas())
    # every batch top-k term's streaming estimate is identical (counters
    # are additive; estimates recomputed from final counters)
    for term, est in zip(batch["term"], batch["cms_estimate"]):
        assert streamed.get(term) == est, term


def test_stream_cms_counters_fold_across_batches(spark, sf_dir, tmp_path):
    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")
    src = str(tmp_path / "docs_split")
    os.makedirs(src, exist_ok=True)
    third = len(pdf) // 3
    pdf.iloc[:third].to_parquet(f"{src}/part0.parquet", index=False)
    pdf.iloc[third:2 * third].to_parquet(f"{src}/part1.parquet", index=False)
    pdf.iloc[2 * third:].to_parquet(f"{src}/part2.parquet", index=False)
    from birli_spark.streaming.dedup import DOCS_SCHEMA
    stream = (spark.readStream
              .schema(DOCS_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(src))
    out = topk.cms_topk_stream(stream)
    q = (out.writeStream.format("memory").queryName("cms_split")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.table("cms_split").toPandas()
    assert (got["rank"] == 1).sum() >= 2  # really ran multiple batches
    streamed = _final_emission(got)
    batch = (sketches.cms_heavy_hitters(
        corpus.load_documents(spark, sf_dir))
        .orderBy("rank").toPandas())
    for term, est in zip(batch["term"], batch["cms_estimate"]):
        assert streamed.get(term) == est, term


def test_stream_topk_ranks_by_exact_count_under_collisions(spark,
                                                           sf_dir):
    """width=1 forces EVERY token into one CMS bucket, so all
    estimates are equal (the total token count): selection/ranking by
    estimate would be arbitrary. The stream must rank by its exact
    tracked counts — the batch operator's ordering (tf desc, term
    asc) — so the drained term/rank table still matches the batch
    exact top-k, with every estimate the (identical) collision
    total."""
    from birli_spark.streaming.topk import topk_from_updates

    got = topk_from_updates(
        topk.run_available_now(
            spark, sf_dir, query_name="cms_w1", width=1)).toPandas()
    batch = (sketches.cms_heavy_hitters(
        corpus.load_documents(spark, sf_dir))
        .orderBy("rank").toPandas())
    g = got.sort_values("rank").reset_index(drop=True)
    assert list(g["term"]) == list(batch["term"])
    assert list(g["rank"]) == list(batch["rank"])
    # width=1: every estimate is the same all-bucket total
    assert g["cms_estimate"].nunique() == 1
