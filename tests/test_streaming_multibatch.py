"""Multi-micro-batch streaming: split the events source into two files
processed one per trigger (maxFilesPerTrigger=1) and check the stateful
sessionizer's final upserted state equals the batch result — state
carries across real micro-batches, not just unit-level splits."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

from birli_spark.operators import events
from birli_spark.sources import corpus
from birli_spark.streaming import sessions, windows


def _split_source(sf_dir: str, out_dir: str) -> str:
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values("ts")
    os.makedirs(out_dir, exist_ok=True)
    half = len(pdf) // 2
    # time-ordered halves: the second batch continues the first's sessions
    pdf.iloc[:half].to_parquet(f"{out_dir}/part0.parquet", index=False)
    pdf.iloc[half:].to_parquet(f"{out_dir}/part1.parquet", index=False)
    return out_dir


def test_two_batch_session_continuation(spark, sf_dir, tmp_path):
    src = _split_source(sf_dir, str(tmp_path / "events_split"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = corpus.with_ts_ns(
        spark.readStream
        .schema(windows.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src))
    out = sessions.sessionize_stream(stream)
    q = (out.writeStream.format("memory").queryName("mb_sessions")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    got_all = spark.table("mb_sessions").toPandas()
    # memory sink in update mode appends every upsert: keep the LAST
    # emission per (user, session) — that is the sink contract
    got = (got_all.sort_index()
           .groupby(["user_id", "session_seq"], as_index=False).last()
           .sort_values(["user_id", "session_seq"], ignore_index=True))
    exp = (events.sessionize(corpus.load_events(spark, sf_dir))
           .orderBy("user_id", "session_seq").toPandas())
    assert got.user_id.tolist() == exp.user_id.tolist()
    assert got.session_seq.tolist() == exp.session_seq.tolist()
    assert got.n_events.tolist() == exp.n_events.tolist()
    assert got.end_us.tolist() == exp.end_us.tolist()
    # sanity: sessions spanning the file split were emitted twice
    # (once per batch) — proof the state actually carried over
    dupes = got_all.groupby(["user_id", "session_seq"]).size()
    assert (dupes > 1).any()