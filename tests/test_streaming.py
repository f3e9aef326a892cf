"""Structured Streaming parity: the incremental windowed aggregation over
the finite events source must produce exactly the batch operator's rows
(modulo the avg column the stream variant omits)."""

from __future__ import annotations

from birli_spark.operators import events
from birli_spark.sources import corpus
from birli_spark.streaming import windows


def test_stream_matches_batch(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.streaming.checkpointLocation",
                   str(tmp_path / "ckpt"))
    got = (windows.run_available_now(spark, sf_dir, "t_windowed")
           .orderBy("event_type", "hour_epoch").toPandas())
    exp = (events.windowed_agg(corpus.load_events(spark, sf_dir))
           .orderBy("event_type", "hour_epoch").toPandas())
    assert got.event_type.tolist() == exp.event_type.tolist()
    assert got.hour_epoch.tolist() == exp.hour_epoch.tolist()
    assert got.n_events.tolist() == exp.n_events.tolist()
    assert got.sum_value.tolist() == exp.sum_value.tolist()
