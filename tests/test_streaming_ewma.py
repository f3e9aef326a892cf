"""Streaming EWMA: exact batch parity (bit-equality, not tolerance) and
split invariance of the pure transition."""

from __future__ import annotations

import pandas as pd

from birli_spark.operators import events
from birli_spark.sources import corpus
from birli_spark.streaming import ewma


def test_stream_matches_batch_bitwise(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.streaming.checkpointLocation",
                   str(tmp_path / "ckpt"))
    updates = ewma.run_available_now(spark, sf_dir, "t_ewma")
    got = (ewma.latest_snapshots(updates)
           .orderBy("user_id").toPandas())
    exp = (events.user_ewma(corpus.load_events(spark, sf_dir))
           .orderBy("user_id").toPandas())
    assert got.user_id.tolist() == exp.user_id.tolist()
    assert got.n_events.tolist() == exp.n_events.tolist()
    assert got.first_value.tolist() == exp.first_value.tolist()
    assert got.ewma.tolist() == exp.ewma.tolist()   # exact, no tolerance


def test_transition_split_invariant():
    rows = pd.DataFrame({
        "value": [3.0, 1.5, 9.25, -2.0, 0.5],
        "ts_us": [1, 2, 3, 4, 5],
        "event_id": range(5),
    })
    whole, st_whole = ewma._ewma_update(1, rows, None)
    for cut in range(1, len(rows)):
        _, mid = ewma._ewma_update(1, rows.iloc[:cut], None)
        last, st_split = ewma._ewma_update(1, rows.iloc[cut:], mid)
        assert st_whole == st_split
        pd.testing.assert_frame_equal(whole, last)
