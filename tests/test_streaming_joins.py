"""Stream-stream interval join: constructed-case semantics for the batch
band join, and exact batch/stream parity over the events table."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Row

from birli_spark.operators import events
from birli_spark.sources import corpus
from birli_spark.streaming import joins

US = 1_000_000
NS = 1_000
W = events.ATTR_WINDOW_US


def _ev(eid, user, t_us, typ):
    return Row(event_id=eid, ts=t_us * NS, user_id=user,
               event_type=typ, value=1.0, props="{}")


def test_attribution_pairs_semantics(spark):
    rows = [
        _ev(1, 7, 0, "view"),
        _ev(2, 7, W, "click"),            # exactly W after view 1 -> in
        _ev(3, 7, W + 1, "click"),        # W+1 after view 1 -> out
        _ev(4, 7, W - 5, "view"),         # 5 before click 2 -> in
        _ev(5, 9, 10, "view"),            # other user
        _ev(6, 8, W + 2, "view"),         # view AFTER click 3 -> out
    ]
    got = {(r.click_id, r.view_id)
           for r in events.attribution_pairs(
               spark.createDataFrame(rows)).collect()}
    assert got == {(2, 1), (2, 4), (3, 4)}


def test_attribution_batch_stream_parity(spark, sf_dir):
    batch = (events.attribution_pairs(corpus.load_events(spark, sf_dir))
             .orderBy("click_id", "view_id").toPandas())
    streamed = (joins.run_available_now(spark, sf_dir)
                .orderBy("click_id", "view_id").toPandas())
    assert len(batch) > 0
    pd.testing.assert_frame_equal(batch, streamed, check_dtype=False)
