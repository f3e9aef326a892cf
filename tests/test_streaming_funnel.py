"""Streaming funnel: batch/stream parity over the finite source, and
batch-split invariance of the pure transition."""

from __future__ import annotations

import pandas as pd

from birli_spark.operators import events
from birli_spark.sources import corpus
from birli_spark.streaming import funnel


def test_stream_matches_batch(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.streaming.checkpointLocation",
                   str(tmp_path / "ckpt"))
    updates = funnel.run_available_now(spark, sf_dir, "t_funnel")
    got = (funnel.funnel_counts_from_updates(updates)
           .orderBy("stage_idx").toPandas())
    exp = (events.funnel(corpus.load_events(spark, sf_dir))
           .orderBy("stage_idx").toPandas())
    assert got.stage.tolist() == exp.stage.tolist()
    assert got.n_users.tolist() == exp.n_users.tolist()


def test_transition_split_invariant():
    rows = pd.DataFrame({
        "event_type": ["view", "signup", "click", "view", "purchase",
                       "signup", "click"],
        "ts_us": [5, 3, 9, 1, 20, 8, 2],
    })
    whole, st_whole = funnel._funnel_update(1, rows, None)
    for cut in range(1, len(rows)):
        _, mid = funnel._funnel_update(1, rows.iloc[:cut], None)
        last, st_split = funnel._funnel_update(1, rows.iloc[cut:], mid)
        assert st_whole == st_split
        pd.testing.assert_frame_equal(whole, last)


def test_transition_unseen_stages_stay_null():
    rows = pd.DataFrame({"event_type": ["view"], "ts_us": [7]})
    out, state = funnel._funnel_update(2, rows, None)
    assert state == (None, 7, None, None, 1)
    assert out.iloc[0]["t0"] is None or pd.isna(out.iloc[0]["t0"])
