"""Stateful streaming sessionizer: single-batch parity with the batch
operator, and multi-batch continuation via the pure transition function."""

from __future__ import annotations

import pandas as pd

from birli_spark.operators import events
from birli_spark.sources import corpus
from birli_spark.streaming import sessions

GAP = events.SESSION_GAP_US
US = 1_000_000


def _ev_pdf(rows):
    return pd.DataFrame(rows, columns=["ts_us", "event_id", "value"])


def test_transition_splits_and_carries_state():
    # batch 1: two events in one session
    s1, st1 = sessions._session_update(
        7, _ev_pdf([(0, 1, 1.0), (10 * US, 2, 2.0)]), None)
    assert s1.to_dict("records") == [dict(
        user_id=7, session_seq=1, n_events=2, start_us=0, end_us=10 * US,
        sum_value=3.0)]
    # batch 2 continues the same session (within gap), then splits
    s2, st2 = sessions._session_update(
        7, _ev_pdf([(11 * US, 3, 4.0), (GAP + 12 * US, 4, 8.0)]), st1)
    recs = s2.to_dict("records")
    assert recs[0]["session_seq"] == 1 and recs[0]["n_events"] == 3
    assert recs[0]["sum_value"] == 7.0
    assert recs[1]["session_seq"] == 2 and recs[1]["n_events"] == 1
    assert st2[1] == 2  # open session seq carried


def test_transition_unsorted_batch():
    s, _ = sessions._session_update(
        1, _ev_pdf([(20 * US, 2, 1.0), (0, 1, 1.0)]), None)
    assert len(s) == 1 and s.iloc[0].start_us == 0


def test_stream_sessions_match_batch(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.streaming.checkpointLocation",
                   str(tmp_path / "ckpt"))
    got = (sessions.run_available_now(spark, sf_dir, "t_sessions")
           .orderBy("user_id", "session_seq").toPandas())
    exp = (events.sessionize(corpus.load_events(spark, sf_dir))
           .orderBy("user_id", "session_seq").toPandas())
    assert got.user_id.tolist() == exp.user_id.tolist()
    assert got.session_seq.tolist() == exp.session_seq.tolist()
    assert got.n_events.tolist() == exp.n_events.tolist()
    assert got.start_us.tolist() == exp.start_us.tolist()
    assert got.end_us.tolist() == exp.end_us.tolist()
    assert got.sum_value.tolist() == exp.sum_value.tolist()