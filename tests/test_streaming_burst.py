"""Streaming trailing-burst detector: batch/stream parity over the finite
source, and batch-split invariance of the pure transition function
(distinct timestamps — equal timestamps straddling a micro-batch boundary
are counted causally by the stream, symmetrically by the batch frame)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from birli_spark.operators import events
from birli_spark.sources import corpus
from birli_spark.streaming import burst

W = events.BURST_WINDOW_US


def test_stream_matches_batch(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.streaming.checkpointLocation",
                   str(tmp_path / "ckpt"))
    got = (burst.run_available_now(spark, sf_dir, "t_bursts")
           .select("event_id", "n_trailing")
           .orderBy("event_id").toPandas())
    exp = (events.trailing_burst_counts(corpus.load_events(spark, sf_dir))
           .orderBy("event_id").toPandas())
    assert got.event_id.tolist() == exp.event_id.tolist()
    assert got.n_trailing.tolist() == exp.n_trailing.tolist()


ts_lists = st.lists(st.integers(0, 50), min_size=1, max_size=30, unique=True)


@settings(max_examples=60, deadline=None)
@given(ts_lists, st.integers(0, 29), st.integers(1, 8))
def test_transition_split_invariant(ts_vals, cut, w_s):
    w_us = w_s * 1_000_000
    rows = sorted((t * 1_000_000, i) for i, t in enumerate(ts_vals))
    pdf = pd.DataFrame({"ts_us": [r[0] for r in rows],
                        "event_id": [r[1] for r in rows]})
    whole, st_whole = burst._burst_update(1, pdf, None, w_us)
    cut = min(cut, len(pdf) - 1)
    if cut == 0:
        split, st_split = whole, st_whole
    else:
        p1, mid = burst._burst_update(1, pdf.iloc[:cut], None, w_us)
        p2, st_split = burst._burst_update(1, pdf.iloc[cut:], mid, w_us)
        split = pd.concat([p1, p2], ignore_index=True)
    assert st_whole == st_split
    pd.testing.assert_frame_equal(whole, split)


def test_transition_inclusive_window_edges():
    pdf = pd.DataFrame({"ts_us": [0, W, 2 * W + 1], "event_id": [1, 2, 3]})
    out, state = burst._burst_update(7, pdf, None)
    got = dict(zip(out.event_id, out.n_trailing))
    assert got == {1: 0, 2: 1, 3: 0}       # exactly-W is inside; W+1 is not
    assert state == [2 * W + 1]


def test_transition_counts_prior_batch_survivors():
    p1, mid = burst._burst_update(7, pd.DataFrame(
        {"ts_us": [0, 10], "event_id": [1, 2]}), None)
    p2, _ = burst._burst_update(7, pd.DataFrame(
        {"ts_us": [20], "event_id": [3]}), mid)
    assert p2.n_trailing.tolist() == [2]
