"""Streaming Markov transitions: batch/stream parity over the finite
source, and batch-split invariance of the pure transition."""

from __future__ import annotations

import pandas as pd

from birli_spark.operators import events
from birli_spark.sources import corpus
from birli_spark.streaming import transitions


def test_stream_matches_batch(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.streaming.checkpointLocation",
                   str(tmp_path / "ckpt"))
    updates = transitions.run_available_now(spark, sf_dir, "t_trans")
    got = (transitions.transition_matrix_from_updates(updates)
           .orderBy("from_type", "to_type").toPandas())
    exp = (events.type_transitions(corpus.load_events(spark, sf_dir))
           .orderBy("from_type", "to_type").toPandas())
    assert got[["from_type", "to_type"]].values.tolist() == \
        exp[["from_type", "to_type"]].values.tolist()
    assert got.n_edges.tolist() == exp.n_edges.tolist()
    assert got.n_from.tolist() == exp.n_from.tolist()


def _sum_edges(frames):
    total = {}
    for f in frames:
        for r in f.itertuples():
            total[(r.from_type, r.to_type)] = \
                total.get((r.from_type, r.to_type), 0) + r.n
    return total


def test_transition_split_invariant():
    rows = pd.DataFrame({
        "event_type": list("abacabcb"),
        "ts_us": [1, 2, 3, 4, 5, 6, 7, 8],
        "event_id": range(8),
    })
    whole, last_w = transitions._transitions_update(1, rows, None)
    for cut in range(1, len(rows)):
        p1, mid = transitions._transitions_update(1, rows.iloc[:cut], None)
        p2, last_s = transitions._transitions_update(1, rows.iloc[cut:], mid)
        assert last_w == last_s
        assert _sum_edges([whole]) == _sum_edges([p1, p2])


def test_transition_empty_batch_keeps_state():
    empty = pd.DataFrame({"event_type": [], "ts_us": [], "event_id": []})
    out, last = transitions._transitions_update(1, empty, "x")
    assert len(out) == 0 and last == "x"
