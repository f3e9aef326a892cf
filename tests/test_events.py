"""Semantic tests for event analytics: constructed streams with known
session structure; pandas recomputation for the windowed aggregate."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Row
from pyspark.sql import functions as F

from birli_spark.operators import events
from birli_spark.sources import corpus

US = 1_000_000
NS = 1_000


def _ev(eid, user, t_us, value=1.0, typ="click"):
    return Row(event_id=eid, ts=t_us * NS, user_id=user,
               event_type=typ, value=value, props="{}")


def test_sessionize_gap_splits(spark):
    gap = events.SESSION_GAP_US
    rows = [
        _ev(1, 7, 0), _ev(2, 7, 10 * US), _ev(3, 7, gap + 11 * US),   # split
        _ev(4, 7, gap + 20 * US),
        _ev(5, 9, 5 * US),                                            # other user
    ]
    out = {(r.user_id, r.session_seq): r
           for r in events.sessionize(spark.createDataFrame(rows)).collect()}
    assert out[(7, 1)].n_events == 2
    assert out[(7, 1)].start_us == 0 and out[(7, 1)].end_us == 10 * US
    assert out[(7, 2)].n_events == 2
    assert out[(9, 1)].n_events == 1
    assert len(out) == 3


def test_sessionize_boundary_is_strict_greater(spark):
    gap = events.SESSION_GAP_US
    rows = [_ev(1, 1, 0), _ev(2, 1, gap)]       # exactly gap -> same session
    out = events.sessionize(spark.createDataFrame(rows)).collect()
    assert len(out) == 1 and out[0].n_events == 2


def test_windowed_agg_matches_pandas(spark, sf_dir):
    ev = corpus.load_events(spark, sf_dir)
    got = (events.windowed_agg(ev)
           .orderBy("event_type", "hour_epoch").toPandas())
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet")
    ts_ns = pdf.ts.astype("datetime64[ns]").astype("int64") \
        if pd.api.types.is_datetime64_any_dtype(pdf.ts) \
        else pdf.ts.astype("int64")
    pdf["hour_epoch"] = (ts_ns // (3600 * 10 ** 9)) * 3600
    exp = (pdf.groupby(["event_type", "hour_epoch"])
           .agg(n_events=("value", "size"), sum_value=("value", "sum"))
           .reset_index().sort_values(["event_type", "hour_epoch"]))
    assert got.n_events.tolist() == exp.n_events.tolist()
    assert got.hour_epoch.tolist() == exp.hour_epoch.tolist()
    # f32-demoted sums: equal to float32 resolution
    import numpy as np
    assert np.allclose(got.sum_value.values, exp.sum_value.values,
                       rtol=1e-6, atol=1e-4)


def test_event_rollup_levels(spark, sf_dir):
    from birli_spark.sources import corpus
    ev = corpus.load_events(spark, sf_dir)
    out = events.event_rollup(ev).toPandas()
    leaves = out[out.gid == 0]
    subtotals = out[out.gid == 1]
    grand = out[out.gid == 3]
    assert len(grand) == 1
    assert grand.iloc[0].event_type == "ALL" and grand.iloc[0].day_epoch == -1
    assert grand.iloc[0].n_events == ev.count()
    # every per-type subtotal equals the sum of its leaves
    per_type = leaves.groupby("event_type").n_events.sum()
    for r in subtotals.itertuples():
        assert r.day_epoch == -1
        assert per_type[r.event_type] == r.n_events
    assert subtotals.n_events.sum() == grand.iloc[0].n_events


def test_burst_counts_band_semantics(spark):
    w = events.BURST_WINDOW_US
    rows = [
        # user 7: events at 0, w (inclusive edge), 2w+1 (outside both)
        _ev(1, 7, 0), _ev(2, 7, w),
        _ev(3, 7, 2 * w + 1),
        # user 9: isolated
        _ev(4, 9, 0),
    ]
    out = {r.event_id: r.n_burst
           for r in events.burst_counts(spark.createDataFrame(rows)).collect()}
    # 1<->2 are exactly w apart (inclusive); 3 is w+1 from 2: also within
    # its band?  t3 - t2 = w + 1 > w -> excluded.
    assert out[1] == 1 and out[2] == 1
    assert out[3] == 0
    assert out[4] == 0
    assert len(out) == 4


def test_burst_counts_matches_naive(spark, sf_dir):
    ev = corpus.load_events(spark, sf_dir).filter("event_id < 500")
    got = {r.event_id: r.n_burst for r in events.burst_counts(ev).collect()}
    pdf = ev.selectExpr("event_id", "user_id", "ts div 1000 AS tu").toPandas()
    for _, a in pdf.iterrows():
        n = ((pdf.user_id == a.user_id) & (pdf.event_id != a.event_id)
             & ((pdf.tu - a.tu).abs() <= events.BURST_WINDOW_US)).sum()
        assert got[a.event_id] == n


def test_json_extract_stats_matches_pandas(spark, sf_dir):
    import json
    ev = corpus.load_events(spark, sf_dir)
    got = (events.json_extract_stats(ev)
           .orderBy("event_type").toPandas().set_index("event_type"))
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet")
    pdf["k"] = pdf.props.map(lambda s: json.loads(s)["k"])
    for et, grp in pdf.groupby("event_type"):
        row = got.loc[et]
        assert row.n_events == len(grp)
        assert row.sum_k == grp.k.sum()
        assert row.min_k == grp.k.min() and row.max_k == grp.k.max()


def test_retention_cohorts_semantics(spark):
    day = events.US_PER_DAY // US  # seconds in a day, as µs helper below
    rows = [
        _ev(1, 1, 0),                       # user 1: day 0 (cohort 0)
        _ev(2, 1, 2 * day * US),            # ... active day 2 -> offset 2
        _ev(3, 1, 2 * day * US + 5),        # same day, dedup
        _ev(4, 2, day * US),                # user 2: cohort day 1
        _ev(5, 2, day * US + 3),            # same day
    ]
    out = {(r.cohort_day, r.day_offset): r.n_users
           for r in events.retention_cohorts(
               spark.createDataFrame(rows)).collect()}
    assert out == {(0, 0): 1, (0, 2): 1, (1, 0): 1}


def test_funnel_requires_stage_order(spark):
    rows = [
        # user 1 completes the whole funnel in order
        _ev(1, 1, 0, typ="signup"), _ev(2, 1, 10, typ="view"),
        _ev(3, 1, 20, typ="click"), _ev(4, 1, 30, typ="purchase"),
        # user 2 purchases BEFORE clicking -> drops at click->purchase
        _ev(5, 2, 0, typ="signup"), _ev(6, 2, 10, typ="view"),
        _ev(7, 2, 30, typ="click"), _ev(8, 2, 20, typ="purchase"),
        # user 3 never signs up -> not even stage 1
        _ev(9, 3, 0, typ="view"), _ev(10, 3, 10, typ="purchase"),
    ]
    out = {r.stage: r.n_users
           for r in events.funnel(spark.createDataFrame(rows)).collect()}
    assert out == {"signup": 2, "view": 2, "click": 2, "purchase": 1}


def test_sessionize_native_matches_islands(spark, sf_dir):
    ev = corpus.load_events(spark, sf_dir)
    a = (events.sessionize(ev)
         .orderBy("user_id", "session_seq").toPandas())
    b = (events.sessionize_native(ev)
         .orderBy("user_id", "session_seq").toPandas())
    pd.testing.assert_frame_equal(
        a[sorted(a.columns)], b[sorted(b.columns)], check_dtype=False)


def test_sessionize_native_boundary_inclusive(spark):
    # events exactly GAP apart stay in ONE session in the islands form
    # (split only on > GAP); the native session_window must match on
    # both sides of the boundary
    gap = events.SESSION_GAP_US
    rows = [_ev(1, 5, 0), _ev(2, 5, gap), _ev(3, 5, 2 * gap + 1)]
    out = events.sessionize_native(spark.createDataFrame(rows)).collect()
    by_seq = {r.session_seq: r for r in out}
    assert by_seq[1].n_events == 2           # diff == gap merges
    assert by_seq[2].n_events == 1           # diff == gap+1 splits


def test_daily_type_pivot_semantics(spark):
    day_us = events.US_PER_DAY
    rows = [_ev(1, 1, 0, typ="click"), _ev(2, 1, 5, typ="click"),
            _ev(3, 2, 10, typ="view"),
            _ev(4, 1, day_us + 1, typ="purchase")]
    out = {r.day_epoch: r for r in
           events.daily_type_pivot(spark.createDataFrame(rows)).collect()}
    d0, d1 = out[0], out[86400]
    assert d0.click == 2 and d0.view == 1 and d0.purchase == 0
    assert d1.purchase == 1 and d1.click == 0
    assert d0.error == 0 and d0.signup == 0


def test_type_transitions_match_python(spark, sf_dir):
    from collections import Counter
    from pyspark.sql import functions as F
    from birli_spark.sources import corpus
    ev = corpus.load_events(spark, sf_dir)
    got = events.type_transitions(ev).toPandas()
    pdf = ev.select("user_id", "event_id", "event_type",
                    F.expr(events.TS_US_SPARK).alias("us")).toPandas()
    pdf = pdf.sort_values(["user_id", "us", "event_id"])
    edges = Counter()
    for _, grp in pdf.groupby("user_id"):
        types = list(grp.event_type)
        for a, b in zip(types, types[1:]):
            edges[(a, b)] += 1
    assert len(got) == len(edges)
    for _, r in got.iterrows():
        assert edges[(r.from_type, r.to_type)] == r.n_edges
        assert r.n_from == sum(v for (f, _), v in edges.items()
                               if f == r.from_type)


def test_user_ewma_matches_python(spark, sf_dir):
    from birli_spark.sources import corpus
    from pyspark.sql import functions as F
    ev = corpus.load_events(spark, sf_dir)
    got = events.user_ewma(ev).toPandas().set_index("user_id")
    pdf = (ev.select("user_id", "event_id", "value",
                     F.expr(events.TS_US_SPARK).alias("us"))
           .toPandas().sort_values(["user_id", "us", "event_id"]))
    a = float(events.EWMA_ALPHA)
    for uid, grp in pdf.groupby("user_id"):
        vals = list(grp.value)
        ew = vals[0]
        for v in vals[1:]:
            ew = a * v + (1 - a) * ew
        r = got.loc[uid]
        assert r.n_events == len(vals)
        assert r.first_value == vals[0]
        assert abs(r.ewma - ew) < 1e-12


def test_anomaly_days_integer_zscore(spark):
    import datetime as dt

    from birli_spark.operators.events import anomaly_days

    def burst(user, day, n):
        base = dt.datetime(2024, 1, day, 12, 0, 0)
        return [Row(event_id=user * 10000 + day * 100 + i, ts=base,
                    user_id=user, event_type="view", value=0.0, props="{}")
                for i in range(n)]

    rows = []
    # user 1: 15 quiet days of 10, one day of 100 -> that day is
    # anomalous (z ≈ 3.74; note a single outlier among 9 equal days
    # sits at exactly z = 3 — the strict > boundary — whatever its
    # magnitude, so more quiet days are needed, not a bigger spike)
    for d in range(1, 16):
        rows += burst(1, d, 10)
    rows += burst(1, 16, 100)
    # user 2: perfectly uniform -> no anomalies (variance 0, no x > mean)
    for d in range(1, 11):
        rows += burst(2, d, 5)
    events_df = spark.createDataFrame(rows).withColumn(
        "ts", F.expr("CAST(unix_micros(ts) AS BIGINT) * 1000"))
    out = anomaly_days(events_df).collect()
    assert len(out) == 1
    r = out[0]
    assert r.user_id == 1 and r.cnt == 100 and r.n_days == 16
