"""Semantic tests for the time-series (activity-shape) similarity
search: planted identical shapes, band completeness, thresholds."""

from __future__ import annotations

from pyspark.sql import Row

from birli_spark.operators import timeseries

NS_PER_HOUR = timeseries._US_PER_HOUR * 1000


def _ev(eid, user, hour, value):
    return Row(event_id=eid, ts=hour * NS_PER_HOUR, user_id=user,
               event_type="x", value=float(value), props="{}")


def test_identical_shapes_pair_up(spark):
    rows = []
    eid = 0
    # users 1 and 2: same morning-heavy shape (scaled copies count as the
    # same sign pattern); user 3: inverted shape
    for user, scale, invert in [(1, 1.0, False), (2, 3.0, False),
                                (3, 1.0, True)]:
        for h in range(24):
            v = 10.0 if (h < 12) != invert else 1.0
            rows.append(_ev(eid, user, h, v * scale))
            eid += 1
    out = {(r.user_a, r.user_b): r.hamming
           for r in timeseries.series_neardup(
               spark.createDataFrame(rows)).collect()}
    assert out.get((1, 2)) == 0
    assert (1, 3) not in out and (2, 3) not in out


def test_min_events_filter(spark):
    rows = [_ev(i, 1, i, 5.0) for i in range(4)]          # only 4 events
    rows += [_ev(10 + i, 2, i, 5.0) for i in range(6)]
    rows += [_ev(20 + i, 3, i, 5.0) for i in range(6)]
    out = timeseries.series_neardup(
        spark.createDataFrame(rows)).collect()
    users = {u for r in out for u in (r.user_a, r.user_b)}
    assert 1 not in users                                  # filtered out
    assert {2, 3} <= users                                 # identical shape


def test_band_join_is_complete_vs_brute(spark, sf_dir):
    from birli_spark.sources import corpus
    ev = corpus.load_events(spark, sf_dir)
    got = {(r.user_a, r.user_b): r.hamming
           for r in timeseries.series_neardup(ev).collect()}
    sigs = {r.user_id: r.sig
            for r in timeseries._profiles(
                ev, timeseries.MIN_EVENTS).collect()}
    ids = sorted(sigs)
    exp = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= timeseries.SERIES_MAX_HAM:
                exp[(a, b)] = h
    assert got == exp


def test_dtw_expression_matches_numpy(spark):
    import numpy as np

    from birli_spark.operators.timeseries import (DTW_BAND, _DTW_INF,
                                                  _dtw_sql_spark)
    INF = _DTW_INF

    def dtw_np(a, b, r=DTW_BAND):
        n = len(a)
        D = np.full((n + 1, n + 1), INF, dtype=np.int64)
        D[0, 0] = 0
        for i in range(1, n + 1):
            for j in range(1, n + 1):
                if abs(i - j) > r:
                    continue
                D[i, j] = (min(D[i - 1, j], D[i, j - 1], D[i - 1, j - 1])
                           + abs(a[i - 1] - b[j - 1]))
        return int(D[n, n])

    rng = np.random.default_rng(7)
    rows = [(rng.integers(0, 500, 24).tolist(),
             rng.integers(0, 500, 24).tolist()) for _ in range(8)]
    # identical series -> 0; shifted series -> small but nonzero
    rows.append((list(range(24)), list(range(24))))
    df = spark.createDataFrame(rows, "va array<bigint>, vb array<bigint>")
    got = [r.d for r in
           df.selectExpr(_dtw_sql_spark("va", "vb") + " AS d").collect()]
    want = [dtw_np(a, b) for a, b in rows]
    assert got == want
    assert got[-1] == 0


def test_dtw_shift_tolerance(spark):
    from birli_spark.operators.timeseries import _dtw_sql_spark
    # a one-hour circular shift of a spiky profile: large L1 distance
    # but small DTW (the alignment absorbs the shift within the band)
    a = [0] * 24
    a[10] = 1000
    b = [0] * 24
    b[11] = 1000
    df = spark.createDataFrame([(a, b)],
                               "va array<bigint>, vb array<bigint>")
    d = df.selectExpr(_dtw_sql_spark("va", "vb") + " AS d").collect()[0].d
    l1 = sum(abs(x - y) for x, y in zip(a, b))
    assert d == 0          # perfect alignment within the +-3 band
    assert l1 == 2000
