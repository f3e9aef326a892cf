"""Unit tests for flag derivation, weights, averaging, and occupancy."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from birli_spark.operators import averaging, flags, occupancy, weights


def test_weight_factor():
    # Cotter-compatible w0 (src/flags.rs:564-575): 10kHz*2s → 2.0
    assert weights.weight_factor(10_000.0, 2.0) == 2.0
    assert weights.weight_factor(40_000.0, 0.5) == 2.0


def test_quack_flags(spark):
    ts = spark.createDataFrame([Row(t=t, ts_gps=1000.0 + 2.0 * t + 1.0) for t in range(6)])
    out = flags.flag_timesteps_quack(ts, 1000.0, 1012.0, quack_s=4.0, flag_end_s=2.0)
    got = {r["t"]: r["ts_flag"] for r in out.collect()}
    # centroids 1001..1011; quack flags < 1004 → t=0,1; end flags >= 1010 → t=4(1009)? no: t=4→1009, t=5→1011 ≥ 1010 → flagged
    assert got == {0: True, 1: True, 2: False, 3: False, 4: False, 5: True}


def test_fine_channel_preds():
    import pyspark.sql.functions as F  # noqa: F401
    # SQL text variant must mirror the Column variant
    sql = flags.fine_channel_pred_sql(8, n_edge=1, is_legacy=True, explicit_fcs=(6,))
    assert "fc < 1" in sql and "fc >= 7" in sql and "fc = 4" in sql and "fc IN (6)" in sql


def test_baseline_flags(spark):
    ants = spark.createDataFrame(
        [Row(ant=0, flagged=False), Row(ant=1, flagged=True), Row(ant=2, flagged=False)])
    out = flags.baseline_flags(ants, flag_autos=True)
    got = {(r["ant1"], r["ant2"]): r["bl_flag"] for r in out.collect()}
    assert got[(0, 1)] and got[(1, 0)] and got[(1, 1)]
    assert got[(0, 0)]  # auto + flag_autos
    assert not got[(0, 2)]


def test_set_flags_disjunction(spark):
    vis = spark.createDataFrame([
        Row(t=0, ant1=0, ant2=1, cc=0, fc=0, flag=False),
        Row(t=1, ant1=0, ant2=1, cc=0, fc=1, flag=False),
        Row(t=1, ant1=0, ant2=2, cc=0, fc=0, flag=True),
    ])
    ts_f = spark.createDataFrame([Row(t=0, ts_flag=True), Row(t=1, ts_flag=False)])
    bl_f = spark.createDataFrame([
        Row(ant1=0, ant2=1, bl_flag=False), Row(ant1=0, ant2=2, bl_flag=False)])
    out = flags.set_flags(vis, ts_f, bl_f, F.col("fc") >= 1)
    got = {(r["t"], r["ant2"], r["fc"]): r["flag"] for r in out.collect()}
    assert got[(0, 1, 0)]          # ts flag
    assert got[(1, 1, 1)]          # fc pred
    assert got[(1, 2, 0)]          # pre-existing flag preserved
    assert len(got) == 3


def test_unflagged_ranges_islands(spark):
    # timesteps 0-1 flagged, 2-3 ok, 4 flagged, 5-6 ok → islands [2,3],[5,6]
    rows = []
    for t in range(7):
        all_flagged = t in (0, 1, 4)
        rows.append(Row(t=t, flag=all_flagged))
        rows.append(Row(t=t, flag=True))  # one always-flagged cell per t
    vis = spark.createDataFrame(rows)
    out = {(r["t_start"], r["t_end"]) for r in flags.unflagged_timestep_ranges(vis).collect()}
    assert out == {(2, 3), (5, 6)}


def test_missing_slabs_filled_and_flagged(spark, sf_dir):
    from birli_spark.sources import synthetic as syn
    vis = syn.load_vis(spark, sf_dir)
    dropped = vis.filter(~((F.col("t") == 3) & (F.col("cc") == 1)))
    filled = flags.flag_missing_slabs(dropped)
    gap = filled.filter((F.col("t") == 3) & (F.col("cc") == 1))
    n = gap.count()
    assert n > 0
    assert gap.filter(~F.col("flag")).count() == 0
    assert gap.filter(F.col("xx_re") != 0.0).count() == 0


def test_bake_flags_into_weights(spark):
    vis = spark.createDataFrame([
        Row(x=1, weight=8.0, flag=False),
        Row(x=2, weight=8.0, flag=True),
        Row(x=3, weight=-8.0, flag=False),
    ])
    out = {r["x"]: r["weight"] for r in weights.bake_flags_into_weights(vis).collect()}
    assert out == {1: 8.0, 2: -8.0, 3: 8.0}


def _avg_vis(spark):
    # one output cell (t 0-1, chan 0-1, bl 0): 4 samples, one flagged;
    # one all-flagged output cell (bl 1)
    rows = []
    for t in range(2):
        for chan in range(2):
            rows.append(Row(t=t, chan=chan, bl=0, ant1=0, ant2=1,
                            xx_re=float(t * 10 + chan), xx_im=0.5, xy_re=0.0,
                            xy_im=0.0, yx_re=0.0, yx_im=0.0, yy_re=1.0,
                            yy_im=0.0, weight=8.0 if (t, chan) != (0, 0) else -8.0,
                            flag=(t, chan) == (0, 0)))
            rows.append(Row(t=t, chan=chan, bl=1, ant1=0, ant2=2,
                            xx_re=float(t + chan), xx_im=0.0, xy_re=0.0,
                            xy_im=0.0, yx_re=0.0, yx_im=0.0, yy_re=0.0,
                            yy_im=0.0, weight=-8.0, flag=True))
    return spark.createDataFrame(rows)


def test_average_weighted_mean_and_allflagged_fallback(spark):
    out = averaging.average_time_freq(_avg_vis(spark), 2, 2).collect()
    cells = {r["bl"]: r for r in out}
    # bl 0: unflagged samples (0,1)=1, (1,0)=10, (1,1)=11 → mean 22/3
    assert cells[0]["xx_re"] == pytest.approx(22 / 3, abs=1e-6)
    assert cells[0]["weight"] == pytest.approx(24.0)
    assert not cells[0]["flag"]
    assert cells[0]["n_samples"] == 4
    # bl 1: all flagged → plain mean of (0,1,1,2)=1.0, negative weight sum
    assert cells[1]["xx_re"] == pytest.approx(1.0, abs=1e-6)
    assert cells[1]["weight"] == pytest.approx(-32.0)
    assert cells[1]["flag"]


def test_occupancy_counts(spark):
    vis = spark.createDataFrame([
        Row(cc=0, fc=0, ant1=0, ant2=1, flag=True),
        Row(cc=0, fc=0, ant1=0, ant2=2, flag=False),
        Row(cc=0, fc=1, ant1=0, ant2=1, flag=False),
        Row(cc=0, fc=1, ant1=0, ant2=2, flag=False),
    ])
    ch = {(r["cc"], r["fc"]): r for r in occupancy.channel_occupancy(vis).collect()}
    assert ch[(0, 0)]["n_flagged"] == 1 and ch[(0, 0)]["occupancy"] == 0.5
    assert ch[(0, 1)]["n_flagged"] == 0
    bl = {(r["ant1"], r["ant2"]): r for r in occupancy.baseline_occupancy(vis).collect()}
    assert bl[(0, 1)]["n_flagged"] == 1 and bl[(0, 1)]["n_rows"] == 2
