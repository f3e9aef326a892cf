"""Numpy-verified unit tests for the correction operators on a tiny
closed-form vis table (FIXTURES.md shape: 2 ants, 2 cc, small t)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from birli_spark.functions.complex import POLS
from birli_spark.operators import calibration, corrections

TAU = 2 * math.pi
C = 299_792_458.0


def tiny_vis(spark):
    rows = []
    for t in range(2):
        for (a1, a2) in [(0, 0), (0, 1), (1, 1)]:
            for cc in range(2):
                for fc in range(2):
                    chan = cc * 2 + fc
                    base = float(t * 100 + a1 * 10 + a2 * 5 + chan)
                    rows.append(Row(
                        t=t, ant1=a1, ant2=a2, bl=a1 * 2 + a2, cc=cc, fc=fc,
                        chan=chan, freq_hz=149_760_000.0 + chan * 640_000.0,
                        xx_re=base + 0.1, xx_im=base + 0.2, xy_re=base + 0.3,
                        xy_im=base + 0.4, yx_re=base + 0.5, yx_im=base + 0.6,
                        yy_re=base + 0.7, yy_im=base + 0.8,
                        weight=32.0, flag=False,
                    ))
    return spark.createDataFrame(rows)


def tiny_antennas(spark):
    return spark.createDataFrame([
        Row(ant=0, elec_length_x_m=100.0, elec_length_y_m=100.5, flagged=False),
        Row(ant=1, elec_length_x_m=110.0, elec_length_y_m=110.5, flagged=False),
    ])


def as_np(df, cols):
    pdf = df.orderBy("t", "bl", "chan").toPandas()
    return {c: pdf[c].to_numpy() for c in cols}, pdf


def f32(x):
    return np.float64(np.float32(x))


def test_cable_correction_matches_numpy(spark):
    vis = tiny_vis(spark)
    out = corrections.correct_cable_lengths(vis, tiny_antennas(spark))
    got, pdf = as_np(out, [f"{p}_{c}" for p in POLS for c in ("re", "im")])
    src, spdf = as_np(vis, [f"{p}_{c}" for p in POLS for c in ("re", "im")])
    lens = {0: (100.0, 100.5), 1: (110.0, 110.5)}
    for i in range(len(pdf)):
        a1, a2 = spdf.ant1[i], spdf.ant2[i]
        f = spdf.freq_hz[i]
        dl = {
            "xx": lens[a2][0] - lens[a1][0],
            "xy": lens[a2][0] - lens[a1][1],
            "yx": lens[a2][1] - lens[a1][0],
            "yy": lens[a2][1] - lens[a1][1],
        }
        for p in POLS:
            v = src[f"{p}_re"][i] + 1j * src[f"{p}_im"][i]
            if a1 == a2:
                expect = v  # autos skipped (src/corrections.rs:113-116)
            else:
                expect = v * np.exp(-1j * TAU * dl[p] * f / C)
                expect = complex(f32(expect.real), f32(expect.imag))
            assert got[f"{p}_re"][i] == pytest.approx(expect.real, abs=1e-6)
            assert got[f"{p}_im"][i] == pytest.approx(expect.imag, abs=1e-6)


def test_geometry_correction_matches_numpy(spark):
    vis = tiny_vis(spark)
    uvw_rows = [Row(t=t, ant=a, u=float(t + a), v=float(t - a),
                    w=(t * 7 + a * 11) / 1000.0)
                for t in range(2) for a in range(2)]
    part_uvw = spark.createDataFrame(uvw_rows)
    out = corrections.correct_geometry(vis, part_uvw)
    got, pdf = as_np(out, ["xx_re", "xx_im", "u", "v", "w"])
    src, spdf = as_np(vis, ["xx_re", "xx_im"])
    for i in range(len(pdf)):
        t, a1, a2 = spdf.t[i], spdf.ant1[i], spdf.ant2[i]
        w = (t * 7 + a1 * 11) / 1000.0 - (t * 7 + a2 * 11) / 1000.0
        assert got["w"][i] == pytest.approx(w, abs=1e-12)
        v = src["xx_re"][i] + 1j * src["xx_im"][i]
        expect = v * np.exp(-1j * TAU * w * spdf.freq_hz[i] / C)
        assert got["xx_re"][i] == pytest.approx(f32(expect.real), abs=1e-5)
        assert got["xx_im"][i] == pytest.approx(f32(expect.imag), abs=1e-5)


def test_digital_gains_matches_numpy(spark):
    vis = tiny_vis(spark)
    gains = spark.createDataFrame([
        Row(ant=a, cc=c, gain_x=(64 + a * 2 + c) / 64.0,
            gain_y=(64 + a * 2 + c + 1) / 64.0)
        for a in range(2) for c in range(2)
    ])
    out = corrections.correct_digital_gains(vis, gains)
    got, pdf = as_np(out, ["xx_re", "xy_re", "yx_re", "yy_re"])
    src, spdf = as_np(vis, ["xx_re", "xy_re", "yx_re", "yy_re"])
    g = {(a, c): ((64 + a * 2 + c) / 64.0, (64 + a * 2 + c + 1) / 64.0)
         for a in range(2) for c in range(2)}
    for i in range(len(pdf)):
        a1, a2, cc = spdf.ant1[i], spdf.ant2[i], spdf.cc[i]
        (g1x, g1y), (g2x, g2y) = g[(a1, cc)], g[(a2, cc)]
        assert got["xx_re"][i] == pytest.approx(f32(src["xx_re"][i] / (g1x * g2x)), abs=1e-6)
        assert got["xy_re"][i] == pytest.approx(f32(src["xy_re"][i] / (g1x * g2y)), abs=1e-6)
        assert got["yx_re"][i] == pytest.approx(f32(src["yx_re"][i] / (g1y * g2x)), abs=1e-6)
        assert got["yy_re"][i] == pytest.approx(f32(src["yy_re"][i] / (g1y * g2y)), abs=1e-6)


def test_passband_divides_vis_multiplies_weight(spark):
    """Asymmetry check: vis /= gain, weight *= gain
    (src/corrections.rs:504-519)."""
    vis = tiny_vis(spark)
    fine_gains = spark.createDataFrame([Row(fc=0, gain=0.5), Row(fc=1, gain=2.0)])
    out = corrections.correct_passband_gains(vis, fine_gains)
    got, pdf = as_np(out, ["xx_re", "weight"])
    src, spdf = as_np(vis, ["xx_re", "weight"])
    for i in range(len(pdf)):
        gain = 0.5 if spdf.fc[i] == 0 else 2.0
        assert got["xx_re"][i] == pytest.approx(f32(src["xx_re"][i] / gain), abs=1e-6)
        assert got["weight"][i] == pytest.approx(f32(gain * 32.0), abs=1e-6)


def test_calibration_identity_solution_is_noop(spark):
    """J = I on both antennas must leave visibilities unchanged
    (reference src/calibration.rs unit tests use diagonal Jones)."""
    vis = tiny_vis(spark)
    calsols = spark.createDataFrame([
        Row(ant=a, chan=ch, j00_re=1.0, j00_im=0.0, j01_re=0.0, j01_im=0.0,
            j10_re=0.0, j10_im=0.0, j11_re=1.0, j11_im=0.0)
        for a in range(2) for ch in range(2)
    ])
    out = calibration.apply_di_calsol(vis, calsols, ratio=2)
    got, _ = as_np(out, ["xx_re", "yy_im", "flag", "weight"])
    src, _ = as_np(vis, ["xx_re", "yy_im"])
    assert np.allclose(got["xx_re"], np.float32(src["xx_re"]), atol=1e-6)
    assert np.allclose(got["yy_im"], np.float32(src["yy_im"]), atol=1e-6)
    assert not got["flag"].any()
    assert (got["weight"] == 32.0).all()


def test_calibration_diagonal_scaling(spark):
    """Diagonal J1=diag(2,3), J2=I: xx' = 2*xx, xy' = 2*xy... sandwiched as
    J1 V J2^H (src/calibration.rs:111-115)."""
    vis = tiny_vis(spark).filter(F.col("chan") == 0)
    calsols = spark.createDataFrame(
        [Row(ant=0, chan=0, j00_re=2.0, j00_im=0.0, j01_re=0.0, j01_im=0.0,
             j10_re=0.0, j10_im=0.0, j11_re=3.0, j11_im=0.0),
         Row(ant=1, chan=0, j00_re=1.0, j00_im=0.0, j01_re=0.0, j01_im=0.0,
             j10_re=0.0, j10_im=0.0, j11_re=1.0, j11_im=0.0)])
    out = calibration.apply_di_calsol(vis, calsols, ratio=2)
    got, pdf = as_np(out, ["xx_re", "xy_re", "yx_re", "yy_re"])
    src, spdf = as_np(vis, ["xx_re", "xy_re", "yx_re", "yy_re"])
    for i in range(len(pdf)):
        s1 = {0: (2.0, 3.0), 1: (1.0, 1.0)}[spdf.ant1[i]]
        s2 = {0: (2.0, 3.0), 1: (1.0, 1.0)}[spdf.ant2[i]]
        assert got["xx_re"][i] == pytest.approx(s1[0] * s2[0] * src["xx_re"][i], rel=1e-6)
        assert got["xy_re"][i] == pytest.approx(s1[0] * s2[1] * src["xy_re"][i], rel=1e-6)
        assert got["yx_re"][i] == pytest.approx(s1[1] * s2[0] * src["yx_re"][i], rel=1e-6)
        assert got["yy_re"][i] == pytest.approx(s1[1] * s2[1] * src["yy_re"][i], rel=1e-6)


def test_calibration_nan_flags_and_negates_weight(spark):
    """NaN in a calibrated cell → flag=true, positive weight negated
    (src/calibration.rs:117-124)."""
    vis = tiny_vis(spark).filter(F.col("chan") == 0)
    calsols = spark.createDataFrame(
        [Row(ant=0, chan=0, j00_re=float("nan"), j00_im=0.0, j01_re=0.0,
             j01_im=0.0, j10_re=0.0, j10_im=0.0, j11_re=1.0, j11_im=0.0),
         Row(ant=1, chan=0, j00_re=1.0, j00_im=0.0, j01_re=0.0, j01_im=0.0,
             j10_re=0.0, j10_im=0.0, j11_re=1.0, j11_im=0.0)])
    out = calibration.apply_di_calsol(vis, calsols, ratio=2)
    got, pdf = as_np(out, ["flag", "weight"])
    for i in range(len(pdf)):
        touches_nan_ant = pdf.ant1[i] == 0 or pdf.ant2[i] == 0
        assert got["flag"][i] == touches_nan_ant
        assert got["weight"][i] == (-32.0 if touches_nan_ant else 32.0)


def test_calibration_missing_solution_flags_not_drops(spark, sf_dir):
    from birli_spark import pipeline
    from birli_spark.operators import calibration
    from birli_spark.sources import synthetic as syn
    vis = syn.load_vis(spark, sf_dir)
    sols = syn.load_dim(spark, "calsols")
    # drop antenna 2's solutions entirely: rows must survive, flagged,
    # with visibilities passed through and positive weights negated
    partial = sols.filter("ant <> 2")
    out = calibration.apply_di_calsol(vis, partial, pipeline.CAL_RATIO)
    assert out.count() == vis.count()
    touched = out.filter("ant1 = 2 OR ant2 = 2")
    assert touched.filter("NOT flag").count() == 0
    assert touched.filter("weight > 0").count() == 0
    # passthrough: values unchanged for a sampled missing-ant row
    a = (vis.filter("ant1 = 2 AND t = 0 AND chan = 0").orderBy("bl")
         .select("bl", "xx_re").collect())
    b = (out.filter("ant1 = 2 AND t = 0 AND chan = 0").orderBy("bl")
         .select("bl", "xx_re").collect())
    assert [r.xx_re for r in a] == [r.xx_re for r in b]
    # complete solutions: nothing flagged by the missing-branch
    full = calibration.apply_di_calsol(vis, sols, pipeline.CAL_RATIO)
    assert full.count() == vis.count()
