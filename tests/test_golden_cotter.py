"""Golden-output validation against the reference's OWN Cotter CSV
fixtures (tests/data/1254670392_avg — the fixture set behind the
reference's compare_uvfits_with_csv gate, src/cli.rs:3258+): the
averaged and cable-corrected dumps are pure functions of the
uncorrected ('none') dump, so the engine's A1 and C2 operators are run
on the real 'none' data and compared cell-for-cell to Cotter's real
outputs, within the reference's F32Margin-style tolerance."""

from __future__ import annotations

import numpy as np
import pytest

from birli_spark.operators import averaging, corrections
from birli_spark.sources import cotter_csv, metafits as MF

DIR = "/root/reference/tests/data/1254670392_avg"
NONE_CSV = f"{DIR}/1254670392.cotter.none.uvfits.csv"
AVG_CSV = f"{DIR}/1254670392.cotter.none.avg_4s_160khz.uvfits.csv"
CABLE_CSV = f"{DIR}/1254670392.cotter.cable.uvfits.csv"
META = f"{DIR}/1254670392.metafits"

VIS_COLS = ["xx_re", "xx_im", "xy_re", "xy_im",
            "yx_re", "yx_im", "yy_re", "yy_im"]


@pytest.fixture(scope="module")
def ctx():
    primary, tiledata = MF.read_metafits(META)
    return primary, tiledata


@pytest.fixture(scope="module")
def none_df(spark, ctx):
    primary, _ = ctx
    return cotter_csv.read_cotter_uvfits_csv(
        spark, NONE_CSV, cotter_csv.chan0_freq_hz(primary),
        float(primary["FINECHAN"]) * 1e3).cache()


def test_chan0_freq_convention(ctx):
    primary, _ = ctx
    assert cotter_csv.chan0_freq_hz(primary) == 167055000.0


def test_averaging_matches_cotter_golden(spark, ctx, none_df):
    primary, _ = ctx
    got = averaging.average_time_freq(none_df, 2, 4).toPandas()
    want = cotter_csv.read_cotter_uvfits_csv(
        spark, AVG_CSV, 0.0, 1.0).toPandas()
    got = got.sort_values(["t_out", "bl", "chan_out"]).reset_index(drop=True)
    want = want.sort_values(["t", "bl", "chan"]).reset_index(drop=True)
    assert len(got) == len(want) == 12 * 192   # 12 bl × 192 out chans
    assert (got["t_out"].values == want["t"].values).all()
    assert (got["bl"].values == want["bl"].values).all()
    assert (got["chan_out"].values == want["chan"].values).all()
    # weights: Cotter's dump encodes the all-flagged fallback as the
    # negative weight sum — ours keeps it negative too
    assert np.allclose(got["weight"], want["weight"], rtol=0, atol=1e-3)
    assert (got["flag"].values == want["flag"].values).all()
    for c in VIS_COLS:
        a, b = got[c].to_numpy(float), want[c].to_numpy(float)
        assert np.allclose(a, b, rtol=1e-5, atol=2e-3), c


def test_cable_correction_matches_cotter_golden(spark, ctx, none_df):
    primary, tiledata = ctx
    ants = MF.antennas_df(spark, tiledata)
    got = corrections.correct_cable_lengths(none_df, ants).toPandas()
    want = cotter_csv.read_cotter_uvfits_csv(
        spark, CABLE_CSV, 0.0, 1.0).toPandas()
    got = got.sort_values(["t", "bl", "chan"]).reset_index(drop=True)
    want = want.sort_values(["t", "bl", "chan"]).reset_index(drop=True)
    assert len(got) == len(want)
    for c in VIS_COLS:
        a, b = got[c].to_numpy(float), want[c].to_numpy(float)
        # reference F32Margin: epsilon 1e-4 on values up to ~1e5 — use
        # the matching relative bound with a small absolute floor
        assert np.allclose(a, b, rtol=2e-5, atol=2e-2), (
            c, float(np.abs(a - b).max()))
