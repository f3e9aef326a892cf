"""v0.18.0 flag-gated correction semantics (RELEASES.md:17-19):
``correct_van_vleck/cable_lengths/digital_gains/coarse_passband_gains``
apply only to the unflagged timestep ranges of each coarse-channel chunk
(``get_unflagged_timestep_ranges``, src/preprocessing.rs:249-253 +
src/flags.rs:586-613). A fully-flagged (t, cc) cell keeps its RAW
values, which the averaging all-flagged fallback (plain mean, negative
weight — marlu semantics) then surfaces in the output."""

from __future__ import annotations

import json
import pathlib

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from birli_spark.functions.complex import POLS, VIS_COLS
from birli_spark.operators import averaging, corrections, weights

GOLDEN = json.loads(
    (pathlib.Path(__file__).parent / "data_vanvleck_golden.json").read_text())


def f32(x):
    return np.float64(np.float32(x))


def gate_vis(spark):
    """t=0..3 x cc{0,1} x fc{0,1}, one cross baseline: ALL rows at
    t in {0, 1} flagged (the quack shape — whole timesteps), t in {2, 3}
    unflagged except one stray row flag at (t=2, cc=0, fc=1)."""
    rows = []
    for t in range(4):
        for cc in range(2):
            for fc in range(2):
                chan = cc * 2 + fc
                base = float(t * 100 + chan)
                flag = t < 2 or (t == 2 and cc == 0 and fc == 1)
                rows.append(Row(
                    t=t, ant1=0, ant2=1, bl=1, cc=cc, fc=fc, chan=chan,
                    freq_hz=149_760_000.0 + chan * 640_000.0,
                    xx_re=base + 0.1, xx_im=base + 0.2, xy_re=base + 0.3,
                    xy_im=base + 0.4, yx_re=base + 0.5, yx_im=base + 0.6,
                    yy_re=base + 0.7, yy_im=base + 0.8,
                    weight=8.0, flag=flag,
                ))
    return spark.createDataFrame(rows)


def gate_antennas(spark):
    return spark.createDataFrame([
        Row(ant=0, elec_length_x_m=100.0, elec_length_y_m=100.5,
            flagged=False),
        Row(ant=1, elec_length_x_m=110.0, elec_length_y_m=110.5,
            flagged=False),
    ])


def fine_gains(spark):
    return spark.createDataFrame([Row(fc=0, gain=0.5), Row(fc=1, gain=2.0)])


def test_cell_gate_dimension(spark):
    """_caf is true iff EVERY flag in the (t, cc) cell is set — the
    relational get_unflagged_timestep_ranges complement."""
    gate = {(r["t"], r["cc"]): r[corrections.GATE_COL]
            for r in corrections.cell_gate(gate_vis(spark)).collect()}
    assert gate == {
        (0, 0): True, (0, 1): True, (1, 0): True, (1, 1): True,
        (2, 0): False,  # one stray flag does NOT gate the cell
        (2, 1): False, (3, 0): False, (3, 1): False,
    }


def test_gated_corrections_leave_flagged_cells_raw(spark):
    """Fully-flagged (t, cc) cells pass through cable+passband raw
    (values AND weight); all other rows — including individually flagged
    rows inside an unflagged cell — are corrected, exactly like the
    reference's whole-timestep-range slicing."""
    vis = gate_vis(spark)
    gated = corrections.attach_cell_gate(vis)
    gated = corrections.correct_cable_lengths(
        gated, gate_antennas(spark), gated=True)
    gated = corrections.correct_passband_gains(
        gated, fine_gains(spark), gated=True).drop(corrections.GATE_COL)
    plain = corrections.correct_passband_gains(
        corrections.correct_cable_lengths(vis, gate_antennas(spark)),
        fine_gains(spark))

    raw = {(r["t"], r["chan"]): r for r in vis.collect()}
    got = {(r["t"], r["chan"]): r for r in gated.collect()}
    ref = {(r["t"], r["chan"]): r for r in plain.collect()}
    for (t, chan), r in got.items():
        expect = raw if t < 2 else ref  # t<2 cells are fully flagged
        for c in [f"{p}_{x}" for p in POLS for x in ("re", "im")] + ["weight"]:
            assert r[c] == expect[(t, chan)][c], (t, chan, c)
    # the stray-flagged row at (2, cc0, fc1) IS corrected (cell unflagged)
    assert got[(2, 1)]["xx_re"] == ref[(2, 1)]["xx_re"] != raw[(2, 1)]["xx_re"]


def test_all_flagged_cell_averages_raw_mean(spark):
    """THE v0.18.0 output divergence, pinned: an all-flagged averaging
    cell's value is the plain mean of the UNCORRECTED samples (negative
    weight, flag=true) — post-0.18.0 Birli never corrected them, and
    marlu's fallback averages what it finds raw."""
    vis = gate_vis(spark)
    gated = corrections.attach_cell_gate(vis)
    gated = corrections.correct_cable_lengths(
        gated, gate_antennas(spark), gated=True)
    gated = corrections.correct_passband_gains(
        gated, fine_gains(spark), gated=True).drop(corrections.GATE_COL)
    out = averaging.average_time_freq(
        weights.bake_flags_into_weights(gated), avg_time=2, avg_freq=2)
    got = {(r["t_out"], r["chan_out"]): r for r in out.collect()}

    raw = vis.orderBy("t", "chan").toPandas()
    # block (t_out=0, chan_out=0) = t{0,1} x chan{0,1}: all flagged
    cell = raw[(raw.t < 2) & (raw.chan < 2)]
    blk = got[(0, 0)]
    assert blk["flag"] is True
    for c in VIS_COLS:
        assert blk[c] == f32(cell[c].mean()), c  # RAW mean, not corrected
    # weight: sum of (negative) raw weights — passband never scaled them
    assert blk["weight"] == f32(-(8.0 * len(cell)))

    # control: block (t_out=1, chan_out=0) = t{2,3} x chan{0,1} has
    # unflagged samples -> weighted mean of CORRECTED values
    corrected = corrections.correct_passband_gains(
        corrections.correct_cable_lengths(vis, gate_antennas(spark)),
        fine_gains(spark)).orderBy("t", "chan").toPandas()
    live = corrected[(corrected.t >= 2) & (corrected.chan < 2)
                     & ~corrected.flag.to_numpy()]
    blk2 = got[(1, 0)]
    assert blk2["flag"] is False
    for c in VIS_COLS:
        want = f32((live[c] * live.weight).sum() / live.weight.sum())
        assert blk2[c] == want, c


def test_gated_van_vleck_passthrough(spark):
    """C1 under the gate: rows of a fully-flagged (t, cc) cell keep
    their raw (sighat-encoded) values; the unflagged twin cell solves."""
    from birli_spark.operators import vanvleck as vv

    scale = 160_000.0
    sighat_xx, sighat_yy = GOLDEN["SIGHATS"][0], GOLDEN["SIGHATS"][1]
    sigma_xx = GOLDEN["SIGMAS"][0]

    def mk(t, a1, a2, flag):
        return Row(t=t, ant1=a1, ant2=a2, bl=a1 * 4 + a2, cc=0, fc=0,
                   chan=0, xx_re=sighat_xx ** 2 * scale, xx_im=7.0,
                   xy_re=0.01 * scale, xy_im=0.0, yx_re=0.01 * scale,
                   yx_im=0.0, yy_re=sighat_yy ** 2 * scale, yy_im=9.0,
                   weight=8.0, flag=flag)

    # t=0: fully-flagged cell; t=1: identical values, unflagged
    rows = [mk(t, a1, a2, t == 0)
            for t in range(2) for (a1, a2) in [(0, 0), (1, 1), (0, 1)]]
    vis = corrections.attach_cell_gate(spark.createDataFrame(rows))
    out = vv.correct_van_vleck(vis, scale, gate_col=corrections.GATE_COL)
    got = {(r["t"], r["ant1"], r["ant2"]): r for r in out.collect()}

    # gated auto passes through raw (still sighat-encoded, xx_im kept)
    assert got[(0, 0, 0)]["xx_re"] == f32(sighat_xx ** 2 * scale)
    assert got[(0, 0, 0)]["xx_im"] == 7.0
    assert got[(0, 0, 1)]["xx_re"] == f32(sighat_xx ** 2 * scale)
    # unflagged twin solves: auto xx -> scale * sigma^2, imag zeroed
    assert got[(1, 0, 0)]["xx_re"] == pytest.approx(
        scale * sigma_xx ** 2, rel=1e-6)
    assert got[(1, 0, 0)]["xx_im"] == 0.0
    assert got[(1, 0, 0)]["xx_re"] != got[(0, 0, 0)]["xx_re"]
