"""C6 golden: the DI-calibration sandwich pinned against the reference's
own Cotter-debugger-captured vectors.

The reference validates ``apply_di_calsol`` against Jones solutions and
visibilities captured from a live Cotter debugging session
(`-exec p solA[solChannel]` / `solB` / `dataAsDouble`,
src/calibration.rs:285-367, test_apply_calsols_real): two diagonal f64
solutions (antennas A=0, B=1) over 2 solution channels, one baseline
(0, 1), and the expected f32 output of V' = J_A · V · J_B^H per
channel. This test transcribes those public constants and asserts our
Spark C6 operator reproduces them within the reference's F32Margin
semantics (compare_jones! epsilon — we use 1e-4 absolute on f32
values, comfortably inside one output ulp at these magnitudes).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from birli_spark.operators import calibration

# src/calibration.rs:293-320 — `-exec p solA[solChannel]` (ant 0) and
# `-exec p solB[solChannel]` (ant 1), diagonal Jones per sol channel
CALSOLS = [
    # ant, chan, j00, j11 (j01 = j10 = 0)
    (0, 0, complex(-0.05711880819681107, 0.8909723224701427),
     complex(-0.3190681285208096, 0.8975262420831493)),
    (0, 1, complex(-0.05790403500446751, 0.8906022388084277),
     complex(-0.31938558050469074, 0.8973555420886708)),
    (1, 0, complex(0.7738792841865286, 0.4448506027871696),
     complex(0.218178442910526, 0.8469966867353856)),
    (1, 1, complex(0.7727769657690016, 0.4451541611407178),
     complex(0.21786624664314946, 0.8466270165385981)),
]

# src/calibration.rs:323-338 — `-exec p dataAsDouble`, input Jones per
# channel for baseline (0, 1): [xx, xy, yx, yy]
VIS_IN = [
    (complex(24.25, 1.0), complex(85.5, 81.75),
     complex(35.25, -2.0), complex(154.5, 9.625)),
    (complex(58.25, -67.0), complex(3.875, -12.375),
     complex(-36.0, 75.75), complex(17.375, 75.625)),
]

# src/calibration.rs:340-355 — the expected calibrated output captured
# from the same session
VIS_EXPECTED = [
    (complex(7.8246384, 17.68882), complex(43.610638, 81.43078),
     complex(7.043186, 29.182451), complex(102.209915, 78.65481)),
    (complex(68.32589, 18.026802), complex(5.8807054, -8.232894),
     complex(-68.7944, -18.519669), complex(-23.242767, 60.28708)),
]

POLS = ("xx", "xy", "yx", "yy")


def _vis_rows():
    rows = []
    for chan, pol_vals in enumerate(VIS_IN):
        d = {"t": 0, "ant1": 0, "ant2": 1, "bl": 1, "chan": chan,
             "weight": 1.0, "flag": False}
        for p, v in zip(POLS, pol_vals):
            d[f"{p}_re"] = float(v.real)
            d[f"{p}_im"] = float(v.imag)
        rows.append(Row(**d))
    return rows


def _calsol_rows():
    rows = []
    for ant, chan, j00, j11 in CALSOLS:
        rows.append(Row(
            ant=ant, chan=chan,
            j00_re=float(j00.real), j00_im=float(j00.imag),
            j01_re=0.0, j01_im=0.0, j10_re=0.0, j10_im=0.0,
            j11_re=float(j11.real), j11_im=float(j11.imag)))
    return rows


def test_apply_calsols_real_cotter_golden(spark):
    """The Spark sandwich reproduces the Cotter-captured output
    (reference test_apply_calsols_real, src/calibration.rs:286-367)."""
    vis = spark.createDataFrame(_vis_rows())
    calsols = spark.createDataFrame(_calsol_rows())
    # 2 vis channels / 2 sol channels -> ratio 1
    out = calibration.apply_di_calsol(vis, calsols, ratio=1)
    pdf = out.orderBy("chan").toPandas()
    assert len(pdf) == 2
    assert not pdf["flag"].any()
    assert (pdf["weight"] == 1.0).all()
    for chan, expected in enumerate(VIS_EXPECTED):
        for p, e in zip(POLS, expected):
            got = complex(pdf[f"{p}_re"][chan], pdf[f"{p}_im"][chan])
            assert got.real == pytest.approx(e.real, abs=1e-4), (chan, p)
            assert got.imag == pytest.approx(e.imag, abs=1e-4), (chan, p)


def test_apply_calsols_real_numpy_reference():
    """Independent numpy sandwich over the same constants — pins the
    transcription itself (J_A · V · J_B^H in f64, demoted to f32)."""
    for chan, (pol_vals, expected) in enumerate(zip(VIS_IN, VIS_EXPECTED)):
        ja = np.array([[CALSOLS[chan][2], 0], [0, CALSOLS[chan][3]]])
        jb = np.array([[CALSOLS[2 + chan][2], 0], [0, CALSOLS[2 + chan][3]]])
        v = np.array([[pol_vals[0], pol_vals[1]],
                      [pol_vals[2], pol_vals[3]]])
        got = (ja @ v @ jb.conj().T).astype(np.complex64)
        exp = np.array([[expected[0], expected[1]],
                        [expected[2], expected[3]]], dtype=np.complex64)
        assert np.allclose(got, exp, atol=1e-4), chan


def test_apply_calsols_identity_scaling(spark):
    """The reference's synthetic companion (src/calibration.rs:252-285):
    identity * (2t + 2) visibilities through a solution sandwich come
    out as J V J^H."""
    j = complex(0.5, 0.5)
    vis = spark.createDataFrame([Row(
        t=t, ant1=0, ant2=1, bl=1, chan=0, weight=1.0, flag=False,
        xx_re=float(t * 2 + 2), xx_im=0.0, xy_re=0.0, xy_im=0.0,
        yx_re=0.0, yx_im=0.0, yy_re=float(t * 2 + 2), yy_im=0.0)
        for t in range(2)])
    calsols = spark.createDataFrame([Row(
        ant=a, chan=0,
        j00_re=j.real, j00_im=j.imag, j01_re=0.0, j01_im=0.0,
        j10_re=0.0, j10_im=0.0, j11_re=j.real, j11_im=j.imag)
        for a in range(2)])
    out = calibration.apply_di_calsol(vis, calsols, ratio=1)
    pdf = out.orderBy("t").toPandas()
    for t in range(2):
        scale = (t * 2 + 2) * abs(j) ** 2  # j * x * conj(j) = |j|^2 x
        assert pdf["xx_re"][t] == pytest.approx(scale, abs=1e-5)
        assert pdf["yy_re"][t] == pytest.approx(scale, abs=1e-5)
        assert pdf["xx_im"][t] == pytest.approx(0.0, abs=1e-5)
