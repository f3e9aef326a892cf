"""Golden tests for the Van Vleck correction against the reference's
pyuvdata-derived fixtures (src/van_vleck.rs:394-465 sigma vectors;
:886-1323 480-element cross vectors; :801-830 Simpson point checks)."""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from birli_spark.operators import vanvleck as vv

GOLDEN = json.load(open(os.path.join(os.path.dirname(__file__),
                                     "data_vanvleck_golden.json")))


def test_sighat_roundtrip():
    sigmas = np.array(GOLDEN["SIGMAS"])
    expect = np.array(GOLDEN["SIGHATS"])
    np.testing.assert_allclose(vv.sighat(sigmas), expect, atol=1e-12)


def test_sighat_prime():
    sigmas = np.array(GOLDEN["SIGMAS"])
    expect = np.array(GOLDEN["SIGHATS_PRIME"])
    np.testing.assert_allclose(vv.sighat_prime(sigmas), expect, atol=1e-10)


def test_van_vleck_autos_golden():
    got = vv.van_vleck_autos(np.array(GOLDEN["SIGHATS"]))
    np.testing.assert_allclose(got, np.array(GOLDEN["SIGMAS"]), atol=1e-10)


def test_simpsons_pdf_identity():
    """x=y=0 grid → integral is (2/pi) asin(rho)
    (reference test_simpsons_pdf, src/van_vleck.rs:787-798)."""
    rho = np.array([0.5])
    x = np.zeros((1, 1))
    y = np.zeros((1, 1))
    got, _ = vv._corrcorrect_simp(rho, *vv._grids(x, y))
    assert got[0] == pytest.approx(math.asin(0.5) * 2 / math.pi, abs=1e-6)


def test_corrcorrect_point_values():
    """Point checks from reference src/van_vleck.rs:801-825."""
    sx, sy, rho = 1.03637188, 0.98278517, 0.01021078
    x = (vv._K[None, :] / sx)
    y = (vv._K[None, :] / sy)
    xy, sq = vv._grids(x, y)
    khat = vv._corrcorrect_simp(np.array([rho]), xy, sq)[0][0]
    assert khat == pytest.approx(0.0104, abs=1e-6)
    prime = vv._pdf(np.array([rho]), xy, sq)[0]
    assert prime == pytest.approx(1.0185308989, abs=1e-6)


def test_van_vleck_crosses_golden_480():
    k = np.array(GOLDEN["K_HATS"])
    s1 = np.array(GOLDEN["SIGMAS1"])
    s2 = np.array(GOLDEN["SIGMAS2"])
    expect = np.array(GOLDEN["KAPPAS"])
    got = vv.van_vleck_crosses(k, s1, s2)
    np.testing.assert_allclose(got, expect, atol=1e-10)


def test_spark_operator_end_to_end(spark):
    """Auto xx/yy inverted to sigma^2*scale; imag zeroed; crosses corrected;
    rows touching a flagged antenna pass through."""
    scale = 160_000.0  # 40kHz * 2s * 2 (src/van_vleck.rs:318-329)
    sighat_xx, sighat_yy = GOLDEN["SIGHATS"][0], GOLDEN["SIGHATS"][1]
    sigma_xx, sigma_yy = GOLDEN["SIGMAS"][0], GOLDEN["SIGMAS"][1]

    def mk(t, a1, a2, xx_re, yy_re, xy_re=0.01 * 160_000.0):
        return Row(t=t, ant1=a1, ant2=a2, bl=a1 * 4 + a2, cc=0, fc=0, chan=0,
                   xx_re=xx_re, xx_im=7.0, xy_re=xy_re, xy_im=0.0,
                   yx_re=xy_re, yx_im=0.0, yy_re=yy_re, yy_im=9.0,
                   weight=8.0, flag=False)

    rows = [
        mk(0, 0, 0, sighat_xx ** 2 * scale, sighat_yy ** 2 * scale),
        mk(0, 1, 1, sighat_xx ** 2 * scale, sighat_yy ** 2 * scale),
        mk(0, 0, 1, 500.0, 700.0),       # cross, both autos present
        mk(0, 2, 2, sighat_xx ** 2 * scale, sighat_yy ** 2 * scale),  # flagged ant
        mk(0, 0, 2, 500.0, 700.0),       # cross touching flagged ant → passthrough
    ]
    vis = spark.createDataFrame(rows)
    out = vv.correct_van_vleck(vis, scale, flagged_ants=[2])
    got = {(r["ant1"], r["ant2"]): r for r in out.collect()}

    a00 = got[(0, 0)]
    assert a00["xx_re"] == pytest.approx(scale * sigma_xx ** 2, rel=1e-6)
    assert a00["yy_re"] == pytest.approx(scale * sigma_yy ** 2, rel=1e-6)
    assert a00["xx_im"] == 0.0 and a00["yy_im"] == 0.0
    # auto xy: kappa solved from khat=0.01 with (sigma_xx, sigma_yy); yx = conj
    kappa = vv.van_vleck_crosses(
        np.array([0.01]), np.array([sigma_xx]), np.array([sigma_yy]))[0]
    assert a00["xy_re"] == pytest.approx(scale * kappa, rel=1e-6)
    assert a00["yx_re"] == pytest.approx(scale * kappa, rel=1e-6)
    assert a00["yx_im"] == pytest.approx(-a00["xy_im"], abs=1e-6)

    # cross (0,1): xx corrected with sigma_xx(ant0) x sigma_xx(ant1)
    c01 = got[(0, 1)]
    kx = vv.van_vleck_crosses(
        np.array([500.0 / scale]), np.array([sigma_xx]), np.array([sigma_xx]))[0]
    assert c01["xx_re"] == pytest.approx(scale * kx, rel=1e-6)

    # flagged ant 2: auto and cross untouched
    assert got[(2, 2)]["xx_re"] == pytest.approx(np.float32(sighat_xx ** 2 * scale), rel=1e-7)
    assert got[(2, 2)]["xx_im"] == 7.0
    assert got[(0, 2)]["xx_re"] == 500.0


def test_cross_solver_divergence_is_passthrough():
    # tiny sigmas push the Newton step outside [0,1) (pdf overflow /
    # zero derivative): diverged cells must pass khat through, never
    # emit the garbage iterate (reference unwrap_or, van_vleck.rs:764)
    import numpy as np
    from birli_spark.operators import vanvleck as vv
    sigmas = np.array([0.3, 0.2, 0.15, 0.5, 0.8])
    khat = 0.9 * sigmas * sigmas
    out = vv.van_vleck_crosses(khat, sigmas, sigmas)
    assert np.isfinite(out).all()
    # the pathological cells fall back to khat exactly
    assert out[0] == khat[0] and out[1] == khat[1] and out[2] == khat[2]
    # healthy cells actually get corrected (not passthrough)
    assert out[3] != khat[3] and out[4] != khat[4]
