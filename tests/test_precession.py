"""Gates for the first-principles precession module
(operators/precession.py): model sanity, SQL-vs-numpy agreement, and
Spark-vs-DuckDB bit-exactness (the driver hash-gate property for
c3c_part_uvw_precessed)."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from birli_spark.functions import textsql as X
from birli_spark.operators import precession as PR
from birli_spark.sources import synthetic as syn

RA0, DEC0 = 0.0, -27.0 * math.pi / 180.0


def test_nutation_magnitude():
    """dpsi/deps at J2019.8 are arcsec-scale with the right sign
    structure (dominant Omega term)."""
    dpsi, deps = PR.nutation00b(0.1977)
    assert 1e-6 < abs(dpsi) < 1e-4
    assert 1e-6 < abs(deps) < 1e-4


def test_npb_is_a_rotation():
    npb, _, _ = PR.npb_matrix(0.1977)
    np.testing.assert_allclose(npb @ npb.T, np.eye(3), atol=1e-12)
    assert abs(np.linalg.det(npb) - 1.0) < 1e-12
    # ~20 years of precession: the (0,1) entry is ~psi*cos(eps) ~ 2.2e-3
    assert 1e-3 < abs(npb[0, 1]) < 1e-2


def test_norm_preserved():
    xyz = np.array([[100.0, -50.0, 25.0]])
    p = PR.part_uvw_j2000(2458766.1478, RA0, DEC0, xyz)
    assert abs(np.linalg.norm(p) - np.linalg.norm(xyz)) < 1e-9


def test_sql_cross_engine_bitexact_and_matches_numpy(spark):
    spark.sql(f"CREATE OR REPLACE TEMP VIEW prc_ants AS "
              f"{syn.ANTENNAS_SQL}")
    s = spark.sql(PR.part_uvw_precessed_sql(
        X.SPARK, RA0, DEC0, float(syn.GPS_START), syn.INT_TIME_S,
        syn.NUM_T, antennas="prc_ants")).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW prc_ants AS {syn.ANTENNAS_SQL}")
    d = con.execute(PR.part_uvw_precessed_sql(
        X.DUCK, RA0, DEC0, float(syn.GPS_START), syn.INT_TIME_S,
        syn.NUM_T, antennas="prc_ants")).df()
    key = ["t", "ant"]
    s2 = s.sort_values(key).reset_index(drop=True)
    d2 = d.sort_values(key).reset_index(drop=True)
    assert len(s2) == len(d2) > 0
    for c in ("u", "v", "w"):
        a = s2[c].to_numpy(np.float64)
        b = d2[c].to_numpy(np.float64)
        assert (a.view(np.int64) == b.view(np.int64)).all(), c
    # numpy twin within the f32-trig envelope (micron-scale)
    for t in sorted(s2.t.unique()):
        jd = PR.JD_GPS_EPOCH + (syn.GPS_START + (t + 0.5) * syn.INT_TIME_S
                                - PR.GPS_UTC_LEAP_S) / 86400.0
        sub = s2[s2.t == t].sort_values("ant")
        xyz = np.stack([PR.enh_to_xyz(a * 10.0, a * 20.0, 377.0)
                        for a in sub.ant])
        ref = PR.part_uvw_j2000(jd, RA0, DEC0, xyz)
        np.testing.assert_allclose(
            sub[["u", "v", "w"]].to_numpy(), ref, atol=1e-4)
