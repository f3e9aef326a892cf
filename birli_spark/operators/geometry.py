"""C3b — first-principles partial-UVW geometry from antenna positions
and a phase centre (reference ``calc_part_uvws``,
src/corrections.rs:652-676, which delegates to marlu/ERFA).

The reference precesses the phase centre and tile positions to J2000
per timestep centroid (``precess_time``) and derives per-(t, ant)
partial UVWs; the w-difference per baseline drives the phase-tracking
correction (C3). This module computes the same shape from public
textbook formulas (Thompson, Moran & Swenson ch. 4):

1. local ENH tile coordinates → geodetic XYZ::

       x = −N·sin(φ) + H·cos(φ),   y = E,   z = N·cos(φ) + H·sin(φ)

2. phase-centre hour angle per timestep, H(t) = LST(t) − RA, with LST
   advancing at the sidereal rate from a configurable LST₀;
3. the XYZ→UVW rotation::

       u =  sin(H)·x + cos(H)·y
       v = −sin(δ)·cos(H)·x + sin(δ)·sin(H)·y + cos(δ)·z
       w =  cos(δ)·cos(H)·x − cos(δ)·sin(H)·y + sin(δ)·z

No precession/nutation/aberration terms (those need ERFA; deployments
slot a driver-side erfa/astropy table in via the same (t, ant, u, v, w)
dim contract — SURVEY.md §2.4 C3). Everything here is a **pure
projection over the antennas × timesteps dim cross** (tiny: T×A rows),
expressed identically in Spark SQL and DuckDB SQL, so the whole
geometry derivation is oracle-checked end-to-end.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: MWA latitude (public site constant, radians) — the reference gets it
#: from marlu's MWA ellipsoid constants
MWA_LAT_RAD = -0.4660608448386394
#: sidereal rate: radians of LST advance per SI second
SIDEREAL_RAD_PER_S = 2.0 * math.pi / 86164.0905


def part_uvw_exprs(ra_rad: float, dec_rad: float, lst0_rad: float,
                   int_time_s: float, lat_rad: float = MWA_LAT_RAD,
                   ) -> dict[str, str]:
    """The (u, v, w) expression strings over columns ``t``, ``east_m``,
    ``north_m``, ``height_m`` — identical text for Spark and DuckDB."""
    sl, cl = math.sin(lat_rad), math.cos(lat_rad)
    x = f"(-({sl!r}) * north_m + ({cl!r}) * height_m)"
    y = "east_m"
    z = f"(({cl!r}) * north_m + ({sl!r}) * height_m)"
    ha = f"(({lst0_rad!r}) + CAST(t AS DOUBLE) * ({int_time_s * SIDEREAL_RAD_PER_S!r}) - ({ra_rad!r}))"
    sd, cd = math.sin(dec_rad), math.cos(dec_rad)
    sh, ch = f"SIN({ha})", f"COS({ha})"
    return {
        "u": f"({sh} * {x} + {ch} * {y})",
        "v": f"(-({sd!r}) * {ch} * {x} + ({sd!r}) * {sh} * {y} + ({cd!r}) * {z})",
        "w": f"(({cd!r}) * {ch} * {x} - ({cd!r}) * {sh} * {y} + ({sd!r}) * {z})",
    }


def part_uvw_table(spark: SparkSession, antennas: DataFrame, num_t: int,
                   ra_rad: float, dec_rad: float, lst0_rad: float,
                   int_time_s: float,
                   lat_rad: float = MWA_LAT_RAD) -> DataFrame:
    """(t, ant, u, v, w) partial-UVW dim for a phase centre — the
    broadcast input of :func:`corrections.correct_geometry`. T×A rows:
    a cross of two tiny dims, never touching the fact table."""
    e = part_uvw_exprs(ra_rad, dec_rad, lst0_rad, int_time_s, lat_rad)
    ts = spark.range(num_t).select(F.col("id").cast("int").alias("t"))
    return (antennas.select("ant", "east_m", "north_m", "height_m")
            .crossJoin(ts)
            .select("t", "ant",
                    F.expr(e["u"]).alias("u"),
                    F.expr(e["v"]).alias("v"),
                    F.expr(e["w"]).alias("w")))


def part_uvw_oracle_sql(antennas: str, num_t: int, ra_rad: float,
                        dec_rad: float, lst0_rad: float, int_time_s: float,
                        lat_rad: float = MWA_LAT_RAD) -> str:
    e = part_uvw_exprs(ra_rad, dec_rad, lst0_rad, int_time_s, lat_rad)
    ts = ", ".join(f"({t})" for t in range(num_t))
    return (f"SELECT CAST(t AS INT) AS t, ant, {e['u']} AS u,"
            f" {e['v']} AS v, {e['w']} AS w"
            f" FROM {antennas} CROSS JOIN (VALUES {ts}) AS ts(t)")
