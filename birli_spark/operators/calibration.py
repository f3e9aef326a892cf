"""C6 — apply direction-independent calibration solutions
(SURVEY.md §2.4; reference apply_di_calsol, src/calibration.rs:41-131).

Per baseline & channel: ``V' = J_ant1 · V · J_ant2^H`` — a 2x2 complex
matrix sandwich in f64, demoted to f32. Calsol channels are upsampled by an
integer ratio: each solution channel covers ``vis_chans / sol_chans`` fine
channels (src/calibration.rs:76-82). If the result contains NaN, the cell is
flagged and a positive weight negated (src/calibration.rs:117-124).

Spark shape: two broadcast joins on (ant, chan div ratio) + one fused
projection of the 8 sandwich expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from birli_spark.functions.complex import VIS_COLS, jones_sandwich

_JCOLS = [f"j{ij}_{c}" for ij in ("00", "01", "10", "11") for c in ("re", "im")]


def _cal_fragments(j1_prefix: str, j2_prefix: str) -> dict[str, str]:
    v = {c: c for c in VIS_COLS}
    j1 = {c: f"{j1_prefix}{c}" for c in _JCOLS}
    j2 = {c: f"{j2_prefix}{c}" for c in _JCOLS}
    sandwich = jones_sandwich(v, j1, j2)
    nan_check = " OR ".join(f"isnan({sandwich[c]})" for c in VIS_COLS)
    # a missing solution row (left-join NULL) must not drop the vis row:
    # pass the visibility through unchanged and treat it like the NaN
    # case — flag + negate positive weight (the reference's dense sol
    # array cannot be "missing"; flag-and-passthrough is the relational
    # spelling of its bad-solution handling, src/calibration.rs:117-124)
    have = f"({j1_prefix}j00_re IS NOT NULL AND {j2_prefix}j00_re IS NOT NULL)"
    frags = {c: f"CASE WHEN {have} THEN {sandwich[c]} ELSE {c} END"
             for c in VIS_COLS}
    bad = f"(NOT {have} OR ({nan_check}))"
    frags["flag"] = f"(flag OR {bad})"
    frags["weight"] = (
        f"CASE WHEN {bad} AND weight > 0 THEN -weight ELSE weight END"
    )
    return frags


def apply_di_calsol(vis: DataFrame, calsols: DataFrame, ratio: int) -> DataFrame:
    """Apply the DI calibration sandwich. ``calsols`` has columns
    (ant, chan, j00_re..j11_im); ``ratio`` = vis_chans / sol_chans."""
    s1 = F.broadcast(calsols.select(
        F.col("ant").alias("_cal_ant1"), F.col("chan").alias("_sc1"),
        *[F.col(c).alias(f"_j1_{c}") for c in _JCOLS],
    ))
    s2 = F.broadcast(calsols.select(
        F.col("ant").alias("_cal_ant2"), F.col("chan").alias("_sc2"),
        *[F.col(c).alias(f"_j2_{c}") for c in _JCOLS],
    ))
    joined = (
        vis.withColumn("_sc", F.expr(f"CAST(FLOOR(chan / {ratio}) AS INT)"))
        .join(s1, (F.col("ant1") == F.col("_cal_ant1"))
              & (F.col("_sc") == F.col("_sc1")), "left")
        .join(s2, (F.col("ant2") == F.col("_cal_ant2"))
              & (F.col("_sc") == F.col("_sc2")), "left")
    )
    frags = _cal_fragments("_j1_", "_j2_")
    return joined.select(
        *[F.expr(frags[c]).alias(c) if c in frags else F.col(c) for c in vis.columns]
    )


def calibration_oracle_select(vis: str = "vis", calsols: str = "calsols",
                              ratio: int = 2,
                              vis_columns: tuple[str, ...] = ()) -> str:
    frags = _cal_fragments("s1.", "s2.")
    cols = ", ".join(
        f"{frags[c]} AS {c}" if c in frags else f"v.{c}" for c in vis_columns
    )
    return (
        f"SELECT {cols} FROM {vis} v"
        f" LEFT JOIN {calsols} s1 ON v.ant1 = s1.ant"
        f" AND CAST(FLOOR(v.chan / {ratio}) AS INT) = s1.chan"
        f" LEFT JOIN {calsols} s2 ON v.ant2 = s2.ant"
        f" AND CAST(FLOOR(v.chan / {ratio}) AS INT) = s2.chan"
    )
