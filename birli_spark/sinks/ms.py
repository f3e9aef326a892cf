"""O2 — Measurement Set sink, parquet-canonical form (SURVEY.md §2.7:
the reference writes CASA MS via casacore, unavailable here; SURVEY maps
O2 to "same Parquet sink" for v0).

This emits the MS **MAIN-table schema** — TIME (MJD seconds),
ANTENNA1/ANTENNA2 (0-based), UVW components, per-channel DATA (8 real
columns), WEIGHT, FLAG — as parquet partitioned by output time block,
so a casacore-side converter (or any MS-aware reader of columnar data)
can transcribe it 1:1. Column semantics follow the reference's MS writer
(src/io/mod.rs:542-595 via marlu): times are block centroids, UVWs the
block means the UVFITS sink also uses.

GPS→MJD: MJD_TAI seconds = GPS seconds + 19s TAI offset + GPS-epoch MJD
(44244) * 86400 — the fixed-offset form the synthetic fixtures use
(leap-second handling lives in the real converter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from birli_spark.functions.complex import VIS_COLS
from birli_spark.operators import averaging

GPS_TAI_OFFSET_S = 19.0
GPS_EPOCH_MJD = 44244.0


def _time_expr(gps_start: float, int_time_s: float, avg_time: int) -> str:
    def d(x: float) -> str:
        return f"CAST({x!r} AS DOUBLE)"
    centroid = (f"({d(gps_start)} + (t_out * {avg_time}) * {d(int_time_s)}"
                f" + {d(avg_time * int_time_s / 2.0)})")
    return (f"({d(GPS_EPOCH_MJD * 86400.0)} + {centroid}"
            f" + {d(GPS_TAI_OFFSET_S)})")


def ms_main_rows(baked: DataFrame, avg_time: int, avg_freq: int,
                 gps_start: float, int_time_s: float) -> DataFrame:
    """Averaged pipeline output in MS MAIN column naming — one row per
    (time block, baseline, channel)."""
    avg = averaging.average_time_freq(baked, avg_time, avg_freq,
                                      extra_mean_cols=("u", "v", "w"))
    t_expr = _time_expr(gps_start, int_time_s, avg_time)
    return avg.select(
        F.expr(t_expr).alias("time_mjd_s"),
        F.col("ant1").alias("antenna1"),
        F.col("ant2").alias("antenna2"),
        F.col("chan_out").alias("chan"),
        F.col("u").alias("uvw_u"), F.col("v").alias("uvw_v"),
        F.col("w").alias("uvw_w"),
        *[F.col(c).alias(f"data_{c}") for c in VIS_COLS],
        F.col("weight").alias("weight"),
        F.col("flag").alias("flag"),
        F.col("t_out").alias("time_block"))


def ms_rows_oracle_select(baked: str, avg_time: int, avg_freq: int,
                          gps_start: float, int_time_s: float) -> str:
    avg = averaging.averaging_oracle_select(baked, avg_time, avg_freq,
                                            extra_mean_cols=("u", "v", "w"))
    t_expr = _time_expr(gps_start, int_time_s, avg_time)
    data_cols = ", ".join(f"{c} AS data_{c}" for c in VIS_COLS)
    return (
        f"SELECT {t_expr} AS time_mjd_s, ant1 AS antenna1, ant2 AS antenna2,"
        f" chan_out AS chan, u AS uvw_u, v AS uvw_v, w AS uvw_w,"
        f" {data_cols}, weight, flag, t_out AS time_block FROM ({avg})")


def write_ms_parquet(baked: DataFrame, out_dir: str, avg_time: int,
                     avg_freq: int, gps_start: float,
                     int_time_s: float) -> None:
    """Partition by time block (the MS writer's incremental chunk axis,
    reference src/cli.rs:1917-1924), rows sorted (baseline, chan) within."""
    rows = ms_main_rows(baked, avg_time, avg_freq, gps_start, int_time_s)
    (rows.repartition("time_block")
     .sortWithinPartitions("antenna1", "antenna2", "chan")
     .write.mode("overwrite").partitionBy("time_block").parquet(out_dir))