"""O2b — the COMPLETE Measurement Set v2 relational model: the MAIN
table (sinks/ms.py) plus the subtable set the reference emits via
marlu/casacore (``write_ms``, src/io/mod.rs:542-595): ANTENNA,
SPECTRAL_WINDOW, POLARIZATION, DATA_DESCRIPTION, FIELD, FEED, STATE,
PROCESSOR, OBSERVATION, HISTORY — per the MS v2 definition (Kemball &
Wieringa, AIPS++ note 229 / casacore MeasurementSet 2.0).

Physical casacore binary emission needs a casacore-side validator this
environment doesn't have (no casacore, and the reference ships only CSV
dumps of MS content, tests/casa_dump_ms.py) — so the sink writes the MS
as a DIRECTORY of parquet relations mirroring the casacore table tree
(one subdirectory per subtable, MAIN at the root, a table.info-style
MANIFEST), which any casacore-side transcriber can convert 1:1; array
columns (POSITION, CHAN_FREQ, CORR_TYPE, ...) are in long format
(row_id, idx, value) to stay exactly hashable.

The driver gate flattens every subtable into ONE entity-attribute-value
relation (``subtables_bundle``) so the whole subtable set is a single
hash-checked query (o2b_ms_subtables)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from birli_spark.sources import synthetic as syn

#: casacore Stokes enum: XX=9, XY=10, YX=11, YY=12
CORR_TYPES = (9, 10, 11, 12)
#: MJD seconds of the GPS epoch + TAI offset (ms.py convention)
from birli_spark.sinks.ms import GPS_EPOCH_MJD, GPS_TAI_OFFSET_S  # noqa: E402
from birli_spark.operators.precession import (  # noqa: E402
    MWA_LAT_RAD, MWA_LON_RAD)

#: MWA geocentre-ish ITRF reference position (public site constant, m) —
#: the subtable POSITION origin the ENH offsets are relative to
MWA_ITRF = (-2559454.08, 5095372.14, -2849057.18)


def _obs_time_s() -> tuple[float, float]:
    t0 = GPS_EPOCH_MJD * 86400.0 + syn.GPS_START + GPS_TAI_OFFSET_S
    return t0, t0 + syn.NUM_T * syn.INT_TIME_S


def subtable_sqls(ra_rad: float = 0.0,
                  dec_rad: float = -0.4712388980384690,
                  avg_freq: int = 1,
                  ) -> dict[str, str]:
    """name -> SELECT (valid in BOTH dialects: VALUES + arithmetic over
    the antennas dim only). Array columns are long-format (idx, val).

    ``avg_freq`` > 1 describes the channelization AFTER frequency
    averaging (bin centres, widened widths) — what the physical MS
    (sinks/ms_file.py) must declare so SPECTRAL_WINDOW matches its
    averaged MAIN; the o2b gate keeps the full-resolution default.
    A non-divisor factor would make SPECTRAL_WINDOW (floor) contradict
    MAIN's ceil-edged channel axis, so it fails loudly — the same
    BadArrayShape posture as the reference's passband scrunch
    (src/corrections.rs:489)."""
    if (syn.NUM_CC * syn.NUM_FC) % avg_freq:
        raise ValueError(
            f"avg_freq={avg_freq} does not divide the "
            f"{syn.NUM_CC * syn.NUM_FC}-channel axis; SPECTRAL_WINDOW "
            f"would contradict MAIN's averaged DATA shape")
    t0, t1 = _obs_time_s()
    ant = syn.ANTENNAS_SQL
    # ANTENNA: one row per antenna; POSITION long-format via a 3-row
    # axis dim (ITRF = site origin + ENH-rotated offset)
    import math
    slat, clat = math.sin(MWA_LAT_RAD), math.cos(MWA_LAT_RAD)
    slon, clon = math.sin(MWA_LON_RAD), math.cos(MWA_LON_RAD)
    # local (x=-sl*N+cl*H [toward meridian], y=E, z=cl*N+sl*H) -> ITRF
    # via R3(-lon): X = x*clon - y*slon, Y = x*slon + y*clon, Z = z
    x = f"({-slat!r} * north_m + {clat!r} * height_m)"
    z = f"({clat!r} * north_m + {slat!r} * height_m)"
    pos = {
        0: f"{MWA_ITRF[0]!r} + {x} * {clon!r} - east_m * {slon!r}",
        1: f"{MWA_ITRF[1]!r} + {x} * {slon!r} + east_m * {clon!r}",
        2: f"{MWA_ITRF[2]!r} + {z}",
    }
    pos_case = (f"CASE idx WHEN 0 THEN {pos[0]} WHEN 1 THEN {pos[1]}"
                f" ELSE {pos[2]} END")
    n_chan = syn.NUM_CC * syn.NUM_FC // avg_freq
    chan_width = syn.FINE_CHAN_WIDTH_HZ * avg_freq
    # bin centre of each averaged output channel
    chan_freq = (f"CAST({syn.BASE_FREQ_HZ!r} + (CAST(idx AS DOUBLE)"
                 f" * {avg_freq} + {(avg_freq - 1) / 2.0!r})"
                 f" * {syn.FINE_CHAN_WIDTH_HZ!r} AS DOUBLE)")
    corr_case = ("CASE idx WHEN 0 THEN 9 WHEN 1 THEN 10 WHEN 2 THEN 11"
                 " ELSE 12 END")
    dir_case = f"CASE idx WHEN 0 THEN {ra_rad!r} ELSE {dec_rad!r} END"
    return {
        "ANTENNA": (
            f"SELECT a.ant AS antenna_id,"
            f" concat('Tile', CAST(a.ant AS STRING)) AS name,"
            f" 'MWA' AS station, 'GROUND-BASED' AS type,"
            f" 'ALT-AZ' AS mount, CAST(4.0 AS DOUBLE) AS dish_diameter,"
            f" a.flagged AS flag_row, x.idx AS pos_idx,"
            f" CAST({pos_case} AS DOUBLE) AS position_m"
            f" FROM ({ant}) a CROSS JOIN"
            f" (VALUES (0), (1), (2)) AS x(idx)"),
        "SPECTRAL_WINDOW": (
            f"SELECT 0 AS spectral_window_id, 'MWA_BAND' AS name,"
            f" {n_chan} AS num_chan, c.idx AS chan_idx,"
            f" {chan_freq} AS chan_freq_hz,"
            f" CAST({chan_width!r} AS DOUBLE) AS chan_width_hz,"
            f" CAST({chan_width!r} AS DOUBLE)"
            f" AS effective_bw_hz,"
            f" CAST({chan_width!r} AS DOUBLE) AS resolution_hz,"
            f" CAST({syn.BASE_FREQ_HZ + syn.FINE_CHAN_WIDTH_HZ * (syn.NUM_CC * syn.NUM_FC - 1) / 2.0!r}"
            f" AS DOUBLE) AS ref_frequency_hz, FALSE AS flag_row"
            f" FROM (SELECT CAST(r AS INT) AS idx FROM"
            f" (VALUES {', '.join(f'({i})' for i in range(n_chan))})"
            f" AS rr(r)) c"),
        "POLARIZATION": (
            f"SELECT 0 AS polarization_id, 4 AS num_corr,"
            f" idx AS corr_idx, {corr_case} AS corr_type, FALSE AS flag_row"
            f" FROM (VALUES (0), (1), (2), (3)) AS x(idx)"),
        "DATA_DESCRIPTION": (
            "SELECT 0 AS data_desc_id, 0 AS spectral_window_id,"
            " 0 AS polarization_id, FALSE AS flag_row"
            " FROM (VALUES (0)) AS x(i)"),
        "FIELD": (
            f"SELECT 0 AS field_id, 'field0' AS name, '' AS code,"
            f" CAST({t0!r} AS DOUBLE) AS time_mjd_s, 0 AS num_poly,"
            f" x.idx AS dir_idx, CAST({dir_case} AS DOUBLE)"
            f" AS phase_dir_rad, CAST({dir_case} AS DOUBLE)"
            f" AS delay_dir_rad, CAST({dir_case} AS DOUBLE)"
            f" AS reference_dir_rad, -1 AS source_id, FALSE AS flag_row"
            f" FROM (VALUES (0), (1)) AS x(idx)"),
        "FEED": (
            f"SELECT a.ant AS antenna_id, 0 AS feed_id,"
            f" 0 AS spectral_window_id, CAST({t0!r} AS DOUBLE)"
            f" AS time_mjd_s, 2 AS num_receptors, 0 AS beam_id,"
            f" x.idx AS receptor_idx,"
            f" CASE x.idx WHEN 0 THEN 'X' ELSE 'Y' END AS polarization_type,"
            f" CAST(0.0 AS DOUBLE) AS receptor_angle_rad"
            f" FROM ({ant}) a CROSS JOIN (VALUES (0), (1)) AS x(idx)"),
        "STATE": (
            "SELECT 0 AS state_id, FALSE AS sig, FALSE AS ref,"
            " CAST(0.0 AS DOUBLE) AS cal, CAST(0.0 AS DOUBLE) AS load,"
            " 0 AS sub_scan, 'UNSPECIFIED' AS obs_mode, FALSE AS flag_row"
            " FROM (VALUES (0)) AS x(i)"),
        "PROCESSOR": (
            "SELECT 0 AS processor_id, 'CORRELATOR' AS type,"
            " 'MWA' AS sub_type, -1 AS type_id, -1 AS mode_id,"
            " FALSE AS flag_row FROM (VALUES (0)) AS x(i)"),
        "OBSERVATION": (
            f"SELECT 0 AS observation_id, 'MWA' AS telescope_name,"
            f" CAST({t0!r} AS DOUBLE) AS time_range_start_s,"
            f" CAST({t1!r} AS DOUBLE) AS time_range_end_s,"
            f" 'birli_spark' AS observer, 'synthetic' AS project,"
            f" CAST({t0!r} AS DOUBLE) AS release_date_s, FALSE AS flag_row"
            f" FROM (VALUES (0)) AS x(i)"),
        "HISTORY": (
            f"SELECT CAST({t0!r} AS DOUBLE) AS time_mjd_s,"
            f" 0 AS observation_id, 'NORMAL' AS priority,"
            f" 'birli_spark preprocess' AS message, 'O2b' AS origin,"
            f" 'pipeline' AS application FROM (VALUES (0)) AS x(i)"),
    }


def subtables_bundle_sql() -> str:
    """Every subtable flattened to ONE (table_name, row_id, attr, val)
    EAV relation — the single hash-checked driver surface. Numeric
    values are f32-demoted doubles rendered to a canonical string, so
    one relation carries every column type exactly."""
    parts = []
    for name, sql in subtable_sqls().items():
        parts.append(
            f"SELECT '{name}' AS table_name, row_id, attr, val_str,"
            f" val_num FROM ({_eav(name, sql)}) e_{name.lower()}")
    return "\nUNION ALL\n".join(parts)


_EAV_COLS: dict[str, tuple[tuple[str, str], ...]] = {}


def _eav(name: str, sql: str) -> str:
    """Unpivot a subtable SELECT into (row_id, attr, val_str, val_num).
    The row id is the ordinal key tuple rendered as text. Numerics stay
    a (f32-demoted) DOUBLE column — Spark and DuckDB format doubles to
    text differently, so they must hash as doubles, not strings."""
    cols = _subtable_columns(name)
    keys = _subtable_keys(name)
    key_expr = " || '/' || ".join(
        f"CAST({k} AS STRING)" for k in keys)
    arms = []
    for col, kind in cols:
        vs, vn = "CAST(NULL AS STRING)", "CAST(NULL AS DOUBLE)"
        if kind == "d":
            vn = f"CAST(CAST({col} AS FLOAT) AS DOUBLE)"
        elif kind == "b":
            vs = f"CASE WHEN {col} THEN 'true' ELSE 'false' END"
        else:
            vs = f"CAST({col} AS STRING)"
        arms.append(f"SELECT {key_expr} AS row_id, '{col}' AS attr,"
                    f" {vs} AS val_str, {vn} AS val_num FROM ({sql}) s")
    return "\nUNION ALL\n".join(arms)


def _subtable_columns(name: str) -> tuple[tuple[str, str], ...]:
    return {
        "ANTENNA": (("name", "s"), ("station", "s"), ("type", "s"),
                    ("mount", "s"), ("dish_diameter", "d"),
                    ("flag_row", "b"), ("position_m", "d")),
        "SPECTRAL_WINDOW": (("name", "s"), ("num_chan", "s"),
                            ("chan_freq_hz", "d"), ("chan_width_hz", "d"),
                            ("effective_bw_hz", "d"),
                            ("resolution_hz", "d"),
                            ("ref_frequency_hz", "d"), ("flag_row", "b")),
        "POLARIZATION": (("num_corr", "s"), ("corr_type", "s"),
                         ("flag_row", "b")),
        "DATA_DESCRIPTION": (("spectral_window_id", "s"),
                             ("polarization_id", "s"), ("flag_row", "b")),
        "FIELD": (("name", "s"), ("time_mjd_s", "d"),
                  ("phase_dir_rad", "d"), ("delay_dir_rad", "d"),
                  ("reference_dir_rad", "d"), ("source_id", "s"),
                  ("flag_row", "b")),
        "FEED": (("num_receptors", "s"), ("polarization_type", "s"),
                 ("receptor_angle_rad", "d"), ("time_mjd_s", "d")),
        "STATE": (("sig", "b"), ("ref", "b"), ("cal", "d"),
                  ("load", "d"), ("obs_mode", "s"), ("flag_row", "b")),
        "PROCESSOR": (("type", "s"), ("sub_type", "s"),
                      ("flag_row", "b")),
        "OBSERVATION": (("telescope_name", "s"),
                        ("time_range_start_s", "d"),
                        ("time_range_end_s", "d"), ("observer", "s"),
                        ("project", "s"), ("flag_row", "b")),
        "HISTORY": (("time_mjd_s", "d"), ("priority", "s"),
                    ("message", "s"), ("origin", "s"),
                    ("application", "s")),
    }[name]


def _subtable_keys(name: str) -> tuple[str, ...]:
    return {
        "ANTENNA": ("antenna_id", "pos_idx"),
        "SPECTRAL_WINDOW": ("spectral_window_id", "chan_idx"),
        "POLARIZATION": ("polarization_id", "corr_idx"),
        "DATA_DESCRIPTION": ("data_desc_id",),
        "FIELD": ("field_id", "dir_idx"),
        "FEED": ("antenna_id", "feed_id", "receptor_idx"),
        "STATE": ("state_id",),
        "PROCESSOR": ("processor_id",),
        "OBSERVATION": ("observation_id",),
        "HISTORY": ("observation_id",),
    }[name]


# --------------------------------------------------------- file sink ---

def write_ms_dir(spark: SparkSession, baked: DataFrame, out_dir: str,
                 avg_time: int, avg_freq: int, gps_start: float,
                 int_time_s: float) -> None:
    """MS-as-directory: MAIN partitioned parquet at the root (ms.py
    layout) + one parquet subdirectory per subtable + a table.info-style
    MANIFEST — the casacore table tree in open columnar form."""
    import json
    import os

    from birli_spark.sinks import ms as ms_main

    ms_main.write_ms_parquet(baked, f"{out_dir}/MAIN", avg_time,
                             avg_freq, gps_start, int_time_s)
    names = []
    for name, sql in subtable_sqls().items():
        spark.sql(sql).coalesce(1).write.mode("overwrite").parquet(
            f"{out_dir}/{name}")
        names.append(name)
    with open(os.path.join(out_dir, "MANIFEST.json"), "w") as f:
        json.dump({"type": "MeasurementSet", "version": 2,
                   "layout": "parquet-relational",
                   "subtables": names}, f, indent=1)


def read_ms_dir(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Roundtrip reader: {'MAIN': df, '<SUBTABLE>': df, ...}."""
    import json

    with open(f"{path}/MANIFEST.json") as f:
        manifest = json.load(f)
    out = {"MAIN": spark.read.parquet(f"{path}/MAIN")}
    for name in manifest["subtables"]:
        out[name] = spark.read.parquet(f"{path}/{name}")
    return out
