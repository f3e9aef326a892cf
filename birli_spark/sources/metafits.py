"""S3 — REAL metafits reader: the observation-metadata FITS every MWA
obs ships (the reference delegates this to the external mwalib crate;
SURVEY.md §2.1 S3). Parsed with the repo's pure-numpy FITS primitives
and validated against the reference's own test metafits
(``tests/data/1297526432_mwax/1297526432.metafits``).

Produces the same dimension DataFrames the synthetic source provides
(`sources/synthetic.py::DIM_SQL`), so the whole correction pipeline can
run off a real observation's metadata: antennas (tile name, ENH
position, per-pol electrical cable length, flagged), digital gains per
(antenna, coarse channel), timesteps, coarse channels, plus the scalar
observation context (quack time, int time, fine-channel width, phase
centre) the CLI consumes.

Conventions replicated from the public mwalib/cotter behavior:

- TILEDATA ``Length`` strings prefixed ``EL_`` are electrical metres;
  unprefixed values are physical metres × 1.204 velocity factor;
- ``Gains`` are per-coarse-channel digital gains ÷ 64
  (reference src/corrections.rs:356-365 divides by the /64-normalised
  metafits gains);
- antenna index = the TILEDATA ``Antenna`` column (two rows per
  antenna, polarisations X and Y).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from birli_spark.sources import fitscore as fc

VELOCITY_FACTOR = 1.204


def read_metafits(path: str) -> tuple[dict, dict]:
    """→ (primary header dict, TILEDATA column dict)."""
    with open(path, "rb") as f:
        raw = f.read()
    primary, off = fc.parse_header(raw)
    tiledata = None
    while off < len(raw):
        hdr, off = fc.parse_header(raw, off)
        size = fc.data_size_bytes(hdr)
        data = raw[off:off + size]
        off = fc.skip_data(off, hdr)
        if hdr.get("EXTNAME") == "TILEDATA":
            tiledata = fc.parse_bintable(hdr, data)
    if tiledata is None:
        raise ValueError(f"{path}: no TILEDATA extension")
    return primary, tiledata


def electrical_length_m(length_str: str) -> float:
    """``EL_78.72`` → 78.72 (already electrical); bare metres → physical
    × velocity factor (the mwalib/cotter convention)."""
    s = length_str.strip()
    if s.startswith("EL_"):
        return float(s[3:])
    return float(s) * VELOCITY_FACTOR


def antenna_rows(tiledata: dict) -> list[dict]:
    """One row per antenna, merging its X and Y rfinputs."""
    ants: dict[int, dict] = {}
    n = len(tiledata["Antenna"])
    for i in range(n):
        ant = int(tiledata["Antenna"][i])
        pol = str(tiledata["Pol"][i]).strip().upper()
        row = ants.setdefault(ant, {
            "ant": ant,
            "tile_id": int(tiledata["Tile"][i]),
            "tile_name": str(tiledata["TileName"][i]),
            "east_m": float(tiledata["East"][i]),
            "north_m": float(tiledata["North"][i]),
            "height_m": float(tiledata["Height"][i]),
            "flagged": False,
        })
        row[f"elec_length_{pol.lower()}_m"] = electrical_length_m(
            str(tiledata["Length"][i]))
        row["flagged"] = row["flagged"] or bool(int(tiledata["Flag"][i]))
        row[f"gains_{pol.lower()}"] = (
            np.asarray(tiledata["Gains"][i], dtype=np.float64) / 64.0)
    return [ants[a] for a in sorted(ants)]


def values_df(spark: SparkSession, rows: list[tuple],
              schema_sql: str) -> DataFrame:
    """Dimension DataFrame as a VALUES LITERAL (LocalRelation), not
    ``createDataFrame(list)``: the latter is a Python-RDD-backed leaf —
    every action pays a Python-worker round trip PER PARTITION to
    deserialize it, its size statistics are unknown to Catalyst, and a
    dim x dim join of two such leaves becomes a defaultParallelism^2
    -task cartesian (measured: the 128-antenna baseline-flags cross
    was a 1024-task stage of pure scheduling overhead in the scale-e2e
    run). A VALUES literal is a JVM-side LocalRelation: zero tasks,
    exact stats, broadcast-ready."""
    cols = [c.strip().split()[0] for c in schema_sql.split(",")]
    typs = [c.strip().split(None, 1)[1] for c in schema_sql.split(",")]

    if not rows:
        # 'VALUES ' with an empty body is a parse error; an empty dim
        # is fine as an empty LocalRelation
        return spark.sql(
            "SELECT " + ", ".join(
                f"CAST(NULL AS {t}) AS {c}"
                for c, t in zip(cols, typs)) + " WHERE FALSE")

    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, float):
            if v != v:
                return "CAST('NaN' AS DOUBLE)"
            if v == float("inf"):
                return "CAST('Infinity' AS DOUBLE)"
            if v == float("-inf"):
                return "CAST('-Infinity' AS DOUBLE)"
            return repr(v)
        if isinstance(v, str):
            # single-quote SQL string literal; '' escapes a quote —
            # never splice a raw str into the VALUES text
            return "'" + v.replace("'", "''") + "'"
        if isinstance(v, (int,)):
            return str(v)
        raise TypeError(
            f"values_df: unsupported literal type {type(v).__name__}")

    body = ", ".join(
        "(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    sel = ", ".join(f"CAST({c} AS {t}) AS {c}"
                    for c, t in zip(cols, typs))
    return spark.sql(f"SELECT {sel} FROM (VALUES {body})"
                     f" AS v({', '.join(cols)})")


def antennas_df(spark: SparkSession, tiledata: dict) -> DataFrame:
    """The antennas dimension in the engine's canonical schema."""
    rows = [(r["ant"], r["elec_length_x_m"], r["elec_length_y_m"],
             r["east_m"], r["north_m"], r["height_m"], r["flagged"])
            for r in antenna_rows(tiledata)]
    return values_df(
        spark, rows,
        "ant int, elec_length_x_m double, elec_length_y_m double, "
        "east_m double, north_m double, height_m double, "
        "flagged boolean")


def digital_gains_df(spark: SparkSession, tiledata: dict,
                     sel_positions: list[int] | None = None) -> DataFrame:
    """(ant, cc, gain_x, gain_y) — the C4 correction dim.

    ``sel_positions`` are the CHANSEL-selected indices into the full
    per-tile gains list (see :func:`selected_channel_positions`): the
    vis relation's ``cc`` indexes the SELECTED coarse list, so for a
    picket-fence obs the gains must be remapped to those positions or
    channel k's data would divide by channel 0's gain. None = all
    channels in order (the full-band case)."""
    rows = []
    for r in antenna_rows(tiledata):
        pos = (sel_positions if sel_positions is not None
               else range(len(r["gains_x"])))
        for cc, p in enumerate(pos):
            rows.append((r["ant"], cc, float(r["gains_x"][p]),
                         float(r["gains_y"][p])))
    return values_df(spark, rows,
                     "ant int, cc int, gain_x double, gain_y double")


def selected_channel_positions(primary: dict) -> list[int] | None:
    """CHANSEL as positions into the full CHANNELS/gains lists, or
    None when the obs uses the full band (the common case)."""
    sel = str(primary.get("CHANSEL", "")).strip()
    if not sel:
        return None
    return [int(i) for i in sel.split(",") if i != ""]


def timesteps_df(spark: SparkSession, primary: dict) -> DataFrame:
    """(t, ts_gps) — GPS second per scan from GPSTIME + INTTIME.

    ts_gps is the scan START, the reference's convention
    (finalise_flag_settings compares timestep.unix_time_ms,
    src/flags.rs:165-172). The synthetic surface stamps centroids —
    the two agree for every quack/flag-end window that is a multiple
    of the timestep length, which the CLI validates
    (cli._check_flag_window_multiple), so no CLI-reachable flag set
    differs between the conventions."""
    n = int(primary["NSCANS"])
    gps0 = float(primary["GPSTIME"])
    dt = float(primary["INTTIME"])
    return values_df(spark, [(t, gps0 + t * dt) for t in range(n)],
                     "t int, ts_gps double")


def coarse_channels(primary: dict) -> list[int]:
    """Receiver channel numbers of this obs (CHANNELS list, with the
    CHANSEL subset applied when present — the picket-fence case)."""
    chans = [int(c) for c in str(primary["CHANNELS"]).split(",") if c]
    sel = str(primary.get("CHANSEL", "")).strip()
    if sel:
        idx = [int(i) for i in sel.split(",") if i != ""]
        chans = [chans[i] for i in idx]
    return chans


def obs_context(primary: dict) -> dict:
    """The scalar observation context the CLI's parse stage consumes
    (reference BirliContext fields, SURVEY.md §3.1)."""
    return {
        "obsid": int(primary["GPSTIME"]),
        "n_scans": int(primary["NSCANS"]),
        "n_inputs": int(primary["NINPUTS"]),
        "n_ants": int(primary["NINPUTS"]) // 2,
        "int_time_s": float(primary["INTTIME"]),
        "fine_chan_width_hz": float(primary["FINECHAN"]) * 1000.0,
        # NCHANS spans the FULL channel list; CHANSEL subsets files, not
        # the per-coarse fine-channel count. Filter empty tokens like
        # coarse_channels() does (trailing commas from CONTINUE joins).
        "n_fine_per_coarse": (
            int(primary["NCHANS"])
            // max(1, len([c for c in str(primary["CHANNELS"]).split(",")
                           if c]))),
        "quack_s": float(primary.get("QUACKTIM", 0.0)),
        "phase_ra_deg": primary.get("RAPHASE"),
        "phase_dec_deg": primary.get("DECPHASE"),
        "pointing_ra_deg": primary.get("RA"),
        "pointing_dec_deg": primary.get("DEC"),
        "coarse_channels": coarse_channels(primary),
        "freq_offset_hz": _freq_offset_hz(primary),
        # correlator version + PFB state for --passband-gains auto
        # (reference resolves these from mwalib's metafits context):
        # MODE=MWAX_CORRELATOR -> MWAXv2, HW_LFILES -> Legacy;
        # OVERSAMP/DERIPPLE are MWAX-era keys, absent on legacy files
        "mwa_version": ("MWAXv2"
                        if str(primary.get("MODE", "")).strip()
                        == "MWAX_CORRELATOR" else "Legacy"),
        "oversampled": int(primary.get("OVERSAMP", 0) or 0) == 1,
        "deripple_applied": int(primary.get("DERIPPLE", 0) or 0) == 1,
    }


def _freq_offset_hz(primary: dict) -> float:
    """Fine-channel centre offset of offline-averaged observations.

    Offline averaging by factor k shifts every averaged channel's
    centre by (k-1)/2 x native width (the mean of k consecutive native
    centres), and the metafits records the shifted band centre in
    FREQCENT: e.g. the reference's 1254670392_avg (4 x 10 kHz -> 40 kHz)
    carries FREQCENT 15 kHz above the naive coarse grid, and Cotter's
    golden dumps put channel 0 at 167.055 MHz accordingly. Recover the
    scalar offset as FREQCENT - (the naive 24-coarse band centre,
    CENTCHAN x 1.28 MHz - 0.64 MHz); native observations yield exactly
    0 (all four reference fixtures validate this). A value outside
    [0, fine width) means a non-standard band layout - fall back to 0."""
    fc_mhz = primary.get("FREQCENT")
    cent = primary.get("CENTCHAN")
    if fc_mhz is None or cent is None:
        return 0.0
    off = float(fc_mhz) * 1e6 - float(cent) * 1.28e6 + 0.64e6
    fine_hz = float(primary.get("FINECHAN", 0.0)) * 1000.0
    if not (0.0 <= off < max(fine_hz, 1.0)):
        return 0.0
    return off
