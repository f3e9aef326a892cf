"""End-to-end REAL-FORMAT pipeline (s1h): gpubox FITS files on disk ->
distributed binary scan -> rule flags -> v0.18-gated cable correction ->
RFI in the AOFlagger slot -> geometry -> flag baking -> time/frequency
averaging -> UVFITS group rows + the PHYSICAL executor-parallel
random-groups write.

This is the stage composition of the reference's end-to-end wall-clock
benchmark (obs 1090008640: read + cable + AOFlagger RFI + geometry +
uvfits write = 87.3 s on a ~200 GB observation — BASELINE.md), run over
the s1g real-format synthetic observation (24 coarse-channel gpubox
files, 835k cube rows), so BENCH carries a literally-shaped comparable
number instead of only per-stage queries. The RFI slot runs the
all-relational SSINS flagger (the engine's JVM-side answer to the
AOFlagger FFI; the mwa-default orchestration itself is gated separately
as f9e) so the WHOLE composition stays one hash-checkable plan.

Everything is deterministic and the oracle is one DuckDB text: the scan
content re-derives closed-form (sources/gpubox.py::expected_grid_sql),
the dimension tables are VALUES literals (identical text in both
engines), and every stage reuses the shared dual-dialect builders.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from birli_spark.operators import corrections, flags, ssins, weights
from birli_spark.sinks import uvfits
from birli_spark.sources import gpubox
from birli_spark.sources import synthetic as syn

#: observation shape — identical to the s1g read bench
NUM_CC, NUM_ANTS, NUM_FINE, NUM_T = 24, 16, 32, 8
N_CHAN = NUM_CC * NUM_FINE
GPS0 = 1297526432.0
INT_TIME_S = 2.0
BASE_FREQ_HZ = 138_880_000.0
FINE_W_HZ = 40_000.0
#: W1 Cotter weight factor: 40 kHz / 10 kHz * 2 s
WEIGHT = 8.0
QUACK_S = 4.0     # flags the first two timesteps
N_EDGE = 2        # 80 kHz edges at 40 kHz fine channels
AVG_TIME, AVG_FREQ = 2, 2

#: shared projection fragments (identical text Spark / DuckDB)
FREQ_EXPR = (f"CAST({BASE_FREQ_HZ!r} AS DOUBLE)"
             f" + chan * CAST({FINE_W_HZ!r} AS DOUBLE)")
TS_EXPR = (f"CAST({GPS0!r} AS DOUBLE) + t * CAST({INT_TIME_S!r} AS DOUBLE)"
           f" + CAST({INT_TIME_S / 2.0!r} AS DOUBLE)")

_COLS = syn.VIS_COLUMNS  # same 19-column vis schema as the derived fact


def antennas_values_sql() -> str:
    """(ant, elec_length_x_m, elec_length_y_m, flagged) — deterministic
    cable lengths, one flagged tile (the metafits-flag shape)."""
    rows = ", ".join(
        f"({a}, {90.0 + a * 2.5!r}, {90.25 + a * 2.5!r},"
        f" {'TRUE' if a == 13 else 'FALSE'})"
        for a in range(NUM_ANTS))
    return (f"SELECT CAST(ant AS INT) AS ant,"
            f" CAST(lx AS DOUBLE) AS elec_length_x_m,"
            f" CAST(ly AS DOUBLE) AS elec_length_y_m,"
            f" CAST(fl AS BOOLEAN) AS flagged"
            f" FROM (VALUES {rows}) AS a(ant, lx, ly, fl)")


def timesteps_values_sql(num_t: int = NUM_T) -> str:
    rows = ", ".join(
        f"({t}, {GPS0 + t * INT_TIME_S + INT_TIME_S / 2.0!r})"
        for t in range(num_t))
    return (f"SELECT CAST(t AS INT) AS t, CAST(g AS DOUBLE) AS ts_gps"
            f" FROM (VALUES {rows}) AS tt(t, g)")


def part_uvw_values_sql(num_t: int = NUM_T) -> str:
    """Per-(t, ant) partial UVWs — deterministic literals (the real
    pipeline computes these from tile positions + epoch, C3c; the e2e
    composition exercises the geometry stage's join/rotation shape)."""
    rows = ", ".join(
        f"({t}, {a}, {round(a * 7.25 + t * 0.11, 6)!r},"
        f" {round(a * -3.5 + t * 0.07, 6)!r},"
        f" {round(a * 0.9 + t * 0.013, 6)!r})"
        for t in range(num_t) for a in range(NUM_ANTS))
    return (f"SELECT CAST(t AS INT) AS t, CAST(ant AS INT) AS ant,"
            f" CAST(u AS DOUBLE) AS u, CAST(v AS DOUBLE) AS v,"
            f" CAST(w AS DOUBLE) AS w"
            f" FROM (VALUES {rows}) AS p(t, ant, u, v, w)")


def scan_dir(num_t: int = NUM_T) -> str:
    """Generate (once) the 24 real-format gpubox files — the same files
    and marker the s1g read bench uses. ``num_t`` scales the
    observation along the timestep axis (the s1h scale-slope probe
    uses 4x and 16x); each size keeps its own cache directory."""
    suffix = "" if num_t == NUM_T else f"_t{num_t}"
    d = os.path.join(tempfile.gettempdir(),
                     "birli_spark_gpubox_bench" + suffix)
    marker = os.path.join(d, ".complete")
    # the marker embeds a code fingerprint: files written by an OLDER
    # checkout regenerate instead of being served as current
    from birli_spark import session as _session
    if not _session.marker_valid(marker):
        os.makedirs(d, exist_ok=True)
        for cc in range(NUM_CC):
            gpubox.write_gpubox_fast(
                os.path.join(d, f"gpubox_{cc:02d}.fits"), cc,
                NUM_ANTS, NUM_FINE, num_t, obsid=int(GPS0))
        _session.write_marker(marker)
    return d


def vis_from_scan(scan: DataFrame) -> DataFrame:
    """Project the gpubox scan onto the standard 19-column vis schema
    (adds freq/epoch/weight/flag via the SAME fragments the oracle
    uses)."""
    return scan.select(
        "t", "ant1", "ant2", "bl", "cc", "fc", "chan",
        F.expr(FREQ_EXPR).alias("freq_hz"),
        F.expr(TS_EXPR).alias("ts_gps"),
        F.lit(WEIGHT).cast("double").alias("weight"),
        F.lit(False).alias("flag"),
        *[c for c in _COLS if c.endswith("_re") or c.endswith("_im")],
    ).select(*_COLS)


def e2e_rows(spark: SparkSession, write_path: str | None = None,
             num_t: int = NUM_T) -> DataFrame:
    """The full composition; when ``write_path`` is given, also performs
    the PHYSICAL executor-parallel random-groups write (the reference
    e2e's write stage — byte-gated separately as o1b/mo4). ``num_t``
    scales the observation 4x/16x for the scale-slope probe."""
    vis = vis_from_scan(
        gpubox.read_gpubox(spark, scan_dir(num_t) + "/*.fits"))
    ants = spark.sql(antennas_values_sql())
    ts = spark.sql(timesteps_values_sql(num_t))
    part_uvw = spark.sql(part_uvw_values_sql(num_t))
    ts_f = flags.flag_timesteps_quack(
        ts, GPS0, GPS0 + num_t * INT_TIME_S, quack_s=QUACK_S)
    bl_f = flags.baseline_flags(ants)
    fc_pred = flags.flag_fine_channels(NUM_FINE, n_edge=N_EDGE,
                                       is_legacy=True)
    vis = flags.set_flags(vis, ts_f, bl_f, fc_pred)
    # materialize the decoded+flagged fact ONCE: three downstream
    # consumers (the v0.18 cell-gate aggregate, the SSINS mask
    # derivation, and the main corrected pass) would otherwise each
    # drag the whole gpubox mapInPandas decode behind them — an opaque
    # scan Spark can neither column-prune nor share, so every action
    # paid THREE full archive decodes (guide §5: persist at the
    # fan-out). Rows are unchanged; only the plan shape is.
    vis = vis.localCheckpoint(eager=True)
    vis = corrections.attach_cell_gate(vis)
    vis = corrections.correct_cable_lengths(vis, ants, gated=True)
    vis = vis.drop(corrections.GATE_COL)
    vis = ssins.ssins_flag_vis(vis)          # the AOFlagger slot
    vis = corrections.correct_geometry(vis, part_uvw)
    baked = weights.bake_flags_into_weights(vis)
    rows = uvfits.uvfits_group_rows(baked, AVG_TIME, AVG_FREQ,
                                    GPS0, INT_TIME_S)
    if write_path is not None:
        # the o1b pattern: checkpoint the relation FIRST so the writer's
        # grid probes + the write action run off one materialization,
        # then the returned relation is that same checkpoint
        rows = rows.localCheckpoint(eager=True)
        # .count() forces the executor-parallel pwrite job (the writer
        # returns a lazy per-group confirmation relation)
        uvfits.write_uvfits_distributed(
            rows, write_path, N_CHAN // AVG_FREQ, object_name="e2e_bench",
            jd_zero=uvfits.obs_jd_zero(GPS0)).count()
    return rows


def e2e_oracle_sql() -> str:
    """One DuckDB text of the whole composition."""
    fc_pred = flags.fine_channel_pred_sql(NUM_FINE, n_edge=N_EDGE,
                                          is_legacy=True)
    flagged = flags.set_flags_oracle_select(
        "vis", "ts_flags", "bl_flags", fc_pred, _COLS)
    gate = corrections.cell_gate_oracle_select("flagged")
    flaggedg = (f"SELECT /*+ BROADCAST(g) */ f.*, g.{corrections.GATE_COL}"
                f" FROM flagged f"
                f" JOIN cell_gate g ON f.t = g.t AND f.cc = g.cc")
    cols_g = tuple(_COLS) + (corrections.GATE_COL,)
    cable = corrections.cable_oracle_select("flaggedg", "antennas",
                                            cols_g, gated=True)
    # drop the gate column on the way into the RFI slot
    cabled_cols = ", ".join(_COLS)
    ss_ctes, ss_final = ssins.ssins_parts("cabled2",
                                          median_fn="quantile_cont")
    rfid_cols = ", ".join(
        "(p.flag OR COALESCE(m.rfi_flag, FALSE)) AS flag"
        if c == "flag" else f"p.{c}" for c in _COLS)
    geom = corrections.geom_oracle_select("rfid", "part_uvw", _COLS)
    cols_uvw = tuple(_COLS) + ("u", "v", "w")
    baked_cols = ", ".join(
        "CASE WHEN flag THEN -ABS(weight) ELSE ABS(weight) END AS weight"
        if c == "weight" else c for c in cols_uvw)
    content = gpubox.expected_grid_sql(NUM_CC, NUM_ANTS, NUM_FINE, NUM_T)
    pol_cols = ", ".join(c for c in _COLS
                         if c.endswith("_re") or c.endswith("_im"))
    quack = flags.quack_oracle_select(
        "timesteps", GPS0, GPS0 + NUM_T * INT_TIME_S, quack_s=QUACK_S)
    bl_fo = flags.baseline_flags_oracle_select("antennas")
    rows_sel = uvfits.uvfits_rows_oracle_select(
        "baked", AVG_TIME, AVG_FREQ, GPS0, INT_TIME_S)
    return (
        f"WITH vis AS (SELECT t, ant1, ant2, bl, cc, fc, chan,"
        f" {FREQ_EXPR} AS freq_hz, {TS_EXPR} AS ts_gps,"
        f" CAST({WEIGHT!r} AS DOUBLE) AS weight, FALSE AS flag,"
        f" {pol_cols} FROM ({content}) g0),"
        f" antennas AS ({antennas_values_sql()}),"
        f" timesteps AS ({timesteps_values_sql()}),"
        f" part_uvw AS ({part_uvw_values_sql()}),"
        f" ts_flags AS ({quack}),"
        f" bl_flags AS ({bl_fo}),"
        f" flagged AS ({flagged}),"
        f" cell_gate AS ({gate}),"
        f" flaggedg AS ({flaggedg}),"
        f" cabled AS ({cable}),"
        f" cabled2 AS (SELECT {cabled_cols} FROM cabled),"
        f" {ss_ctes},"
        f" ssins_mask AS ({ss_final}),"
        f" rfid AS (SELECT {rfid_cols} FROM cabled2 p"
        f" LEFT JOIN ssins_mask m ON p.t = m.t AND p.chan = m.chan),"
        f" geomed AS ({geom}),"
        f" baked AS (SELECT {baked_cols} FROM geomed)"
        f" {rows_sel}")
