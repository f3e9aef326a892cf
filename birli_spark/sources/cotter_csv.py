"""Reader for the reference's Cotter golden-output CSV dumps
(tests/data/1254670392_avg/*.uvfits.csv, produced by the reference's
tests/data/dump_uvfits.py): one row per (timestep JD, baseline code,
pol, type∈{vis, weight}) with one column per channel — the golden
fixtures the reference's own compare_uvfits_with_csv gate uses
(src/test_common.rs:208-480).

The loader unpivots to the engine's canonical long format — one row per
(t, bl, chan) with the 8 pol float columns, the shared weight (the
dumps carry identical per-pol weights), `flag = weight < 0`, and
`freq_hz` from the metafits convention
``FREQCENT + (chan − NCHANS/2) · FINECHAN`` (validated against the
cable-phasor ramp of the golden data to < 1e-7 rad).

Driver-side parse (the fixtures are ~1.6 MB); a production UVFITS load
uses sinks/uvfits.py::read_uvfits or the distributed gpubox sources.
"""

from __future__ import annotations

import csv

import numpy as np
from pyspark.sql import DataFrame, SparkSession

POL_ORDER = ("xx", "yy", "xy", "yx")

SCHEMA = ("t int, bl int, ant1 int, ant2 int, chan int, freq_hz double, "
          "jd double, u double, v double, w double, "
          "xx_re float, xx_im float, xy_re float, xy_im float, "
          "yx_re float, yx_im float, yy_re float, yy_im float, "
          "weight float, flag boolean")


def read_cotter_uvfits_csv(spark: SparkSession, path: str,
                           freq0_hz: float, fine_width_hz: float,
                           conjugate: bool = True) -> DataFrame:
    """Long-format DataFrame of one Cotter uvfits CSV dump.

    ``conjugate=True`` (default) negates every imaginary part on load:
    Cotter's dumps are in the conjugate baseline convention relative to
    the reference's internal arrays — the reference's own comparison
    harness conjugates its visibilities before matching the CSVs
    (src/test_common.rs:386-387) — so loading with the flip puts the
    data in the engine's (reference-internal) convention."""
    vis: dict = {}
    wt: dict = {}
    uvw: dict = {}
    with open(path) as f:
        r = csv.reader(f)
        next(r)
        for row in r:
            jd = float(row[0])
            blc = int(row[1])
            pol = row[5].strip()
            typ = row[6].strip()
            key = (jd, blc)
            uvw[key] = (float(row[2]), float(row[3]), float(row[4]))
            if typ == "vis":
                vis[(jd, blc, pol)] = np.array(
                    [complex(v.strip()) for v in row[7:]])
            else:
                wt[(jd, blc, pol)] = np.array(
                    [float(v) for v in row[7:]])
    jds = sorted({k[0] for k in uvw})
    t_of = {j: i for i, j in enumerate(jds)}
    rows = []
    for (jd, blc), (u, v, w) in sorted(uvw.items()):
        if any((jd, blc, p) not in vis for p in POL_ORDER):
            # row-limited dumps truncate mid-baseline — skip partials
            continue
        t = t_of[jd]
        ant1 = blc // 256 - 1
        ant2 = blc % 256 - 1
        sign = -1.0 if conjugate else 1.0
        pv = {p: vis[(jd, blc, p)] for p in POL_ORDER}
        nch = len(pv["xx"])
        # pyuvdata dumps carry no weight rows — default unflagged 1.0
        wts = wt.get((jd, blc, "xx"), np.ones(nch))
        for c in range(nch):
            rows.append((
                t, blc, ant1, ant2, c,
                freq0_hz + c * fine_width_hz, jd, u, v, w,
                float(pv["xx"][c].real), sign * float(pv["xx"][c].imag),
                float(pv["xy"][c].real), sign * float(pv["xy"][c].imag),
                float(pv["yx"][c].real), sign * float(pv["yx"][c].imag),
                float(pv["yy"][c].real), sign * float(pv["yy"][c].imag),
                float(wts[c]), bool(wts[c] < 0)))
    return spark.createDataFrame(rows, SCHEMA)


def chan0_freq_hz(primary: dict) -> float:
    """Channel-0 centre frequency from the metafits primary header:
    FREQCENT − (NCHANS/2)·FINECHAN (the mwalib fine-channel convention;
    empirically exact against the golden cable phase ramp)."""
    return (float(primary["FREQCENT"]) * 1e6
            - (int(primary["NCHANS"]) // 2)
            * float(primary["FINECHAN"]) * 1e3)


def read_cotter_ms_csv(spark: SparkSession, path: str,
                       n_fine_per_coarse: int = 32) -> DataFrame:
    """Long-format DataFrame of a Cotter MS dump
    (tests/data/casa_dump_ms.py format: time, ant1, ant2, u, v, w, type,
    pol, chans…; ant indices 0-based). Keeps the dump's own convention
    (no conjugation — used for dump-vs-dump operator validation).
    Emits (cc, fc) from the global channel for the coarse-keyed dims."""
    vis: dict = {}
    wt: dict = {}
    with open(path) as f:
        r = csv.reader(f)
        next(r)
        for row in r:
            key = (float(row[0]), int(row[1]), int(row[2]),
                   row[7].strip())
            typ = row[6].strip()
            if typ == "vis":
                vis[key] = np.array([complex(v.strip()) for v in row[8:]])
            elif typ == "weight":
                wt[key] = np.array([float(v) for v in row[8:]])
    blts = sorted({k[:3] for k in vis})
    rows = []
    for (tm, a1, a2) in blts:
        pv = {p: vis.get((tm, a1, a2, p)) for p in POL_ORDER}
        if any(v is None for v in pv.values()):
            continue
        nch = len(pv["xx"])
        wts = wt.get((tm, a1, a2, "xx"), np.ones(nch))
        for c in range(nch):
            rows.append((
                0, a1 * 256 + a2, a1, a2, c,
                c // n_fine_per_coarse, c % n_fine_per_coarse,
                float(pv["xx"][c].real), float(pv["xx"][c].imag),
                float(pv["xy"][c].real), float(pv["xy"][c].imag),
                float(pv["yx"][c].real), float(pv["yx"][c].imag),
                float(pv["yy"][c].real), float(pv["yy"][c].imag),
                float(wts[c]), bool(wts[c] < 0)))
    return spark.createDataFrame(rows, MS_SCHEMA)


MS_SCHEMA = ("t int, bl int, ant1 int, ant2 int, chan int, cc int, fc int, "
             "xx_re float, xx_im float, xy_re float, xy_im float, "
             "yx_re float, yx_im float, yy_re float, yy_im float, "
             "weight float, flag boolean")
