"""O1 — UVFITS sink (SURVEY.md §2.7; reference ``write_uvfits``,
src/io/mod.rs:392-467, and the marlu random-groups writer it drives).

Two layers:

1. :func:`uvfits_group_rows` — the **relational form** of the
   random-groups content: one row per (averaged time block, baseline,
   output channel) carrying the group params (u, v, w, 256-coded
   baseline, JD) plus the averaged visibilities/weights. This is the
   oracle-checked surface; per-block UVWs are the plain f32 block mean of
   the per-sample UVW diffs (the reference evaluates UVWs at averaged
   centroids via precession — equivalent up to the synthetic part-UVW
   table's granularity).
   Baseline code: 256*(ant1+1) + (ant2+1) (reference
   src/test_common.rs:195-205); JD from GPS seconds on the fixed GPS
   epoch (JD 2444244.5), leap seconds ignored like the fixtures.
2. :func:`write_uvfits` / :func:`read_uvfits` — a minimal pure-numpy
   random-groups FITS writer/reader (no astropy in this environment):
   2880-byte header blocks of 80-char cards, big-endian f32 groups of
   PCOUNT=5 params (UU, VV, WW, BASELINE, DATE) + a (chan × pol ×
   [re, im, wt]) data cube. Single-writer by design — the reference's
   UVFITS append is sequential too (SURVEY.md §3.4); rows stream through
   ``toLocalIterator`` in (t, bl) order so driver memory stays O(row).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from birli_spark.functions.complex import POLS, VIS_COLS, f32
from birli_spark.operators import averaging

GPS_EPOCH_JD = 2444244.5  # 1980-01-06, JD of GPS second 0


def _group_param_exprs(gps_start: float, int_time_s: float,
                       avg_time: int) -> dict[str, str]:
    # CAST every float literal to DOUBLE: DuckDB parses bare decimal
    # literals as DECIMAL and its fixed-point arithmetic would diverge
    # from Spark's double math in the last ulp.
    def d(x: float) -> str:
        return f"CAST({x!r} AS DOUBLE)"

    centroid_gps = (f"({d(gps_start)} + (t_out * {avg_time}) * {d(int_time_s)}"
                    f" + {d(avg_time * int_time_s / 2.0)})")
    return {
        "bl_code": "CAST(256 * (ant1 + 1) + (ant2 + 1) AS INT)",
        "jd": f"({d(GPS_EPOCH_JD)} + {centroid_gps} / {d(86400.0)})",
    }


def uvfits_group_rows(baked: DataFrame, avg_time: int, avg_freq: int,
                      gps_start: float, int_time_s: float) -> DataFrame:
    """Averaged output + UVFITS group params, from the pre-averaging
    pipeline state (pipeline.preprocess_baked — must still carry the
    u/v/w columns of the geometry stage)."""
    avg = averaging.average_time_freq(baked, avg_time, avg_freq,
                                      extra_mean_cols=("u", "v", "w"))
    exprs = _group_param_exprs(gps_start, int_time_s, avg_time)
    return avg.select(
        "t_out", "chan_out", "bl", "ant1", "ant2",
        F.expr(exprs["bl_code"]).alias("bl_code"),
        F.expr(exprs["jd"]).alias("jd"),
        "u", "v", "w", *VIS_COLS, "weight", "flag", "n_samples")


def uvfits_rows_oracle_select(baked: str, avg_time: int, avg_freq: int,
                              gps_start: float, int_time_s: float) -> str:
    avg = averaging.averaging_oracle_select(baked, avg_time, avg_freq,
                                            extra_mean_cols=("u", "v", "w"))
    exprs = _group_param_exprs(gps_start, int_time_s, avg_time)
    vis_cols = ", ".join(VIS_COLS)
    return (
        f"SELECT t_out, chan_out, bl, ant1, ant2, "
        f"{exprs['bl_code']} AS bl_code, {exprs['jd']} AS jd, "
        f"u, v, w, {vis_cols}, weight, flag, n_samples FROM ({avg})")


# ------------------------------------------------- minimal FITS writer ---
# (shared primitives in sources/fitscore.py)

from birli_spark.sources import fitscore as _fc  # noqa: E402

_BLOCK = _fc.BLOCK
_card = _fc.card
_pad = _fc.pad_block
PTYPES = ("UU", "VV", "WW", "BASELINE", "DATE")


def write_uvfits(path: str, groups, n_chan: int, n_groups: int,
                 object_name: str = "synthetic",
                 jd_zero: float = GPS_EPOCH_JD) -> None:
    """Write random-groups UVFITS. ``groups`` iterates
    (u, v, w, bl_code, jd, data) with data shaped (n_chan, 4, 3) float —
    e.g. from a DataFrame's ordered ``toLocalIterator``.

    ``jd_zero`` becomes PZERO for the DATE param: a raw-f32 JD near
    2.4e6 has ~0.25-day (6-hour) spacing, which would collapse every
    timestep of a typical observation onto one or two values — storing
    ``jd − jd_zero`` keeps second-level time resolution (the standard
    random-groups convention; readers add PZERO back). Note: the
    f32 ulp of ``jd − jd_zero`` grows with the offset — anchor
    jd_zero near the observation (:func:`obs_jd_zero`) for real
    epochs; the module default is the synthetic surface's oracle
    convention."""
    with open(path, "wb") as f:
        # ONE header builder for both writers (byte-identity between
        # the sequential and distributed paths is a tested contract)
        f.write(uvfits_header_bytes(n_chan, n_groups, object_name,
                                    jd_zero))
        n = 0
        for u, v, w, bl_code, jd, data in groups:
            rec = np.empty(5 + n_chan * 4 * 3, dtype=">f4")
            rec[:5] = (u, v, w, float(bl_code), jd - jd_zero)
            rec[5:] = np.asarray(data, dtype=np.float64).reshape(-1)
            f.write(rec.tobytes())
            n += 1
        if n != n_groups:
            raise ValueError(f"wrote {n} groups, declared {n_groups}")
        written = n * (5 + n_chan * 4 * 3) * 4
        if written % _BLOCK:
            f.write(b"\x00" * (_BLOCK - written % _BLOCK))


def read_uvfits(path: str) -> tuple[dict, np.ndarray, np.ndarray]:
    """Minimal reader for round-trip tests → (header, params (G, 5),
    data (G, n_chan, 4, 3))."""
    with open(path, "rb") as f:
        raw = f.read()
    # the shared FITS card parser (handles E-notation values, quoted
    # strings containing '/', CONTINUE cards) — not a local re-parse
    header, off = _fc.parse_header(raw, 0)
    n_chan = int(header["NAXIS4"])
    g = int(header["GCOUNT"])
    per = 5 + n_chan * 4 * 3
    arr = np.frombuffer(raw, dtype=">f4", count=g * per,
                        offset=off).reshape(g, per)
    params = arr[:, :5].astype(np.float64)
    # apply PZERO (random-groups convention): true value = stored + zero
    for i in range(5):
        params[:, i] += float(header.get(f"PZERO{i + 1}", 0.0))
    return header, params, (
        arr[:, 5:].reshape(g, n_chan, 4, 3).astype(np.float64))


def f32_expr(e: str) -> str:  # re-export for sink callers
    return f32(e)


#: pol order in the UVFITS data cube (reference/marlu write XX YY XY YX)
UVFITS_POLS = ("xx", "yy", "xy", "yx")
assert set(UVFITS_POLS) == set(POLS)


# ------------------------------------------- distributed writer ---

def uvfits_header_bytes(n_chan: int, n_groups: int,
                        object_name: str = "synthetic",
                        jd_zero: float = GPS_EPOCH_JD) -> bytes:
    """The (padded) random-groups header block :func:`write_uvfits`
    emits — shared by the sequential and distributed writers."""
    cards = [
        _card("SIMPLE", True, "conforms to FITS standard"),
        _card("BITPIX", -32, "IEEE float32"),
        _card("NAXIS", 6),
        _card("NAXIS1", 0, "random groups"),
        _card("NAXIS2", 3, "re, im, weight"),
        _card("NAXIS3", 4, "pols: XX YY XY YX"),
        _card("NAXIS4", n_chan, "fine channels"),
        _card("NAXIS5", 1), _card("NAXIS6", 1),
        _card("GROUPS", True), _card("PCOUNT", len(PTYPES)),
        _card("GCOUNT", n_groups),
        _card("OBJECT", object_name),
    ]
    for i, pt in enumerate(PTYPES):
        cards.append(_card(f"PTYPE{i + 1}", pt))
        cards.append(_card(f"PSCAL{i + 1}", 1.0))
        cards.append(_card(f"PZERO{i + 1}",
                           jd_zero if pt == "DATE" else 0.0))
    cards.append(f"{'END':<80}".encode("ascii"))
    return _pad(b"".join(cards))


def write_uvfits_distributed(rows: DataFrame, path: str, n_chan: int,
                             object_name: str = "synthetic",
                             jd_zero: float = GPS_EPOCH_JD) -> DataFrame:
    """Executor-parallel random-groups writer: group records are FIXED
    SIZE, so every (t_out, bl) group's byte offset is computable from
    its dense grid index and each task ``pwrite``s its own disjoint
    slice of the shared pre-sized file — write bandwidth scales with
    executors (the mwaf sink's distributed pattern, sinks/mwaf.py:200,
    applied to the single-file format). Requires a COMPLETE
    (t_out × bl) group grid (the averaged pipeline output is one);
    validated against GCOUNT. Byte-identical to :func:`write_uvfits`
    (tests/test_sources_sinks.py).

    ``rows`` is :func:`uvfits_group_rows` output. The write action runs
    INSIDE this call and the written groups are validated against the
    declared GCOUNT (a missing (t_out, bl) group would otherwise ship
    as a silent all-zero record) — DISTRIBUTEDLY: a per-t_out
    aggregation proves every t_out wrote exactly its contiguous
    [t_rank*n_bl, t_rank*n_bl + n_bl) gidx range, so only the t_out-dim
    summary ever reaches the driver (never the t_out x bl manifest).
    The returned summary DataFrame (one row per t_out: n_groups +
    gidx bounds) is already materialized — further actions on it are
    free and never re-run the write tasks."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    t_dim = sorted(r[0] for r in rows.select("t_out").distinct().collect())
    bl_dim = sorted(r[0] for r in rows.select("bl").distinct().collect())
    chan_dim = sorted(
        r[0] for r in rows.select("chan_out").distinct().collect())
    if len(chan_dim) != n_chan:
        raise ValueError(
            f"{len(chan_dim)} distinct chan_out vs n_chan={n_chan}")
    n_groups = len(t_dim) * len(bl_dim)
    rec_floats = 5 + n_chan * 4 * 3
    rec_size = rec_floats * 4
    header = uvfits_header_bytes(n_chan, n_groups, object_name, jd_zero)
    total = len(header) + n_groups * rec_size
    if total % _BLOCK:
        total += _BLOCK - total % _BLOCK
    with open(path, "wb") as f:
        f.write(header)
        f.truncate(total)
    t_rank = {v: i for i, v in enumerate(t_dim)}
    bl_rank = {v: i for i, v in enumerate(bl_dim)}
    spark = rows.sparkSession
    t_rank_b = spark.sparkContext.broadcast(t_rank)
    bl_rank_b = spark.sparkContext.broadcast(bl_rank)
    n_bl = len(bl_dim)
    header_len = len(header)

    chan_pos = {v: i for i, v in enumerate(chan_dim)}
    val_cols = [f"{pol}_{c}" for pol in UVFITS_POLS for c in ("re", "im")]

    def write_partition(batches):
        """One task = one file handle + a stream of sorted Arrow
        batches holding whole (t_out, bl) group runs (hash-partitioned
        on the keys, sorted within the partition), buffered across
        batch boundaries so a group split over two batches writes
        once. Replaces the per-GROUP applyInPandas writer, whose
        os.open + pandas reindex PER GROUP dominated the scale-e2e
        write stage (462k groups at the 1090008640 shape).

        Semantics identical to the old per-group path: absent output
        channels become zero-weight cells; PRESENT cells keep their
        values verbatim — including NaN data (NaN-solution channels of
        --apply-di-cal), which the reference writes as NaN with a
        negated weight, like the MS sink."""
        cpos = chan_pos
        fd = os.open(path, os.O_WRONLY)
        pend: pd.DataFrame | None = None
        try:
            def flush(pdf: pd.DataFrame, out: list) -> None:
                t_out = int(pdf["t_out"].iloc[0])
                bl = int(pdf["bl"].iloc[0])
                gidx = t_rank_b.value[t_out] * n_bl + bl_rank_b.value[bl]
                pos = np.array([cpos[int(c)] for c in pdf["chan_out"]],
                               dtype=np.int64)
                rec = np.empty(rec_floats, dtype=">f4")
                rec[:5] = (pdf["u"].iloc[0], pdf["v"].iloc[0],
                           pdf["w"].iloc[0], float(pdf["bl_code"].iloc[0]),
                           pdf["jd"].iloc[0] - jd_zero)
                data = np.zeros((n_chan, 4, 3), dtype=np.float64)
                for p, pol in enumerate(UVFITS_POLS):
                    data[pos, p, 0] = pdf[f"{pol}_re"].to_numpy()
                    data[pos, p, 1] = pdf[f"{pol}_im"].to_numpy()
                    data[pos, p, 2] = pdf["weight"].to_numpy()
                rec[5:] = data.reshape(-1)
                os.pwrite(fd, rec.tobytes(), header_len + gidx * rec_size)
                out.append((gidx, t_out, bl))

            for pdf in batches:
                if pend is not None:
                    pdf = pd.concat([pend, pdf], ignore_index=True)
                    pend = None
                if not len(pdf):
                    continue
                key = (pdf["t_out"].to_numpy().astype(np.int64) << 32 |
                       pdf["bl"].to_numpy().astype(np.int64))
                bounds = np.flatnonzero(np.diff(key)) + 1
                starts = np.concatenate(([0], bounds))
                ends = np.concatenate((bounds, [len(pdf)]))
                out: list = []
                # the last run may continue into the next batch
                for s, e in zip(starts[:-1], ends[:-1]):
                    flush(pdf.iloc[s:e], out)
                pend = pdf.iloc[starts[-1]:].copy()
                if out:
                    yield pd.DataFrame(out, columns=["gidx", "t_out",
                                                     "bl"])
            if pend is not None and len(pend):
                out = []
                flush(pend, out)
                yield pd.DataFrame(out, columns=["gidx", "t_out", "bl"])
        finally:
            os.close(fd)

    n_part = max(rows.sparkSession.sparkContext.defaultParallelism,
                 rows.rdd.getNumPartitions())
    ordered = (rows.select("t_out", "bl", "chan_out", "u", "v", "w",
                           "bl_code", "jd", "weight", *val_cols)
               .repartition(n_part, "t_out", "bl")
               .sortWithinPartitions("t_out", "bl", "chan_out"))

    # one action: the write tasks run under a per-t_out reduction, so
    # the driver sees len(t_dim) summary rows, not t_out x bl manifest
    # rows (the 100 TB catalogue shape)
    summary = (ordered.mapInPandas(
        write_partition, schema="gidx long, t_out int, bl int")
        .groupBy("t_out")
        .agg(F.count("*").alias("n_groups"),
             F.count_distinct("gidx").alias("n_distinct"),
             F.min("gidx").alias("g_lo"),
             F.max("gidx").alias("g_hi"))
        .collect())
    written = sum(r["n_groups"] for r in summary)
    if written != n_groups:
        raise ValueError(
            f"uvfits grid incomplete: wrote {written} groups, "
            f"declared GCOUNT {n_groups} ({len(t_dim)} t_out x "
            f"{n_bl} bl) — never hand external FITS readers a file "
            "whose declared GCOUNT includes never-written groups")
    for r in summary:
        lo = t_rank[r["t_out"]] * n_bl
        if (r["n_groups"] != n_bl or r["n_distinct"] != n_bl
                or r["g_lo"] != lo or r["g_hi"] != lo + n_bl - 1):
            raise ValueError(
                f"t_out {r['t_out']}: wrote {r['n_groups']} groups "
                f"({r['n_distinct']} distinct gidx, range "
                f"[{r['g_lo']}, {r['g_hi']}]), expected the contiguous "
                f"{n_bl}-group range [{lo}, {lo + n_bl - 1}]")
    return spark.createDataFrame(
        summary, schema="t_out int, n_groups long, n_distinct long, "
                        "g_lo long, g_hi long")


def write_uvfits_catalogue(rows: DataFrame, out_dir: str, n_chan: int,
                           gps_start: float, stride_s: float,
                           blocks_per_obs: int) -> dict[int, str]:
    """MO4 — one random-groups UVFITS file PER OBSERVATION, written in
    one distributed job: the catalogue's (obs, block, bl) group grid is
    uniform, so every group's byte offset inside ITS OBS'S file is
    computable (the :func:`write_uvfits_distributed` fixed-record
    argument, fanned out across files). Each file's DATE PZERO anchors
    at its own obs start (:func:`obs_jd_zero`), keeping per-timestep f32
    resolution for every obs in the catalogue. Returns
    {obs_id: path}; the write happens on the executors (one task per
    (t_out, bl) group, ~n_obs x blocks x baselines tasks).

    ``rows`` is the mo_uvfits_rows relation (operators/multiobs.py):
    obs_id, global t_out, bl/chan_out grid, group params, pol values."""
    import os

    import pandas as pd

    rows = rows.localCheckpoint(eager=True)
    obs_dim = sorted(r[0] for r in rows.select("obs_id").distinct().collect())
    t_dim = sorted(r[0] for r in rows.select("t_out").distinct().collect())
    bl_dim = sorted(r[0] for r in rows.select("bl").distinct().collect())
    chan_dim = sorted(
        r[0] for r in rows.select("chan_out").distinct().collect())
    if len(chan_dim) != n_chan:
        raise ValueError(
            f"{len(chan_dim)} distinct chan_out vs n_chan={n_chan}")
    if len(t_dim) != len(obs_dim) * blocks_per_obs:
        raise ValueError("ragged catalogue grid: "
                         f"{len(t_dim)} blocks != {len(obs_dim)} obs"
                         f" x {blocks_per_obs}")
    # write_group recovers obs as t_out // blocks_per_obs — valid only
    # for dense 0..N-1 obs ids with obs-major dense global block indices.
    # Validate up front rather than KeyError (or wrong-file pwrite) later.
    if obs_dim != list(range(len(obs_dim))):
        raise ValueError(f"obs ids must be dense 0..N-1, got {obs_dim[:8]}…")
    if t_dim != list(range(len(t_dim))):
        raise ValueError("t_out must be obs-major dense 0..N*blocks-1, "
                         f"got {t_dim[:8]}…")
    n_bl = len(bl_dim)
    rec_floats = 5 + n_chan * 4 * 3
    rec_size = rec_floats * 4
    n_groups = blocks_per_obs * n_bl
    os.makedirs(out_dir, exist_ok=True)
    paths: dict[int, str] = {}
    jd_zeros: dict[int, float] = {}
    for o in obs_dim:
        jd_zeros[o] = obs_jd_zero(gps_start + o * stride_s)
        paths[o] = os.path.join(out_dir, f"obs_{o}.uvfits")
        header = uvfits_header_bytes(n_chan, n_groups,
                                     object_name=f"obs_{o}",
                                     jd_zero=jd_zeros[o])
        total = len(header) + n_groups * rec_size
        if total % _BLOCK:
            total += _BLOCK - total % _BLOCK
        with open(paths[o], "wb") as f:
            f.write(header)
            f.truncate(total)
        header_len = len(header)  # identical across obs (same card set)

    spark = rows.sparkSession
    bl_rank_b = spark.sparkContext.broadcast(
        {v: i for i, v in enumerate(bl_dim)})
    paths_b = spark.sparkContext.broadcast(paths)
    jz_b = spark.sparkContext.broadcast(jd_zeros)

    chan_pos = {v: i for i, v in enumerate(chan_dim)}
    val_cols = [f"{pol}_{c}" for pol in UVFITS_POLS for c in ("re", "im")]

    def write_partition(batches):
        """Partition-streaming writer (the single-file writer's round-7
        shape): one task holds ONE open fd per obs it touches and
        streams sorted (t_out, bl) group runs, buffering the last run
        across Arrow batch boundaries. Absent cells -> zero-weight
        fill; present NaN stays NaN (see the single-obs writer)."""
        fds: dict[int, int] = {}
        pend: pd.DataFrame | None = None
        try:
            def flush(pdf: pd.DataFrame, out: list) -> None:
                t_out = int(pdf["t_out"].iloc[0])
                bl = int(pdf["bl"].iloc[0])
                obs = t_out // blocks_per_obs
                gidx = (t_out - obs * blocks_per_obs) * n_bl \
                    + bl_rank_b.value[bl]
                pos = np.array([chan_pos[int(c)]
                                for c in pdf["chan_out"]], dtype=np.int64)
                rec = np.empty(rec_floats, dtype=">f4")
                rec[:5] = (pdf["u"].iloc[0], pdf["v"].iloc[0],
                           pdf["w"].iloc[0],
                           float(pdf["bl_code"].iloc[0]),
                           pdf["jd"].iloc[0] - jz_b.value[obs])
                data = np.zeros((n_chan, 4, 3), dtype=np.float64)
                for p, pol in enumerate(UVFITS_POLS):
                    data[pos, p, 0] = pdf[f"{pol}_re"].to_numpy()
                    data[pos, p, 1] = pdf[f"{pol}_im"].to_numpy()
                    data[pos, p, 2] = pdf["weight"].to_numpy()
                rec[5:] = data.reshape(-1)
                if obs not in fds:
                    fds[obs] = os.open(paths_b.value[obs], os.O_WRONLY)
                os.pwrite(fds[obs], rec.tobytes(),
                          header_len + gidx * rec_size)
                out.append((obs, gidx))

            for pdf in batches:
                if pend is not None:
                    pdf = pd.concat([pend, pdf], ignore_index=True)
                    pend = None
                if not len(pdf):
                    continue
                key = (pdf["t_out"].to_numpy().astype(np.int64) << 32 |
                       pdf["bl"].to_numpy().astype(np.int64))
                bounds = np.flatnonzero(np.diff(key)) + 1
                starts = np.concatenate(([0], bounds))
                ends = np.concatenate((bounds, [len(pdf)]))
                out: list = []
                for s, e in zip(starts[:-1], ends[:-1]):
                    flush(pdf.iloc[s:e], out)
                pend = pdf.iloc[starts[-1]:].copy()
                if out:
                    yield pd.DataFrame(out, columns=["obs_id", "gidx"])
            if pend is not None and len(pend):
                out = []
                flush(pend, out)
                yield pd.DataFrame(out, columns=["obs_id", "gidx"])
        finally:
            for fd in fds.values():
                os.close(fd)

    n_part = max(spark.sparkContext.defaultParallelism,
                 rows.rdd.getNumPartitions())
    ordered = (rows.select("t_out", "bl", "chan_out", "u", "v", "w",
                           "bl_code", "jd", "weight", *val_cols)
               .repartition(n_part, "t_out", "bl")
               .sortWithinPartitions("t_out", "bl", "chan_out"))

    # per-obs distributed validation: n_obs summary rows to the driver,
    # never the obs x blocks x bl manifest
    per_obs = (ordered.mapInPandas(
                   write_partition, schema="obs_id int, gidx long")
               .groupBy("obs_id")
               .agg(F.count("*").alias("n"),
                    F.count_distinct("gidx").alias("n_distinct"),
                    F.min("gidx").alias("g_lo"),
                    F.max("gidx").alias("g_hi"))
               .collect())
    got = {r["obs_id"]: r for r in per_obs}
    for o in obs_dim:
        r = got.get(o)
        if (r is None or r["n"] != n_groups or r["n_distinct"] != n_groups
                or r["g_lo"] != 0 or r["g_hi"] != n_groups - 1):
            raise ValueError(
                f"obs {o}: wrote {0 if r is None else r['n']} groups "
                f"({0 if r is None else r['n_distinct']} distinct), "
                f"planned the full [0, {n_groups - 1}] gidx range")
    return paths


def obs_jd_zero(gps_start: float) -> float:
    """PZERO for the DATE group param: the half-integral JD (the FITS
    convention's noon boundary) at or just before the observation start.
    Anchoring PZERO at the OBS — not the 1980 GPS epoch — keeps the
    f32-stored day offset < 1, i.e. ~4 ms resolution instead of the
    ~84 s ulp a 14500-day offset has: without this every few-second
    timestep of a real observation collapses onto one stored DATE."""
    import math

    return math.floor(GPS_EPOCH_JD + gps_start / 86400.0 - 0.5) + 0.5


def uvfits_file_rows(spark, rows: DataFrame, path: str,
                     jd_zero: float = GPS_EPOCH_JD) -> DataFrame:
    """O1b — the hash gate over the PHYSICAL file: write the random-
    groups file via the executor-parallel writer, read the BYTES back
    (:func:`read_uvfits`), and re-emit one row per (group, channel)
    with every value exactly as the file stores it (f32). Pairs with
    :func:`uvfits_file_oracle_select`, whose f32 demotions mirror the
    FITS encode/decode — so a hash match certifies the file content,
    not just the pre-sink relation.

    The read-back is driver-side over the AVERAGED output (groups x
    chans, orders of magnitude below the fact scan); the write itself
    is executor-parallel."""
    # materialize the averaged relation ONCE: the dim probes below plus
    # write_uvfits_distributed's own three distinct collects and the
    # write action would otherwise each re-run the whole upstream
    # pipeline (5 executions of the fact plan for one file)
    rows = rows.localCheckpoint(eager=True)
    n_chan = rows.select("chan_out").distinct().count()
    write_uvfits_distributed(rows, path, n_chan, jd_zero=jd_zero).count()
    return spark.createDataFrame(
        file_cells_frame(path, n_chan).reset_index(drop=True))


def cells_frame_from_arrays(params: np.ndarray, data: np.ndarray,
                            n_chan: int):
    """The ONE row convention for every UVFITS read-back surface —
    (PZERO-applied) group params + data cube -> one pandas row per
    (group, channel), padding dropped: groups never written keep the
    pre-sized zeros (bl_code 0 — real codes are >= 257), and channels
    reindex-filled inside a group carry weight exactly 0 (a real baked
    cell is +/-|weight_factor| != 0). Shared by the driver byte gates
    (:func:`file_cells_frame`) and the distributed DataSource
    (sources/uvfits_source.py) so a convention change lands everywhere
    at once."""
    import pandas as pd

    g = params.shape[0]
    rec = {
        "bl_code": np.repeat(params[:, 3].astype(np.int32), n_chan),
        "jd": np.repeat(params[:, 4], n_chan),
        "chan_out": np.tile(np.arange(n_chan, dtype=np.int32), g),
        "u": np.repeat(params[:, 0], n_chan),
        "v": np.repeat(params[:, 1], n_chan),
        "w": np.repeat(params[:, 2], n_chan),
    }
    for p, pol in enumerate(UVFITS_POLS):
        rec[f"{pol}_re"] = data[:, :, p, 0].reshape(-1)
        rec[f"{pol}_im"] = data[:, :, p, 1].reshape(-1)
    rec["weight"] = data[:, :, 0, 2].reshape(-1)
    pdf = pd.DataFrame(rec)
    pdf["flag"] = pdf["weight"] < 0
    return pdf[(pdf["bl_code"] > 0) & (pdf["weight"] != 0.0)]


def file_cells_frame(path: str, n_chan: int):
    """Driver-side byte-gate read-back (o1b single file, mo4 per-obs
    fan-out): read the whole file, then the shared row convention."""
    _, params, data = read_uvfits(path)
    return cells_frame_from_arrays(params, data, n_chan)


def uvfits_file_oracle_select(baked: str, avg_time: int, avg_freq: int,
                              gps_start: float, int_time_s: float,
                              jd_zero: float = GPS_EPOCH_JD) -> str:
    """DuckDB twin of :func:`uvfits_file_rows`: the o1 row relation with
    every file-stored value pushed through the same f32 round trip the
    FITS encoding applies (params and data are BITPIX -32; DATE is
    stored relative to PZERO then re-offset by the reader)."""
    from birli_spark.functions.complex import f32

    avg = averaging.averaging_oracle_select(baked, avg_time, avg_freq,
                                            extra_mean_cols=("u", "v", "w"))
    exprs = _group_param_exprs(gps_start, int_time_s, avg_time)
    jz = f"CAST({jd_zero!r} AS DOUBLE)"
    jd_rel = f32(f"({exprs['jd']}) - {jz}")
    vis = ", ".join(
        f"{f32(f'{pol}_{c}')} AS {pol}_{c}"
        for pol in UVFITS_POLS for c in ("re", "im"))
    return (
        f"SELECT CAST({exprs['bl_code']} AS INT) AS bl_code,"
        f" ({jz} + {jd_rel}) AS jd,"
        f" CAST(chan_out AS INT) AS chan_out,"
        f" {f32('u')} AS u, {f32('v')} AS v, {f32('w')} AS w,"
        f" {vis}, {f32('weight')} AS weight,"
        f" {f32('weight')} < 0E0 AS flag FROM ({avg})"
        # mirror the gate's padding drop: a stored weight of exactly 0
        # is indistinguishable from reindex fill, so both sides drop it
        f" WHERE {f32('weight')} <> 0E0")
