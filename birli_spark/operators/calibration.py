"""C6 — apply direction-independent calibration solutions — and C7, the
DI gain SOLVER (SURVEY.md §2.4; reference apply_di_calsol,
src/calibration.rs:41-131).

C6 (apply): per baseline & channel ``V' = J_ant1 · V · J_ant2^H`` — a 2x2
complex matrix sandwich in f64, demoted to f32. Calsol channels are
upsampled by an integer ratio: each solution channel covers
``vis_chans / sol_chans`` fine channels (src/calibration.rs:76-82). If the
result contains NaN, the cell is flagged and a positive weight negated
(src/calibration.rs:117-124).

Spark shape: two broadcast joins on (ant, chan div ratio) + one fused
projection of the 8 sandwich expressions.

C7 (solve, beyond-reference): recover the per-antenna diagonal gains
``g = (g_x, g_y)`` from (model, data) visibility pairs such that
``D_pq ≈ diag(g_p) · M_pq · diag(g_q)^H`` — the alternating-direction
least-squares iteration of StEFCal (Salvini & Wijnholds 2014, A&A 571
A97), with the four instrumental polarisations coupling the X and Y
chains (d_xy = g_px · m_xy · g_qy^*). This is the solve the reference
delegates to upstream tools (its `--apply-di-cal` consumes an MWAOCAL
file produced by Andre Offringa's `calibrate`); implementing it makes
the engine closed over the calibration loop — and lets the test suite
recover the very solutions cotter applied in the reference's own
``norfi.cal`` golden dumps (tests/test_cli_golden_cal.py).

Spark shape: each fine channel is an INDEPENDENT solve, so the operator
is one ``groupBy(chan-block).applyInPandas`` — the classic 100 TB
pattern: the fact is first reduced relationally (time-mean per
(chan, ant1, ant2) — map-side partial aggregation), leaving at most
``n_baselines × n_chans`` rows (≈25 M for a full 128-tile, 3072-channel
MWA band — bounded by telescope geometry, NOT by data volume), then one
shuffle lands whole channels in Arrow batches where the vectorised
numpy iteration runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


# ------------------------------------------------------------------ C7 ---

#: model/data column pairs the solver consumes: m_xx_re … d_yy_im
POLS = ("xx", "xy", "yx", "yy")
SOLVE_IN_COLS = [f"{side}_{p}_{c}"
                 for side in ("m", "d") for p in POLS for c in ("re", "im")]
SOLVE_OUT_SCHEMA = ("chan INT, ant INT, gx_re DOUBLE, gx_im DOUBLE, "
                    "gy_re DOUBLE, gy_im DOUBLE, n_eq BIGINT, "
                    "rel_residual DOUBLE")


def _solve_channels(chans, a1, a2, M, D, n_ant, iters, tol):
    """Vectorised StEFCal over a block of channels at once.

    ``chans``: [R] channel index 0..C-1 per row; ``a1``/``a2``: [R]
    antenna indices; ``M``/``D``: [R, 4] complex (pol order xx,xy,yx,yy).
    Returns (gx, gy) [C, n_ant] complex (NaN where unconstrained),
    n_eq [C, n_ant], rel_residual [C].

    Per antenna/pol update (fixing all others): every finite cell gives
    one linear equation ``a · g = b`` —
      row as ant1:  d_xx = g_ax (m_xx g_qx^*);  d_xy = g_ax (m_xy g_qy^*)
      row as ant2 (conjugated): d_xx^* = g_ax (m_xx^* g_px^*);
                                d_yx^* = g_ax (m_yx^* g_py^*)
    so ``g_ax = Σ conj(a)·b / Σ |a|²`` accumulated per (chan, ant) —
    the closed-form LS step of StEFCal eq. (14), with the even-iteration
    averaging of Salvini & Wijnholds §3.1 for mesh convergence.
    """
    C = int(chans.max()) + 1 if len(chans) else 0
    # per-pol validity: a NaN data pol only invalidates its own equation
    vpol = np.isfinite(D) & np.isfinite(M)
    gx = np.ones((C, n_ant), dtype=complex)
    gy = np.ones((C, n_ant), dtype=complex)
    i1 = chans * n_ant + a1          # flat (chan, ant1) index
    i2 = chans * n_ant + a2
    n_eq = np.zeros(C * n_ant, dtype=np.int64)
    np.add.at(n_eq, i1, vpol.sum(axis=-1))
    np.add.at(n_eq, i2, vpol.sum(axis=-1))
    # per-chain counts: which pols constrain g_ax / g_ay in each role
    eq_x = np.zeros(C * n_ant, dtype=np.int64)
    eq_y = np.zeros(C * n_ant, dtype=np.int64)
    np.add.at(eq_x, i1, vpol[:, 0] + vpol[:, 1])   # xx, xy as ant1
    np.add.at(eq_x, i2, vpol[:, 0] + vpol[:, 2])   # xx, yx as ant2
    np.add.at(eq_y, i1, vpol[:, 2] + vpol[:, 3])   # yx, yy as ant1
    np.add.at(eq_y, i2, vpol[:, 1] + vpol[:, 3])   # xy, yy as ant2

    size = C * n_ant

    def _accc(idx, vals):
        # dense scatter-add; bincount is ~10-30x faster than np.add.at
        return (np.bincount(idx, weights=vals.real, minlength=size)
                + 1j * np.bincount(idx, weights=vals.imag,
                                   minlength=size))

    def _accr(idx, vals):
        return np.bincount(idx, weights=vals, minlength=size)

    def _sweep(gx, gy):
        g1x, g2x = gx.reshape(-1)[i1], gx.reshape(-1)[i2]
        g1y, g2y = gy.reshape(-1)[i1], gy.reshape(-1)[i2]
        num_x = np.zeros(size, dtype=complex)
        den_x = np.zeros(size, dtype=np.float64)
        num_y = np.zeros(size, dtype=complex)
        den_y = np.zeros(size, dtype=np.float64)
        # as ant1: xx/xy constrain g_1x; yx/yy constrain g_1y
        for pi, (num, den, g2) in ((0, (num_x, den_x, g2x)),
                                   (1, (num_x, den_x, g2y)),
                                   (2, (num_y, den_y, g2x)),
                                   (3, (num_y, den_y, g2y))):
            a = M[:, pi] * np.conj(g2)
            w = vpol[:, pi]
            num += _accc(i1, np.where(w, np.conj(a) * D[:, pi], 0))
            den += _accr(i1, np.where(w, np.abs(a) ** 2, 0.0))
        # as ant2 (conjugate the equation): xx/yx constrain g_2x;
        # xy/yy constrain g_2y
        for pi, (num, den, g1) in ((0, (num_x, den_x, g1x)),
                                   (2, (num_x, den_x, g1y)),
                                   (1, (num_y, den_y, g1x)),
                                   (3, (num_y, den_y, g1y))):
            a = np.conj(M[:, pi]) * np.conj(g1)
            w = vpol[:, pi]
            num += _accc(i2, np.where(w, np.conj(a) * np.conj(D[:, pi]), 0))
            den += _accr(i2, np.where(w, np.abs(a) ** 2, 0.0))
        with np.errstate(invalid="ignore", divide="ignore"):
            nx = np.where(den_x > 0, num_x / np.where(den_x > 0, den_x, 1),
                          gx.reshape(-1))
            ny = np.where(den_y > 0, num_y / np.where(den_y > 0, den_y, 1),
                          gy.reshape(-1))
        return (nx.reshape(C, n_ant), ny.reshape(C, n_ant),
                den_x, den_y)

    den_x = den_y = np.zeros(size)
    for it in range(iters):
        nx, ny, den_x, den_y = _sweep(gx, gy)
        if it % 2 == 1:
            # even-iteration averaging (StEFCal §3.1) stabilises meshes
            nx = 0.5 * (nx + gx)
            ny = 0.5 * (ny + gy)
        dmax = max(
            float(np.nanmax(np.abs(nx - gx) / np.maximum(np.abs(nx), 1e-30)))
            if nx.size else 0.0,
            float(np.nanmax(np.abs(ny - gy) / np.maximum(np.abs(ny), 1e-30)))
            if ny.size else 0.0)
        gx, gy = nx, ny
        if dmax < tol:
            break
    # unconstrained chains -> NaN: no finite equation touches the gain
    # (e.g. the NaN-Y-gain channels of the reference's norfi.cal dump),
    # OR every touching equation has zero coefficient amplitude (the
    # last sweep's LS denominator stayed 0 — the update never moved off
    # the 1.0 init, so reporting it as solved would be a silent lie)
    ok_x = (eq_x > 0) & (den_x > 0)
    ok_y = (eq_y > 0) & (den_y > 0)
    gx = np.where(ok_x.reshape(C, n_ant), gx, np.nan + 0j)
    gy = np.where(ok_y.reshape(C, n_ant), gy, np.nan + 0j)
    # residual per channel over valid cells
    g1x, g2x = gx.reshape(-1)[i1], gx.reshape(-1)[i2]
    g1y, g2y = gy.reshape(-1)[i1], gy.reshape(-1)[i2]
    pred = np.stack([g1x * M[:, 0] * np.conj(g2x),
                     g1x * M[:, 1] * np.conj(g2y),
                     g1y * M[:, 2] * np.conj(g2x),
                     g1y * M[:, 3] * np.conj(g2y)], axis=-1)
    err = np.where(vpol, np.abs(pred - D), 0.0).sum(axis=-1)
    mag = np.where(vpol, np.abs(D), 0.0).sum(axis=-1)
    num_c = np.zeros(C)
    den_c = np.zeros(C)
    np.add.at(num_c, chans, err)
    np.add.at(den_c, chans, mag)
    with np.errstate(invalid="ignore", divide="ignore"):
        rel = np.where(den_c > 0, num_c / np.where(den_c > 0, den_c, 1),
                       np.nan)
    return gx, gy, n_eq.reshape(C, n_ant), rel


def solve_di_gains(pairs: DataFrame, *, n_ant: int,
                   iters: int = 200, tol: float = 1e-14,
                   group_chans: int = 32,
                   normalize_ref: int | None = None) -> DataFrame:
    """C7 — solve per-(antenna, fine channel) diagonal gains from
    (model, data) pairs.

    ``pairs`` columns: ``chan, ant1, ant2`` + :data:`SOLVE_IN_COLS`
    (cross pairs only; pass each undirected baseline once). Repeated
    (ant1, ant2, chan) rows are extra least-squares equations — callers
    with a time axis should pre-reduce with a relational time-mean
    (``D̄ = G1 M̄ G2^H`` holds because the sandwich is linear in the
    visibilities), which keeps the shuffled solve input bounded by
    n_baselines × n_chans regardless of observation length.

    Output: one row per (chan, ant) with the solved complex gains
    (NaN where no finite equation constrains the antenna), the equation
    count and the per-channel relative residual. The solution is
    determined up to one unit phasor per channel (the StEFCal gauge);
    ``normalize_ref=a`` divides every gain by antenna ``a``'s gain
    (hand-written naive complex division so the arithmetic matches the
    SQL oracle twin expression for expression), yielding a canonical
    form with ``g[ref] = 1``. Pick a reference antenna whose chains are
    constrained in EVERY channel: where the ref gain itself is NaN the
    division propagates NaN through the channel (there is no canonical
    form without a reference) — callers with partially-flagged ref
    tiles should normalise per-channel themselves or skip it.
    """
    its, tl, ga, nrm = int(iters), float(tol), int(group_chans), normalize_ref
    na = int(n_ant)

    def per_block(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame(
                columns=["chan", "ant", "gx_re", "gx_im", "gy_re", "gy_im",
                         "n_eq", "rel_residual"])
        chan_vals = np.sort(pdf["chan"].unique())
        cidx = {v: i for i, v in enumerate(chan_vals)}
        chans = pdf["chan"].map(cidx).to_numpy()
        a1 = pdf["ant1"].to_numpy(dtype=np.int64)
        a2 = pdf["ant2"].to_numpy(dtype=np.int64)
        M = np.empty((len(pdf), 4), dtype=complex)
        D = np.empty((len(pdf), 4), dtype=complex)
        for pi, p in enumerate(POLS):
            M[:, pi] = (pdf[f"m_{p}_re"].to_numpy(np.float64)
                        + 1j * pdf[f"m_{p}_im"].to_numpy(np.float64))
            D[:, pi] = (pdf[f"d_{p}_re"].to_numpy(np.float64)
                        + 1j * pdf[f"d_{p}_im"].to_numpy(np.float64))
        gx, gy, n_eq, rel = _solve_channels(chans, a1, a2, M, D, na, its, tl)
        out = []
        for ci, cv in enumerate(chan_vals):
            for ant in range(na):
                if n_eq[ci, ant] == 0:
                    continue
                gxr, gxi = float(gx[ci, ant].real), float(gx[ci, ant].imag)
                gyr, gyi = float(gy[ci, ant].real), float(gy[ci, ant].imag)
                if nrm is not None:
                    # naive complex division, term order fixed to match
                    # the oracle SQL: (a+bi)/(c+di) =
                    # ((a*c + b*d) + (b*c - a*d)i) / (c*c + d*d)
                    ur, ui = float(gx[ci, nrm].real), float(gx[ci, nrm].imag)
                    dn = ur * ur + ui * ui
                    gxr, gxi = ((gxr * ur + gxi * ui) / dn,
                                (gxi * ur - gxr * ui) / dn)
                    vr, vi = float(gy[ci, nrm].real), float(gy[ci, nrm].imag)
                    dm = vr * vr + vi * vi
                    gyr, gyi = ((gyr * vr + gyi * vi) / dm,
                                (gyi * vr - gyr * vi) / dm)
                out.append((int(cv), ant, gxr, gxi, gyr, gyi,
                            int(n_eq[ci, ant]), float(rel[ci])))
        return pd.DataFrame(
            out, columns=["chan", "ant", "gx_re", "gx_im", "gy_re", "gy_im",
                          "n_eq", "rel_residual"])

    blocked = pairs.withColumn(
        "_blk", F.expr(f"CAST(FLOOR(chan / {ga}) AS INT)"))
    return blocked.groupBy("_blk").applyInPandas(
        per_block, schema=SOLVE_OUT_SCHEMA)


# ----------------------------------------------- C7 driver contract ---

def synth_gain_sql(ant: str, chan: str) -> dict[str, str]:
    """Known-truth diagonal gains for the c7 driver query, as dialect-
    common SQL over an antenna and channel expression. All values are
    exact dyadic rationals (k/16, k/32) so products and the ref-division
    normalisation round identically in Spark and DuckDB — the oracle
    computes the EXPECTED gains from this closed form while the Spark
    side recovers them with the iterative solver; agreement at 1e-6
    ticks is therefore a genuine convergence gate, not a replay."""
    return {
        "gx_re": f"1.0 + CAST(({ant} * 7 + {chan} * 3) % 11 AS DOUBLE) / 16.0",
        "gx_im": f"CAST(({ant} * 5 + {chan}) % 9 - 4 AS DOUBLE) / 16.0",
        "gy_re": f"1.0 + CAST(({ant} * 3 + {chan} * 5) % 13 AS DOUBLE) / 32.0",
        "gy_im": f"CAST(({ant} * 11 + {chan} * 2) % 7 - 3 AS DOUBLE) / 16.0",
    }


def synth_pairs_select(vis: str = "vis", chan_col: str = "cc") -> str:
    """Dialect-common SELECT deriving the solver input from the vis
    relation: model = the visibility itself, data = the known-truth
    diagonal sandwich ``diag(g_a1) · M · diag(g_a2)^H`` applied row-wise,
    then mean-reduced per (chan_col, ant1, ant2) — the relational
    pre-reduction that bounds the shuffled solve input by
    n_baselines x n_chans.

    ``chan_col`` defaults to the COARSE channel: the synthetic obs has
    only 3 baselines per fine channel (a star graph, whose complex-
    amplitude gauge is free — only phase survives ref-division), while
    per coarse channel the pair graph is the full 4-antenna mesh, which
    pins amplitudes up to the phase gauge the normalisation removes."""
    exprs = [f"AVG({e}) AS {n}" for n, e in synth_pair_exprs(chan_col)]
    return (f"SELECT {chan_col} AS chan, ant1, ant2, {', '.join(exprs)}"
            f" FROM {vis} WHERE ant1 <> ant2"
            f" GROUP BY {chan_col}, ant1, ant2")


def synth_pair_exprs(chan_col: str = "cc") -> list[tuple[str, str]]:
    """The ROW-wise (name, expr) pairs behind synth_pairs_select —
    model components verbatim, data components as the known-truth
    diagonal sandwich. The streaming twin (st14) writes these per
    timestep and accumulates the sums in state instead of AVG-ing."""
    g1 = synth_gain_sql("ant1", chan_col)
    g2 = synth_gain_sql("ant2", chan_col)
    out: list[tuple[str, str]] = []
    for p in POLS:
        out.append((f"m_{p}_re", f"{p}_re"))
        out.append((f"m_{p}_im", f"{p}_im"))
    for p, (c1, c2) in (("xx", ("x", "x")), ("xy", ("x", "y")),
                        ("yx", ("y", "x")), ("yy", ("y", "y"))):
        g1r, g1i = g1[f"g{c1}_re"], g1[f"g{c1}_im"]
        g2r, g2i = g2[f"g{c2}_re"], g2[f"g{c2}_im"]
        # t = m * conj(g2); d = g1 * t
        t_re = f"({p}_re * ({g2r}) + {p}_im * ({g2i}))"
        t_im = f"({p}_im * ({g2r}) - {p}_re * ({g2i}))"
        out.append((f"d_{p}_re",
                    f"({g1r}) * {t_re} - ({g1i}) * {t_im}"))
        out.append((f"d_{p}_im",
                    f"({g1r}) * {t_im} + ({g1i}) * {t_re}"))
    return out


#: tick scale for the c7 gate: 1e-6 of gain amplitude, ~1e6 x the solver
#: convergence floor
C7_TICK = "1000000.0"


def solve_ticks_select(gains: str, ref: str) -> str:
    """Dialect-common normalise-and-tick projection over a gains
    relation (chan, ant, gx_re..gy_im) and its ref-antenna twin
    (chan, uxr, uxi, uyr, uyi): divide by the reference gain with the
    NAIVE complex-division formula (the solver mirrors it term for
    term) and round to integer ticks."""
    def div(ar, ai, br, bi):
        dn = f"({br} * {br} + {bi} * {bi})"
        return (f"({ar} * {br} + {ai} * {bi}) / {dn}",
                f"({ai} * {br} - {ar} * {bi}) / {dn}")

    xr, xi = div("g.gx_re", "g.gx_im", "r.uxr", "r.uxi")
    yr, yi = div("g.gy_re", "g.gy_im", "r.uyr", "r.uyi")
    cols = ", ".join(
        f"CAST(ROUND(({e}) * {C7_TICK}) AS BIGINT) AS {n}"
        for n, e in (("gx_re_t", xr), ("gx_im_t", xi),
                     ("gy_re_t", yr), ("gy_im_t", yi)))
    return (f"SELECT g.chan AS chan, g.ant AS ant, {cols}"
            f" FROM {gains} g JOIN {ref} r ON g.chan = r.chan")


def gain_ticks_exprs(tick: str = C7_TICK) -> list[str]:
    """The shared normalise-to-ticks projection over a solved-gains
    relation (chan, ant, gx_re..gy_im) — used by the c7/mo7/st14 driver
    queries so the tick scale lives in one place beside its SQL twin
    (:func:`solve_ticks_select`)."""
    return ["chan", "ant"] + [
        f"CAST(ROUND({g}_{c} * {tick}) AS BIGINT) AS {g}_{c}_t"
        for g in ("gx", "gy") for c in ("re", "im")]
