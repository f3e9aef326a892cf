"""C1 — Van Vleck correction (SURVEY.md §2.4; reference src/van_vleck.rs).

Undoes the 4+4-bit quantization bias of the legacy MWA correlator:

- **Autos**: per (t, chan, ant, pol) solve ``sigma = sighat^{-1}(sqrt(v/scale))``
  by Newton's method, where ``sighat(s) = sqrt(49 - sum_{k=0..6} (2k+1)
  erf((k+.5)/(s*sqrt(2))))`` (reference sighat src/van_vleck.rs:368-392,
  Newton loop :333-346, tol 1e-12, stop at guess <= 0.5).
- **Crosses**: per value solve ``kappa = F^{-1}(khat)`` where ``F(rho) =
  int_0^rho pdf`` is the quantized bivariate-normal correction integral
  evaluated with Simpson's rule on n=10 intervals over a 7x7 quantization
  grid (pdf src/van_vleck.rs:634-660, simpsons :663-685, newton
  :703-748); ``|khat| > sigma1*sigma2`` or non-convergence → passthrough
  (:248-259, :280-295).

Spark shape (SURVEY.md C1): the iterative solves are genuine UDF islands —
  1. filter unflagged autos → **sigma table** via a vectorized-numpy Newton
     in `mapInPandas` (Arrow batches, no per-row Python);
  2. join the fact table to the sigma table twice on (t, chan, ant) — the
     one fact-to-fact "self join with its auto subset"; at scale both
     sides are co-partitioned by (t, cc) so AQE plans a local join; the
     sigma table is ~n_ants/n_baselines (≈1.5%) of the fact table;
  3. one `mapInPandas` applying the auto/cross corrections to all 8 values
     per row in a single Arrow pass.

No oracle SQL — iterative; the driver records a rows-only check.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from birli_spark.functions.complex import VIS_COLS

SQRT_2 = math.sqrt(2.0)
SQRT_TAU = 2.5066282746310002  # reference src/van_vleck.rs:377
_K = np.arange(7.0) + 0.5          # quantization grid (k + 0.5), k = 0..6
_TWO_OVER_SQRT_PI = 2.0 / math.sqrt(math.pi)


# Cody's rational-Chebyshev erf/erfc coefficients (W. J. Cody, "Rational
# Chebyshev approximation for the error function", Math. Comp. 23 (1969);
# the netlib SPECFUN CALERF constants — public domain, the algorithm
# inside every libm). Double-precision accurate, fully vectorizable.
_CODY_A = np.array([3.16112374387056560e0, 1.13864154151050156e2,
                    3.77485237685302021e2, 3.20937758913846947e3,
                    1.85777706184603153e-1])
_CODY_B = np.array([2.36012909523441209e1, 2.44024637934444173e2,
                    1.28261652607737228e3, 2.84423683343917062e3])
_CODY_C = np.array([5.64188496988670089e-1, 8.88314979438837594e0,
                    6.61191906371416295e1, 2.98635138197400131e2,
                    8.81952221241769090e2, 1.71204761263407058e3,
                    2.05107837782607147e3, 1.23033935479799725e3,
                    2.15311535474403846e-8])
_CODY_D = np.array([1.57449261107098347e1, 1.17693950891312499e2,
                    5.37181101862009858e2, 1.62138957456669019e3,
                    3.29079923573345963e3, 4.36261909014324716e3,
                    3.43936767414372164e3, 1.23033935480374942e3])
_CODY_P = np.array([3.05326634961232344e-1, 3.60344899949804439e-1,
                    1.25781726111229246e-1, 1.60837851487422766e-2,
                    6.58749161529837803e-4, 1.63153871373020978e-2])
_CODY_Q = np.array([2.56852019228982242e0, 1.87295284992346047e0,
                    5.27905102951428412e-1, 6.05183413124413191e-2,
                    2.33520497626869185e-3])
_SQRPI = 5.6418958354775628695e-1  # 1/sqrt(pi)


def _erf(x: np.ndarray) -> np.ndarray:
    """Vectorized double-precision erf via Cody's rational approximations
    (no scipy in this environment). Replaces a per-element math.erf loop
    that would dominate the Newton solves at scale (~1e8 sigma solves per
    real obs). Validated against math.erf to < 1e-15 in tests."""
    x = np.asarray(x, dtype=np.float64)
    ax = np.abs(x)
    out = np.empty_like(ax)

    # |x| <= 0.46875: erf = x * P1(x^2)/Q1(x^2)
    m1 = ax <= 0.46875
    if m1.any():
        xs = x[m1]
        y = xs * xs
        num = _CODY_A[4] * y
        den = y
        for i in range(3):
            num = (num + _CODY_A[i]) * y
            den = (den + _CODY_B[i]) * y
        out[m1] = xs * (num + _CODY_A[3]) / (den + _CODY_B[3])

    # 0.46875 < |x| <= 4: erfc = exp(-x^2) * P2(|x|)/Q2(|x|)
    m2 = (~m1) & (ax <= 4.0)
    if m2.any():
        xs = ax[m2]
        num = _CODY_C[8] * xs
        den = xs
        for i in range(7):
            num = (num + _CODY_C[i]) * xs
            den = (den + _CODY_D[i]) * xs
        erfc = np.exp(-xs * xs) * (num + _CODY_C[7]) / (den + _CODY_D[7])
        out[m2] = 1.0 - erfc

    # |x| > 4: erfc = exp(-x^2)/x * (1/sqrt(pi) - y*P3(y)/Q3(y)), y = 1/x^2
    m3 = ax > 4.0
    if m3.any():
        xs = ax[m3]
        y = 1.0 / (xs * xs)
        num = _CODY_P[5] * y
        den = y
        for i in range(4):
            num = (num + _CODY_P[i]) * y
            den = (den + _CODY_Q[i]) * y
        r = y * (num + _CODY_P[4]) / (den + _CODY_Q[4])
        with np.errstate(under="ignore"):
            erfc = np.exp(-xs * xs) / xs * (_SQRPI - r)
        out[m3] = 1.0 - erfc

    return np.copysign(out, x)


# ------------------------------------------------------------ auto solve ---

def sighat(sigma: np.ndarray) -> np.ndarray:
    """sighat(s) = sqrt(49 - sum (2k+1) erf((k+.5)/(s sqrt2)))
    (src/van_vleck.rs:368-374)."""
    s = np.asarray(sigma, dtype=np.float64)
    acc = np.zeros_like(s)
    for k_ in _K:
        acc += 2.0 * k_ * _erf(k_ / (s * SQRT_2))
    return np.sqrt(49.0 - acc)


def sighat_prime(sigma: np.ndarray) -> np.ndarray:
    """d sighat / d sigma (src/van_vleck.rs:380-392)."""
    s2 = np.asarray(sigma, dtype=np.float64) ** 2
    acc = np.zeros_like(s2)
    for k_ in _K:
        k2 = k_ ** 2
        acc += 2.0 * k2 * np.exp(-k2 / (2.0 * s2)) / (SQRT_TAU * s2)
    return acc / sighat(np.sqrt(s2))


def van_vleck_autos(sighat_vals: np.ndarray) -> np.ndarray:
    """Vectorized Newton inversion of sighat; non-converged values pass
    through unchanged (src/van_vleck.rs:333-361): tol 1e-12, max 100
    iterations, stop when guess <= 0.5.

    The solve is a pure function of the sighat value, and 4+4-bit
    correlator powers live on a tiny discrete lattice — so solve each
    DISTINCT value once and scatter (bit-identical results, the sort
    costs O(M log M) against ~1000 transcendentals per Newton solve)."""
    s_in = np.asarray(sighat_vals, dtype=np.float64)
    uniq, inv = np.unique(s_in, return_inverse=True)
    if uniq.size < s_in.size:
        return van_vleck_autos(uniq)[inv]
    s = s_in
    guess = s.copy()
    with np.errstate(invalid="ignore", divide="ignore"):
        delta = sighat(guess) - s
        active = (np.abs(delta) > 1e-12) & (guess > 0.5) & np.isfinite(delta)
        for _ in range(100):
            if not active.any():
                break
            guess[active] -= delta[active] / sighat_prime(guess[active])
            delta[active] = sighat(guess[active]) - s[active]
            active &= (np.abs(delta) > 1e-12) & (guess > 0.5) & np.isfinite(delta)
    # loop exits via the while-condition → accept guess; cells still active
    # after 100 iterations did not converge → passthrough input (reference
    # van_vleck_autos map_or, src/van_vleck.rs:352-361)
    out = guess
    out[active] = s[active]
    return out


# ----------------------------------------------------------- cross solve ---

def _grids(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """rho-independent 7x7 grids per cell, computed once per solve and
    reused across every Simpson point and Newton iteration:
    ``xy = x_i * y_j`` and ``sq = (x_i^2 + y_j^2) / 2``. x/y: (M, 7)."""
    xx = x[:, :, None]                                # (M, 7, 1)
    yy = y[:, None, :]                                # (M, 1, 7)
    return xx * yy, (xx ** 2 + yy ** 2) * 0.5


def _pdf_grid(rho_grid: np.ndarray, xy: np.ndarray, sq: np.ndarray) -> np.ndarray:
    """Quantized bivariate-normal pdf summed over the 7x7 grid
    (src/van_vleck.rs:634-660). rho_grid: (M, R); xy/sq: (M, 7, 7) from
    `_grids`; returns (M, R).

    ``2 cosh(rho xy / d) exp(-(x^2+y^2)/(2d))`` is evaluated as
    ``exp((rho xy - sq)/d) + exp((-rho xy - sq)/d)`` — identical value, two
    transcendentals per grid point instead of three (cosh is itself two
    exps). Both exponents are <= 0 for rho in [0, 1) and x, y > 0 (AM-GM:
    2 rho xy <= x^2 + y^2), so no overflow guard is needed."""
    d = np.maximum(1.0 - rho_grid ** 2, 1e-20)        # (M, R)
    inv_d = 1.0 / d[:, :, None, None]                 # (M, R, 1, 1)
    a = xy[:, None, :, :] * rho_grid[:, :, None, None] * inv_d
    b = sq[:, None, :, :] * inv_d
    r = (np.exp(a - b) + np.exp(-a - b)).sum(axis=(-2, -1))  # (M, R)
    return r / (np.pi * np.sqrt(d))


def _pdf(rho: np.ndarray, xy: np.ndarray, sq: np.ndarray) -> np.ndarray:
    """Single-point pdf per cell: rho (M,) → (M,)."""
    return _pdf_grid(rho[:, None], xy, sq)[:, 0]


_SIMPSON_N = 10
_SIMPSON_W = np.array([1, 4, 2, 4, 2, 4, 2, 4, 2, 4, 1], dtype=np.float64)


def _corrcorrect_simp(rho: np.ndarray, xy: np.ndarray, sq: np.ndarray,
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Simpson's-rule integral of the pdf from 0 to rho, n=10 intervals
    (src/van_vleck.rs:663-697). Returns ``(integral, pdf(rho))`` — the last
    Simpson point IS rho, so the Newton derivative comes for free."""
    h = rho / _SIMPSON_N                                   # (M,)
    pts = np.linspace(0.0, 1.0, _SIMPSON_N + 1)            # (R,)
    rho_grid = rho[:, None] * pts[None, :]                 # (M, R)
    vals = _pdf_grid(rho_grid, xy, sq)                     # (M, R)
    return (vals * _SIMPSON_W).sum(axis=-1) * h / 3.0, vals[:, -1]


def van_vleck_crosses(khat: np.ndarray, sigma1: np.ndarray,
                      sigma2: np.ndarray) -> np.ndarray:
    """Vectorized Newton solve of the cross integral
    (src/van_vleck.rs:703-748). Guards replicate the reference: sigma<=0,
    initial guess outside [0,1), |rho|>1, or non-convergence → passthrough
    of khat (van_vleck_crosses_int :751-771)."""
    k = np.asarray(khat, dtype=np.float64)
    s1 = np.asarray(sigma1, dtype=np.float64)
    s2 = np.asarray(sigma2, dtype=np.float64)
    out = k.copy()
    sign = np.sign(k)
    ka = np.abs(k)
    with np.errstate(divide="ignore", invalid="ignore"):
        guess = ka / (s1 * s2)
    solvable = (s1 > 0) & (s2 > 0) & (guess >= 0.0) & (guess < 1.0) & np.isfinite(guess)
    idx_all = np.flatnonzero(solvable)
    if idx_all.size == 0:
        return out
    # The solve is a pure function of (|khat|, sigma1, sigma2) — and the
    # inputs of a Van Vleck correction are 4+4-bit quantized correlator
    # accumulations on a discrete lattice, with sigmas drawn from the
    # (tiny) per-antenna auto table. Distinct triples are a small
    # fraction of the rows, so solve each triple ONCE and scatter:
    # results are bit-identical, and the lexsort costs O(M log M)
    # against ~1000 transcendentals per saved Newton solve.
    ka_s, s1_s, s2_s = ka[idx_all], s1[idx_all], s2[idx_all]
    order = np.lexsort((s2_s, s1_s, ka_s))
    a_, b_, c_ = ka_s[order], s1_s[order], s2_s[order]
    first = np.empty(order.size, dtype=bool)
    first[0] = True
    first[1:] = ((a_[1:] != a_[:-1]) | (b_[1:] != b_[:-1])
                 | (c_[1:] != c_[:-1]))
    uinv = np.empty(order.size, dtype=np.int64)
    uinv[order] = np.cumsum(first) - 1
    uka, us1, us2 = a_[first], b_[first], c_[first]
    urho = np.empty(uka.size)
    uacc = np.zeros(uka.size, dtype=bool)
    # chunk the solve: the Simpson grids are (M, 11, 7, 7) f64 temporaries
    # (~4.3 KB/element/iteration), so an unchunked 80k-element batch (10k
    # Arrow rows x 8 fused components) would churn ~350 MB per Newton
    # step. 8192-element chunks cap peak temporaries at ~35 MB per worker
    # regardless of Arrow batch size — elements are independent, results
    # identical.
    for lo in range(0, uka.size, 8192):
        sl = slice(lo, min(lo + 8192, uka.size))
        x = _K[None, :] / us1[sl, None]                    # (M, 7)
        y = _K[None, :] / us2[sl, None]
        xy, sq = _grids(x, y)
        target = uka[sl]
        with np.errstate(invalid="ignore", divide="ignore", over="ignore"):
            g = target / (us1[sl] * us2[sl])
            integral, gp = _corrcorrect_simp(g, xy, sq)
            delta = integral - target
            # a non-finite delta means the step overflowed (g escaped
            # [0,1)) or gp hit zero — DIVERGED, never "converged". The
            # reference reaches None via its iteration cap for the inf
            # case (`while delta.abs() > tol` keeps spinning on inf,
            # src/van_vleck.rs:721-729); for NaN it would exit the loop
            # and emit garbage — passthrough is the safe spelling of
            # both, and matches unwrap_or(khat) semantics.
            bad = ~np.isfinite(delta)
            active = (np.abs(delta) > 1e-12) & ~bad
            for _ in range(100):
                if not active.any():
                    break
                g[active] -= delta[active] / gp[active]
                integral_a, gp_a = _corrcorrect_simp(
                    g[active], xy[active], sq[active])
                delta[active] = integral_a - target[active]
                gp[active] = gp_a
                bad |= active & ~np.isfinite(delta)
                active &= (np.abs(delta) > 1e-12) & ~bad
        # still-active after 100 iterations (non-converged) or diverged
        # → passthrough khat (unwrap_or, src/van_vleck.rs:764-768)
        urho[sl] = g
        uacc[sl] = ~active & ~bad
    rho = urho[uinv]
    acc = uacc[uinv]
    upd = idx_all[acc]
    out[upd] = sign[upd] * rho[acc] * s1[upd] * s2[upd]
    return out


# -------------------------------------------------------- Spark operator ---

_SIGMA_SCHEMA = "t int, chan int, ant int, sigma_x double, sigma_y double"


def auto_sigmas(vis: DataFrame, sample_scale: float,
                flagged_ants: list[int] | None = None) -> DataFrame:
    """Stage 1: the sigma table from unflagged autocorrelations
    (src/van_vleck.rs:197-216). sighat = sqrt(v / scale) per xx/yy real."""
    autos = vis.filter(F.col("ant1") == F.col("ant2"))
    if flagged_ants:
        autos = autos.filter(~F.col("ant1").isin(list(flagged_ants)))
    # One sigma row per (t, chan, ant), ALWAYS: in a real obs the auto subset
    # is already unique per key, but any duplicate keys (e.g. re-read rows)
    # would turn the left joins below into a row-multiplying explosion. The
    # aggregate guarantees key uniqueness and map-side-combines the solve
    # input down to exactly T*C*A rows before the Newton UDF.
    proj = (autos
            .groupBy("t", "chan", F.col("ant1").alias("ant"))
            .agg(F.min("xx_re").alias("xx_re"), F.min("yy_re").alias("yy_re")))

    def solve(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            sighat_xx = np.sqrt(pdf_["xx_re"].to_numpy() / sample_scale)
            sighat_yy = np.sqrt(pdf_["yy_re"].to_numpy() / sample_scale)
            yield pd.DataFrame({
                "t": pdf_["t"], "chan": pdf_["chan"], "ant": pdf_["ant"],
                "sigma_x": van_vleck_autos(sighat_xx),
                "sigma_y": van_vleck_autos(sighat_yy),
            })

    return proj.mapInPandas(solve, schema=_SIGMA_SCHEMA)


def correct_van_vleck(vis: DataFrame, sample_scale: float,
                      flagged_ants: list[int] | None = None,
                      gate_col: str | None = None) -> DataFrame:
    """Full C1: sigma table → double join → vectorized cross/auto solve.

    ``sample_scale`` = fine_chan_width_hz * int_time_ms / 500 * bscale
    (get_vv_sample_scale, src/van_vleck.rs:318-329).
    Rows whose sigma is unavailable (flagged ant / missing auto) pass
    through unchanged, like the reference's ``_ => {}`` arm (:305).

    ``gate_col`` names a boolean cell-all-flagged column on ``vis``
    (corrections.attach_cell_gate): rows of fully-flagged (t, cc) cells
    pass through raw, matching v0.18.0's unflagged-timestep-range gate
    (src/preprocessing.rs:249-253). Gated cells' autos still feed the
    sigma table — harmless, since a cell's sigma is only consumed by
    that same cell's (masked) rows.
    """
    # both join sides consume the sigma table — persist so the Newton
    # solve (groupBy + mapInPandas over all autos) runs once, not twice
    from pyspark.storagelevel import StorageLevel
    sig = auto_sigmas(vis, sample_scale, flagged_ants).persist(
        StorageLevel.MEMORY_AND_DISK)
    s1 = sig.select(F.col("t"), F.col("chan"), F.col("ant").alias("ant1"),
                    F.col("sigma_x").alias("_s1x"), F.col("sigma_y").alias("_s1y"))
    s2 = sig.select(F.col("t"), F.col("chan"), F.col("ant").alias("ant2"),
                    F.col("sigma_x").alias("_s2x"), F.col("sigma_y").alias("_s2y"))
    joined = (vis.join(s1, ["t", "chan", "ant1"], "left")
                 .join(s2, ["t", "chan", "ant2"], "left"))
    out_cols = list(vis.columns)
    int_or_bool = {
        "t": "t int", "ant1": "ant1 int", "ant2": "ant2 int",
        "bl": "bl int", "cc": "cc int", "fc": "fc int", "chan": "chan int",
        "flag": "flag boolean",
    }
    if gate_col is not None:
        int_or_bool[gate_col] = f"{gate_col} boolean"
    schema = ", ".join(int_or_bool.get(c, f"{c} double") for c in out_cols)

    def apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            n = len(pdf_)
            if n == 0:
                continue
            is_auto = (pdf_["ant1"] == pdf_["ant2"]).to_numpy()
            s1x = pdf_["_s1x"].to_numpy()
            s1y = pdf_["_s1y"].to_numpy()
            s2x = pdf_["_s2x"].to_numpy()
            s2y = pdf_["_s2y"].to_numpy()
            have1 = np.isfinite(s1x)
            have2 = np.isfinite(s2x)
            if gate_col is not None:
                ungated = ~pdf_[gate_col].to_numpy(dtype=bool)
                have1 = have1 & ungated
                have2 = have2 & ungated
            vals = {c: pdf_[c].to_numpy(dtype=np.float64).copy() for c in VIS_COLS}

            # --- unflagged autos (src/van_vleck.rs:230-266)
            am = is_auto & have1
            if am.any():
                sx, sy = s1x[am], s1y[am]
                vals["xx_re"][am] = sample_scale * sx ** 2
                vals["xx_im"][am] = 0.0
                vals["yy_re"][am] = sample_scale * sy ** 2
                vals["yy_im"][am] = 0.0
                prod = sx * sy
                khat_re = pdf_["xy_re"].to_numpy(dtype=np.float64)[am] / sample_scale
                khat_im = pdf_["xy_im"].to_numpy(dtype=np.float64)[am] / sample_scale
                # joint guard on re AND im (src/van_vleck.rs:248-259): if
                # either component exceeds sigma_x*sigma_y both pass
                # through. Deliberately SIGNED compares — the reference's
                # auto branch uses `khat_re > sigma_product` (no .abs()),
                # unlike its cross branch which guards on khat.abs()
                ok = ~((khat_re > prod) | (khat_im > prod))
                m = int(ok.sum())
                solved = van_vleck_crosses(
                    np.concatenate([khat_re[ok], khat_im[ok]]),
                    np.tile(sx[ok], 2), np.tile(sy[ok], 2))
                kr, ki = solved[:m], solved[m:]
                sub = np.flatnonzero(am)[ok]
                vals["xy_re"][sub] = sample_scale * kr
                vals["xy_im"][sub] = sample_scale * ki
                vals["yx_re"][sub] = sample_scale * kr
                vals["yx_im"][sub] = sample_scale * -ki

            # --- unflagged crosses (src/van_vleck.rs:268-303)
            cm = (~is_auto) & have1 & have2
            if cm.any():
                # one batched Newton solve for all 8 components: the
                # |khat| > sigma_a*sigma_b pre-guard is subsumed by the
                # solver's own guess<1 solvability guard (identical
                # passthrough), so components just concatenate. One big
                # vectorized solve amortizes the per-call masking overhead
                # and converges on a single shared active set.
                comps = [
                    ("xx_re", s1x, s2x), ("xx_im", s1x, s2x),
                    ("xy_re", s1x, s2y), ("xy_im", s1x, s2y),
                    ("yx_re", s1y, s2x), ("yx_im", s1y, s2x),
                    ("yy_re", s1y, s2y), ("yy_im", s1y, s2y),
                ]
                mc = int(cm.sum())
                solved = van_vleck_crosses(
                    np.concatenate([vals[c][cm] / sample_scale for c, _, _ in comps]),
                    np.concatenate([sa[cm] for _, sa, _ in comps]),
                    np.concatenate([sb[cm] for _, _, sb in comps]))
                for i, (col, _, _) in enumerate(comps):
                    vals[col][cm] = sample_scale * solved[i * mc:(i + 1) * mc]

            res = pdf_[out_cols].copy()
            for c in VIS_COLS:
                res[c] = np.float64(np.float32(vals[c]))  # demote like f32 writes
            yield res

    return joined.mapInPandas(apply, schema=schema)
