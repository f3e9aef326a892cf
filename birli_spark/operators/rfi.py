"""F9 — RFI detection (SURVEY.md §2.3 F9; reference src/flags.rs:368-437).

The reference marshals each baseline's visibilities into 8 time×chan float
images and runs AOFlagger's Lua strategy (SumThreshold et al., external
C++); the resulting mask is OR-ed into the existing flags
(``re_apply_existing``, src/flags.rs:414-418).

Byte-identical AOFlagger output is out of scope (the strategy is an
external Lua+C++ artifact, SURVEY.md §7 "What's hard"); we pin the
**documented SumThreshold algorithm** (A. R. Offringa et al., "A morphological
algorithm for improving radio-frequency interference detection",
A&A 539 A95, 2012): iterative sum-threshold passes in both time and
frequency directions with window lengths M = 1, 2, 4, ..., thresholds
``chi_M = chi_1 / rho^log2(M)`` (rho = 1.5), noise estimated by MAD.

Spark shape: ``groupBy(ant1, ant2).applyInPandas`` — the one
image-forming shuffle of the pipeline. At 100 TB this is why the fact
table should be written bucketed by baseline: the groupBy then reuses the
bucketing and the shuffle disappears.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

RHO = 1.5
WINDOWS = (1, 2, 4, 8, 16, 32)


def _sumthreshold_1d(img: np.ndarray, flags: np.ndarray, m: int, chi: float) -> None:
    """One SumThreshold pass along axis 1 (vectorized over rows, in place).

    Flagged samples contribute the threshold value chi instead of their own
    (Offringa 2012 §2.1), so already-flagged spikes don't mask neighbours.
    """
    n = img.shape[1]
    if n < m:
        return
    adj = np.where(flags, chi, img)
    if m == 1:
        flags |= adj > chi
        return
    csum = np.cumsum(adj, axis=1)
    wsum = csum[:, m - 1:].copy()
    wsum[:, 1:] -= csum[:, :n - m]
    exceed = wsum > chi * m          # window starting at column j
    hit = np.zeros_like(flags)
    for off in range(m):
        hit[:, off:off + exceed.shape[1]] |= exceed
    flags |= hit


def sumthreshold_mask(img: np.ndarray, base_sensitivity: float = 6.0,
                      existing: np.ndarray | None = None,
                      valid: np.ndarray | None = None) -> np.ndarray:
    """SumThreshold over a 2-D (time × chan) amplitude image → boolean mask.

    chi_1 = base_sensitivity * sigma_MAD; both directions per window length.
    ``valid`` marks cells that actually hold a sample: the median/MAD noise
    estimate is computed over valid cells ONLY (a placeholder 0.0 in absent
    cells would deflate sigma and over-flag sparse baselines), and absent
    cells are treated like already-flagged samples inside the window sums
    (they contribute chi, not their placeholder). Absent cells are never
    reported flagged.
    """
    img = np.asarray(img, dtype=np.float64)
    present = (np.ones(img.shape, dtype=bool) if valid is None
               else np.asarray(valid, dtype=bool))
    prior = np.zeros(img.shape, dtype=bool) if existing is None else existing
    vals = img[present]
    if vals.size == 0:
        return prior.copy()
    med = np.median(vals)
    mad = np.median(np.abs(vals - med))
    sigma = 1.4826 * mad
    if sigma == 0.0 or not np.isfinite(sigma):
        # flat image: anything different from the median is interference
        return ((img != med) & present) | prior
    work = prior | ~present
    resid = img - med
    chi1 = base_sensitivity * sigma
    for m in WINDOWS:
        chi = chi1 / (RHO ** np.log2(m))
        _sumthreshold_1d(resid, work, m, chi)                  # time direction
        ft = work.T.copy()
        _sumthreshold_1d(resid.T.copy(), ft, m, chi)           # freq direction
        work |= ft.T
    return (work & present) | prior


def flag_rfi(vis: DataFrame, base_sensitivity: float = 6.0,
             re_apply_existing: bool = True,
             sir_eta: float | None = None) -> DataFrame:
    """Detect RFI per baseline and OR it into ``flag``.

    The per-baseline image is the Stokes-I amplitude
    ``|(xx + yy)| / 2`` over (t, chan) — the same reduction AOFlagger's MWA
    strategy feeds SumThreshold. ``re_apply_existing=True`` ORs with prior
    flags (reference src/flags.rs:414-418); False overwrites.
    ``sir_eta`` appends the SIR morphological dilation (aoflagger's
    post-pass; :func:`sir_mask`) to the detected mask.
    """
    cols = list(vis.columns)
    schema = vis.schema

    def per_baseline(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(pdf["t"].unique())
        chans = np.sort(pdf["chan"].unique())
        t_idx = {v: i for i, v in enumerate(ts)}
        c_idx = {v: i for i, v in enumerate(chans)}
        rows = pdf["t"].map(t_idx).to_numpy()
        cs = pdf["chan"].map(c_idx).to_numpy()
        img = np.zeros((len(ts), len(chans)), dtype=np.float64)
        re = (pdf["xx_re"].to_numpy() + pdf["yy_re"].to_numpy()) / 2.0
        im = (pdf["xx_im"].to_numpy() + pdf["yy_im"].to_numpy()) / 2.0
        img[rows, cs] = np.hypot(re, im)
        present = np.zeros(img.shape, dtype=bool)
        present[rows, cs] = True
        prior = np.zeros(img.shape, dtype=bool)
        prior[rows, cs] = pdf["flag"].to_numpy(dtype=bool)
        mask = sumthreshold_mask(
            img, base_sensitivity,
            existing=prior if re_apply_existing else None,
            valid=present)
        if sir_eta is not None:
            mask = sir_mask(mask, sir_eta)
        out = pdf.copy()
        detected = mask[rows, cs]
        out["flag"] = (pdf["flag"].to_numpy(dtype=bool) | detected) \
            if re_apply_existing else detected
        return out[cols]

    return vis.groupBy("ant1", "ant2").applyInPandas(per_baseline, schema=schema)


# ------------------------------------- iterative AOFlagger strategy ---
# F9d: the published aoflagger GENERIC strategy structure (Offringa,
# aoflagger.readthedocs.io "the generic strategy"; the reference runs
# the derived mwa-default via FFI, src/flags.rs:368-437): iterate
# {SumThreshold at a decreasing threshold factor -> subtract a
# flag-masked Gaussian sliding-window fit of the ORIGINAL image}, then a
# final full-sensitivity SumThreshold and the SIR morphological pass.
# Byte-parity with AOFlagger stays out of scope (SURVEY.md §7); what is
# pinned here is the strategy SHAPE with the documented parameters:
# 3 iterations, threshold factor step 2 (factors 4, 2, 1), a 21x31
# Gaussian kernel with sigma 2.5 (time) x 5.0 (channels), SIR eta 0.2.
#
# Cross-engine exactness: the image is standardized by its f32-demoted
# median/MAD once and quantized to INTEGER ticks; the Gaussian kernel is
# quantized to integer weights; the sliding-window fit is then exact
# BIGINT arithmetic (separable masked weighted mean, half-up integer
# division), so every engine computes the identical residual image and
# every SumThreshold call sees integer-valued amplitudes.

#: ticks per sigma for the standardized image fed to the strategy
LP_TICKS = 1 << 14
#: clamp on |standardized amp| in sigma units (2^10 sigma) — keeps every
#: windowed BIGINT sum far below 2^63
LP_CLAMP_SIGMA = 1024.0
#: integer scale of the quantized Gaussian kernel weights
LP_KERNEL_SCALE = 1 << 11
#: published generic-strategy kernel: 21 x 31 cells, sigma 2.5 x 5.0
LP_RADIUS_T, LP_SIGMA_T = 10, 2.5
LP_RADIUS_F, LP_SIGMA_F = 15, 5.0
#: published generic-strategy iteration ladder
AOF_ITERS = 3
AOF_STEP = 2.0


def lp_kernel(radius: int, sigma: float) -> tuple[int, ...]:
    """Integer-quantized Gaussian kernel weights for offsets
    -radius..radius (identical literals in the SQL spelling)."""
    return tuple(
        int(round(LP_KERNEL_SCALE * np.exp(-(d * d) / (2.0 * sigma * sigma))))
        for d in range(-radius, radius + 1))


def _f32(a):
    return np.asarray(np.float32(a), dtype=np.float64)


def _round_half_up(v: np.ndarray) -> np.ndarray:
    return np.floor(v + 0.5).astype(np.int64)


def standardize_ticks(img: np.ndarray, present: np.ndarray
                      ) -> np.ndarray:
    """f32-demoted median/MAD standardization -> clamped integer ticks.
    sigma==0 / non-finite arm: off-median cells jump to the clamp (the
    m=1 pass at any sensitivity then flags exactly those)."""
    clamp = int(LP_CLAMP_SIGMA * LP_TICKS)
    vals = img[present]
    if vals.size == 0:
        return np.zeros(img.shape, dtype=np.int64)
    med = float(_f32(np.median(vals)))
    ad = _f32(np.abs(img - med))
    mad = float(_f32(np.median(ad[present])))
    sigma = 1.4826 * mad
    if not (sigma > 0.0 and np.isfinite(sigma)):
        return np.where(img != med, np.int64(clamp), np.int64(0))
    std = np.clip((img - med) / sigma, -LP_CLAMP_SIGMA, LP_CLAMP_SIGMA)
    return _round_half_up(std * float(LP_TICKS))


def _st_1d_ticks(rq: np.ndarray, work: np.ndarray, m: int, cq: int) -> None:
    """Integer-tick SumThreshold pass along axis 1 (in place) — the
    numpy mirror of one rfi_sql ladder step: flagged cells contribute
    the threshold cq, full windows with sum > cq*m dilate."""
    n = rq.shape[1]
    if n < m:
        return
    adj = np.where(work, np.int64(cq), rq)
    if m == 1:
        work |= adj > cq
        return
    csum = np.cumsum(adj, axis=1)
    wsum = csum[:, m - 1:].copy()
    wsum[:, 1:] -= csum[:, :n - m]
    exceed = wsum > np.int64(cq) * m
    for off in range(m):
        work[:, off:off + exceed.shape[1]] |= exceed


def sumthreshold_ticks(x: np.ndarray, work0: np.ndarray,
                       present: np.ndarray,
                       sensitivity: float) -> np.ndarray:
    """Tick-exact SumThreshold over an INTEGER image — the numpy mirror
    of rfi_sql.sumthreshold_parts on a dense tick relation. Returns the
    accumulated mask for ALL grid cells (absent cells stay flagged).
    The call re-standardizes its input by the f32-demoted median/MAD of
    the integer image and re-quantizes at TICKS per sigma, exactly as
    the SQL does for any amp relation."""
    from birli_spark.operators.rfi_sql import TICKS, CLAMP, _chi_ticks

    img = x.astype(np.float64)
    vals = img[present]
    prior = work0 | ~present
    if vals.size == 0:
        return prior.copy()
    med = float(_f32(np.median(vals)))
    ad = _f32(np.abs(img - med))
    mad = float(_f32(np.median(ad[present])))
    sigma = 1.4826 * mad
    if not (sigma > 0.0 and np.isfinite(sigma)):
        return ((img != med) & present) | prior
    rq = _round_half_up(
        np.clip((img - med) / sigma, -CLAMP, CLAMP) * float(TICKS))
    work = prior.copy()
    for m in WINDOWS:
        cq = _chi_ticks(sensitivity, m)
        _st_1d_ticks(rq, work, m, cq)                 # time direction
        ft = work.T.copy()
        _st_1d_ticks(rq.T.copy(), ft, m, cq)          # freq direction
        work |= ft.T
    return work


def lowpass_ticks(x: np.ndarray, unflagged: np.ndarray) -> np.ndarray:
    """Separable flag-masked Gaussian sliding-window fit in exact
    integer arithmetic: per-axis integer kernels, numerator/denominator
    accumulated separately, half-up integer division; windows truncate
    at the image edge (normalized by the weights actually present);
    a fully-flagged window fits 0."""
    gt = np.array(lp_kernel(LP_RADIUS_T, LP_SIGMA_T), dtype=np.int64)
    gf = np.array(lp_kernel(LP_RADIUS_F, LP_SIGMA_F), dtype=np.int64)
    m = unflagged.astype(np.int64)
    xm = np.where(unflagged, x, np.int64(0))
    nt, nc = x.shape
    num1 = np.zeros_like(x)
    den1 = np.zeros_like(x)
    for k, d in enumerate(range(-LP_RADIUS_T, LP_RADIUS_T + 1)):
        lo, hi = max(0, -d), min(nt, nt - d)
        if hi <= lo:        # offset exceeds the image: nothing in range
            continue
        num1[lo:hi] += gt[k] * xm[lo + d:hi + d]
        den1[lo:hi] += gt[k] * m[lo + d:hi + d]
    num = np.zeros_like(x)
    den = np.zeros_like(x)
    for k, d in enumerate(range(-LP_RADIUS_F, LP_RADIUS_F + 1)):
        lo, hi = max(0, -d), min(nc, nc - d)
        if hi <= lo:
            continue
        num[:, lo:hi] += gf[k] * num1[:, lo + d:hi + d]
        den[:, lo:hi] += gf[k] * den1[:, lo + d:hi + d]
    # bg = round_half_up(num / den) via floor((2num + den) / (2den));
    # numpy // IS floor division — the SQL spells the same floor through
    # the math-mod subtraction (both engines' % truncates)
    a = 2 * num + den
    b = np.where(den > 0, 2 * den, np.int64(1))
    return np.where(den > 0, a // b, np.int64(0))


def aoflagger_strategy_mask(img: np.ndarray,
                            base_sensitivity: float = 6.0,
                            existing: np.ndarray | None = None,
                            valid: np.ndarray | None = None,
                            iterations: int = AOF_ITERS,
                            step: float = AOF_STEP,
                            eta: float | None = 0.2) -> np.ndarray:
    """F9d — the iterative strategy over a (time x chan) amplitude
    image: standardize to ticks once, then for each non-final iteration
    SumThreshold at ``base_sensitivity * step^(iterations - i)`` and
    re-fit the residual (original ticks minus the masked Gaussian fit);
    final iteration at full sensitivity, then SIR (``eta=None`` skips).
    Returns the mask for present cells (absent never reported)."""
    img = np.asarray(img, dtype=np.float64)
    present = (np.ones(img.shape, dtype=bool) if valid is None
               else np.asarray(valid, dtype=bool))
    prior = (np.zeros(img.shape, dtype=bool) if existing is None
             else np.asarray(existing, dtype=bool))
    x = standardize_ticks(img, present)
    work = prior | ~present
    resid = x
    for i in range(1, iterations):
        factor = step ** (iterations - i)
        work = sumthreshold_ticks(resid, work, present,
                                  base_sensitivity * factor)
        bg = lowpass_ticks(x, ~work & present)
        resid = x - bg
    work = sumthreshold_ticks(resid, work, present, base_sensitivity)
    det = (work & present) | prior
    if eta is not None:
        det = sir_mask(det, eta)
    return det & present | (prior & present)


def flag_rfi_strategy(vis: DataFrame, base_sensitivity: float = 6.0,
                      eta: float | None = 0.2) -> DataFrame:
    """F9d as the 100 TB UDF island: per-baseline images via ONE
    ``groupBy(ant1, ant2).applyInPandas`` shuffle (bucketing by baseline
    removes it), each image run through the iterative strategy
    (:func:`aoflagger_strategy_mask`); the mask ORs into ``flag``."""
    cols = list(vis.columns)
    schema = vis.schema

    def per_baseline(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(pdf["t"].unique())
        chans = np.sort(pdf["chan"].unique())
        t_idx = {v: i for i, v in enumerate(ts)}
        c_idx = {v: i for i, v in enumerate(chans)}
        rows = pdf["t"].map(t_idx).to_numpy()
        cs = pdf["chan"].map(c_idx).to_numpy()
        img = np.zeros((len(ts), len(chans)), dtype=np.float64)
        re = (pdf["xx_re"].to_numpy() + pdf["yy_re"].to_numpy()) / 2.0
        im = (pdf["xx_im"].to_numpy() + pdf["yy_im"].to_numpy()) / 2.0
        img[rows, cs] = np.hypot(re, im)
        present = np.zeros(img.shape, dtype=bool)
        present[rows, cs] = True
        prior = np.zeros(img.shape, dtype=bool)
        prior[rows, cs] = pdf["flag"].to_numpy(dtype=bool)
        mask = aoflagger_strategy_mask(
            img, base_sensitivity, existing=prior, valid=present,
            eta=eta)
        out = pdf.copy()
        out["flag"] = pdf["flag"].to_numpy(dtype=bool) | mask[rows, cs]
        return out[cols]

    return vis.groupBy("ant1", "ant2").applyInPandas(per_baseline,
                                                     schema=schema)


# ------------------------------------------------- SIR morphology ---

#: SIR aggressiveness ticks-per-unit: eta quantized to 1/SIR_D so the
#: prefix sums are exact integers (float prefixes break >= ties at the
#: rank boundary, and engines would disagree on sum association)
SIR_D = 1000


def sir_1d(flags: np.ndarray, eta: float = 0.2) -> np.ndarray:
    """Scale-invariant rank (SIR) dilation along axis 1 (Offringa & van
    de Gronde 2012, the morphological post-pass of AOFlagger's strategy
    the reference executes via FFI, src/flags.rs:368-437): sample i is
    flagged iff some window [j, k) containing i has at least
    (1 - eta)(k - j) flagged samples. O(N) via integer-tick prefix
    sums: with w = eta*D for flagged, (eta-1)*D for unflagged and P the
    exclusive prefix sum, the condition is
    max_{k > i} P(k) - min_{j <= i} P(j) >= 0."""
    f = np.asarray(flags, dtype=bool)
    en = int(round(eta * SIR_D))
    w = np.where(f, en, en - SIR_D).astype(np.int64)
    p = np.concatenate(
        [np.zeros((f.shape[0], 1), np.int64), np.cumsum(w, axis=1)],
        axis=1)
    fwd_max = np.maximum.accumulate(p[:, ::-1], axis=1)[:, ::-1]
    back_min = np.minimum.accumulate(p, axis=1)
    return fwd_max[:, 1:] - back_min[:, :-1] >= 0


def sir_mask(flags: np.ndarray, eta: float = 0.2) -> np.ndarray:
    """SIR in both directions — time (axis 0) first, then frequency
    (axis 1) on the time-dilated mask, OR-combined (aoflagger's
    two-pass application; same direction order as the relational
    spelling, rfi_sql.py::sir_parts)."""
    t_pass = sir_1d(np.asarray(flags, dtype=bool).T, eta).T
    f_pass = sir_1d(t_pass, eta)
    return t_pass | f_pass
