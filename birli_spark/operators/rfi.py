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
