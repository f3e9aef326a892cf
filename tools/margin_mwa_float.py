"""Margin analysis for the f9e float mode vs the cotter golden: for
every disagreeing cell, how far (in units of the final-pass threshold)
is the decision? Proves/disproves 'the residual is threshold-marginal'.
"""
from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tests"))

from test_golden_mwa_flags import load_golden  # noqa: E402

from birli_spark.operators import rfi  # noqa: E402


def cell_margins(pol_imgs, present=None):
    """Max over pols of (final-pass residual / chi_1) per cell — the
    m=1 decision margin of the FINAL full-sensitivity pass (>1 flags).

    The ladder replay uses the SHIPPED production configuration
    (rfi.MWA_FLOAT_KW), not sumthreshold_float's defaults — ADVICE r7:
    a replay at center=True while production ships center=False would
    quote margins for a configuration that no longer runs."""
    shape = next(iter(pol_imgs.values())).shape
    present = np.ones(shape, bool) if present is None else present
    # the subset of MWA_FLOAT_KW that parameterizes the ladder itself
    st_kw = {k: v for k, v in rfi.MWA_FLOAT_KW.items()
             if k in ("windows", "form", "two_sided", "noise_est",
                      "decay", "center")}
    best = np.full(shape, -np.inf)
    for p in rfi.MWA_POLS:
        img = np.asarray(pol_imgs[p], dtype=np.float64)
        # replay the ladder to the final residual, mask as of final pass
        work = ~present.copy()
        resid = img
        for i in range(1, rfi.AOF_ITERS):
            factor = rfi.AOF_STEP ** (rfi.AOF_ITERS - i)
            work = rfi.sumthreshold_float(resid, work, present,
                                          6.0 * factor, **st_kw)
            bg = rfi.lowpass_resized_float(img, ~work & present,
                                           rf=rfi.MWA_FLOAT_KW["rf"])
            resid = img - bg
        vals = resid[~work]
        mode = rfi.winsorized_mode(vals)
        if mode <= 0:
            continue
        if st_kw.get("center", True):
            resid = resid - float(np.median(vals))
        ratio = resid / (6.0 * mode)
        best = np.maximum(best, ratio)
    return best


def main():
    data = load_golden()
    margins_fp, margins_fn = [], []
    for (a1, a2), (pol_imgs, fl) in data.items():
        if a1 == a2:
            continue
        det = rfi.mwa_strategy_mask_pols_float(pol_imgs,
                                               **rfi.MWA_FLOAT_KW)
        marg = cell_margins(pol_imgs)
        fp = det & ~fl
        fn = ~det & fl
        margins_fp.extend(marg[fp].tolist())
        margins_fn.extend(marg[fn].tolist())
    mfp = np.array(margins_fp)
    mfn = np.array(margins_fn)
    print(f"fp cells: {len(mfp)}  margin quartiles "
          f"{np.percentile(mfp, [25, 50, 75, 95]).round(3)}")
    print(f"   within 2x of threshold: {(np.abs(mfp) < 2).mean():.2%}")
    print(f"fn cells: {len(mfn)}  margin quartiles "
          f"{np.percentile(mfn, [25, 50, 75, 95]).round(3)}")
    print(f"   within 2x of threshold: {(np.abs(mfn) < 2).mean():.2%}")


if __name__ == "__main__":
    main()
