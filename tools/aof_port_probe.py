"""f9f exact-arithmetic probe (VERDICT r6 ask 3): measure the
STRUCTURAL spellings of the public AOFlagger C++/Lua pipeline against
the cotter mwa-default golden, beyond the knob grid that
tools/tune_mwa_float.py already exhausted.

The knobs (sensitivity, eta, final_ts_rms, noise estimator, background
scope) were proven irreducible in round 6. What that grid could not
vary is the PASS STRUCTURE, which the public AOFlagger source
(algorithms/thresholdconfig.cpp, sumthreshold.cpp,
lua/strategies/generic + mwa) fixes differently from our measured-best
spelling in four discrete ways:

  order      — C++ ThresholdConfig::Execute runs EVERY horizontal
               (time) window length, then every vertical (frequency)
               length ('dirs'); ours interleaves per length.
  center     — C++ thresholds the residual as-is (no median
               centering); ours centers by the unflagged median.
  form       — C++ SumThresholdLarge EXCLUDES flagged samples and
               compares the remaining window mean; the paper's form
               substitutes chi for flagged samples ('subst').
  ch_on_copy — the Lua strategy computes threshold_channel_rms on a
               COPY made before threshold_timestep_rms and joins the
               masks; ours applied them sequentially.

This probe measures all 2^4 structural combinations x rf in {1, 3}
(the Lua downsample factor vs the measured-best full resolution)
against the golden, at the published defaults (sensitivity 6, eta 0.2,
final_ts_rms 4.0, Winsorized-mode noise).

Usage: python tools/aof_port_probe.py [--csv out.csv]
"""

from __future__ import annotations

import importlib.util
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from birli_spark.operators import rfi  # noqa: E402

_spec = importlib.util.spec_from_file_location(
    "golden_mwa", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "test_golden_mwa_flags.py"))
_golden = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_golden)


def confusion(data, **kw):
    tp = fp = fn = tn = 0
    for (a1, a2), (pol_imgs, fl) in data.items():
        if a1 == a2:
            continue
        det = rfi.mwa_strategy_mask_pols_float(pol_imgs, **kw)
        tp += int((det & fl).sum())
        fp += int((det & ~fl).sum())
        fn += int((~det & fl).sum())
        tn += int((~det & ~fl).sum())
    return tp, fp, fn, tn


def main() -> None:
    data = _golden.load_golden()
    results = []
    grid = itertools.product(
        ("interleave", "dirs"), (True, False), ("subst", "exclude"),
        (False, True), (1, 3))
    for order, center, form, ch_on_copy, rf in grid:
        kw = dict(rfi.MWA_FLOAT_KW)
        kw.update(order=order, center=center, form=form,
                  ch_on_copy=ch_on_copy, rf=rf)
        tp, fp, fn, tn = confusion(data, **kw)
        n = tp + fp + fn + tn
        rec = {
            "order": order, "center": center, "form": form,
            "ch_on_copy": ch_on_copy, "rf": rf,
            "agree": round((tp + tn) / n, 4),
            "recall": round(tp / (tp + fn), 4) if tp + fn else 0.0,
            "precision": round(tp / (tp + fp), 4) if tp + fp else 0.0,
            "tp": tp, "fp": fp, "fn": fn,
        }
        results.append(rec)
        print(json.dumps(rec))
    best = max(results, key=lambda r: (r["agree"], r["recall"]))
    ok = [r for r in results
          if r["agree"] >= 0.99 and r["recall"] >= 0.90]
    print("== best:", json.dumps(best))
    print(f"== combos at agreement>=0.99 & recall>=0.90: {len(ok)}")
    for r in ok:
        print("   ", json.dumps(r))


if __name__ == "__main__":
    main()
