"""Measure f9e float-mode variants against the reference's own cotter
mwa-default golden (tests/test_golden_mwa_flags.py loader). Pure numpy,
no Spark — the fast feedback loop for closing the recall gap.

Usage: python tools/tune_mwa_float.py
"""
from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tests"))

from test_golden_mwa_flags import load_golden  # noqa: E402

from birli_spark.operators import rfi  # noqa: E402


def score(fn, data, **kw):
    tp = fp = fn_ = tn = 0
    for (a1, a2), (pol_imgs, fl) in data.items():
        if a1 == a2:
            continue
        det = fn(pol_imgs, **kw)
        tp += int((det & fl).sum())
        fp += int((det & ~fl).sum())
        fn_ += int((~det & fl).sum())
        tn += int((~det & ~fl).sum())
    n = tp + fp + fn_ + tn
    return {"agree": (tp + tn) / n, "recall": tp / max(tp + fn_, 1),
            "precision": tp / max(tp + fp, 1),
            "tp": tp, "fp": fp, "fn": fn_, "rate": (tp + fp) / n}


def residual_by_channel(fn, data, **kw):
    """Per-channel disagreement counts for the surviving variant."""
    dis = np.zeros(768, dtype=np.int64)
    miss = np.zeros(768, dtype=np.int64)
    extra = np.zeros(768, dtype=np.int64)
    for (a1, a2), (pol_imgs, fl) in data.items():
        if a1 == a2:
            continue
        det = fn(pol_imgs, **kw)
        dis += (det != fl).sum(axis=0)
        miss += (~det & fl).sum(axis=0)
        extra += (det & ~fl).sum(axis=0)
    return dis, miss, extra


def golden_structure(data):
    """What did cotter actually flag? Counts by chan%32 and by channel."""
    byc = np.zeros(768, dtype=np.int64)
    for (a1, a2), (pol_imgs, fl) in data.items():
        if a1 == a2:
            continue
        byc += fl.sum(axis=0)
    bym = np.zeros(32, dtype=np.int64)
    for c in range(768):
        bym[c % 32] += byc[c]
    print("golden flags by chan%32:", dict(
        (m, int(v)) for m, v in enumerate(bym) if v))
    full = np.where(byc == 22)[0]
    print(f"channels fully flagged (22/22): {len(full)}: {full[:40]}")
    part = np.where((byc > 0) & (byc < 22))[0]
    print(f"channels partially flagged: {len(part)}: {part[:40]}")


def pareto_grid(data):
    """Round-6 irreducibility sweep: every combination of the plausible
    published-default knobs, reporting the Pareto front of (agreement,
    recall). Measured 2026-08: NO configuration reaches agreement
    >= 0.99 with recall >= 0.90 — the front tops at 0.9873 @ recall
    0.848 (s=6.5) vs the production 0.9824 @ 0.922 (s=6.0); eta and
    final_ts_rms are inert on this golden; bg_over='present' (self-
    subtracting background) moves < 0.3 pp. The background-fit kernel
    axis shows the same wall (swept separately): narrowing the
    frequency sigma trades recall for precision along the identical
    front (sigma_f 5->2: 0.9854 @ 0.851; ->1: 0.9851 @ 0.676; widening
    to 10 loses both), and the time sigma is inert. Together with the margin
    analysis (fp margins 0.71-1.42, fn margins 0.70-0.98 — cotter's
    effective per-cell threshold deviates from ours in BOTH directions
    within 2x), this shows the residual is not reachable by any global
    threshold/noise rescale: it is the boundary of reimplementing the
    FFI'd C++ flagger's cell-level arithmetic from public behavior."""
    rows = []
    for s in (6.0, 6.2, 6.35, 6.5):
        for fin in (3.5, 4.0, 4.5):
            for eta in (0.2, 0.1):
                for bg in ("unflagged", "present"):
                    kw = {**rfi.MWA_FLOAT_KW, "base_sensitivity": s,
                          "final_ts_rms": fin, "eta": eta,
                          "bg_over": bg}
                    r = score(rfi.mwa_strategy_mask_pols_float, data,
                              **kw)
                    rows.append((r["agree"], r["recall"], s, fin, eta,
                                 bg, r["tp"], r["fp"], r["fn"]))
    rows.sort(reverse=True)
    print("pareto grid (top 10 by agreement):")
    for a, rc, s, fin, eta, bg, tp, fp, fn in rows[:10]:
        flag = "MEETS-RECALL" if rc >= 0.90 else ""
        print(f"  agree={a:.4f} recall={rc:.3f} s={s} fin={fin} "
              f"eta={eta} bg={bg} tp={tp} fp={fp} fn={fn} {flag}")
    feasible = [r for r in rows if r[1] >= 0.90]
    print(f"best agreement with recall>=0.90: "
          f"{max(feasible)[0]:.4f}" if feasible else "none")


def main():
    data = load_golden()
    golden_structure(data)
    pareto_grid(data)
    base = dict(fn=rfi.mwa_strategy_mask_pols_float)
    prod = dict(fn=rfi.mwa_strategy_mask_pols_float, **rfi.MWA_FLOAT_KW)
    variants = {
        "production(MWA_FLOAT_KW)": dict(**prod),
        "ticks(current)": dict(fn=rfi.mwa_strategy_mask_pols),
        "wmode-256-d.75": dict(**base),
        "wmode-32-d.75": dict(**base, windows=rfi.WINDOWS),
        "wmode-256-d.667": dict(**base, decay=1 / 1.5),
        "wstd-256-d.75": dict(**base, noise_est="wstd"),
        "mad-256-d.75": dict(**base, noise_est="mad"),
        "mad-32-d.75": dict(**base, noise_est="mad",
                            windows=rfi.WINDOWS),
        "mad-32-d.667": dict(**base, noise_est="mad", decay=1 / 1.5,
                             windows=rfi.WINDOWS),
        "rf1-s6": dict(**base, rf=1),
        "rf2-s6": dict(**base, rf=2),
        "rf1-s5.8": dict(**base, rf=1, base_sensitivity=5.8),
        "rf1-s6.2": dict(**base, rf=1, base_sensitivity=6.2),
        "rf1-s6.5": dict(**base, rf=1, base_sensitivity=6.5),
        "rf1-s7": dict(**base, rf=1, base_sensitivity=7.0),
        "rf1-s6-mad": dict(**base, rf=1, noise_est="mad"),
        "rf1-s6-noch": dict(**base, rf=1, ch_rms=None),
    }
    for name, kw in variants.items():
        fn = kw.pop("fn")
        s = score(fn, data, **kw)
        print(f"{name:18s} agree={s['agree']:.4f} recall={s['recall']:.3f}"
              f" prec={s['precision']:.3f} tp={s['tp']} fp={s['fp']}"
              f" fn={s['fn']} rate={s['rate']:.4f}")
    dis, miss, extra = residual_by_channel(
        rfi.mwa_strategy_mask_pols_float, data)
    bad = np.argsort(-dis)[:20]
    print("worst channels (chan, disagree, missed, extra, chan%32):")
    for c in bad:
        if dis[c] == 0:
            break
        print(f"  {c:4d} dis={dis[c]:3d} miss={miss[c]:3d} "
              f"extra={extra[c]:3d} mod32={c % 32}")


if __name__ == "__main__":
    main()
