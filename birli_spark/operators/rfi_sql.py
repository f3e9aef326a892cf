"""F9 (relational) — SumThreshold RFI as ONE cross-engine SQL plan,
giving the second reference-pipeline UDF island (operators/rfi.py,
reference ``src/flags.rs:368-437``) a DuckDB-checkable oracle.

The twelve sequential passes (window lengths m = 1..32, time then
frequency direction, Offringa et al. 2012) become chained window
functions: per pass, the window sum of length m starting at each grid
cell, a full-window threshold compare, and a trailing-window dilation
that flags every cell of an exceeding window. The passes are sequential
by construction (each reads the flag state the previous pass wrote) —
exactly the reference's in-place loop, spelled as 24 window layers.

Cross-engine hash-exactness: float window sums are NOT
association-stable across engines (Spark slides an accumulator, DuckDB
uses a segment tree), so the per-cell residuals are quantized to
**integer ticks of the robust sigma** (2^20 ticks per sigma,
half-up via exact FLOOR(x + 0.5)) and every window sum is a BIGINT —
exact in any association. The thresholds divide out sigma entirely:
chi_m / sigma = base_sensitivity / rho^log2(m), a data-independent
Python-computed integer literal per pass. The only cross-engine-fragile
scalars left are the two medians (median / MAD), which reuse the SSINS
pattern: aggregate-as-window with the engine's percentile /
quantile_cont and an f32 demotion to absorb interpolation ulps.

Tick quantization (~1e-6 sigma) can only flip a decision where a window
sum sits within half a tick of the threshold; tests/test_rfi_sql.py
gates flag-for-flag equality with the f64 UDF island on the driver
tables and on the reference's spike fixture.

Scale shape: the dense per-baseline image grid is (bl-t dim) x (bl-chan
dim) joined back to the fact scan; each direction change is a fact-scale
sort-exchange (12 total). That is the price of the gated relational
spelling — the UDF island (ONE image-forming shuffle, zero with
baseline bucketing) remains the 100 TB path and the pipeline/CLI
default; this plan is the hash-checkable twin of the same operator.
"""

from __future__ import annotations

from birli_spark.functions.complex import f32
from birli_spark.operators.rfi import RHO, WINDOWS

#: ticks per robust sigma — fine enough that no real window sum lands
#: within half a tick of a threshold, coarse enough for exact BIGINTs
TICKS = 1 << 20

#: clamp on |resid| / sigma before tick quantization (keeps the BIGINT
#: window sums far from overflow; anything near the clamp is flagged by
#: the m=1 pass at 6 sigma regardless)
CLAMP = 1e9

_INF = "CAST('Infinity' AS DOUBLE)"


def _chi_ticks(base_sensitivity: float, m: int) -> int:
    """floor(chi_m / sigma * TICKS + 1/2) as a Python int literal:
    chi_m = base_sensitivity * sigma / rho^log2(m) (rfi.py:84-85), so
    sigma divides out and the threshold is data-independent."""
    import math

    chi_rel = base_sensitivity / (RHO ** math.log2(m)) if m > 1 \
        else base_sensitivity
    return int(math.floor(chi_rel * TICKS + 0.5))


def _frame(lo: str, hi: str) -> str:
    return f"ROWS BETWEEN {lo} AND {hi}"


def sumthreshold_parts(vis: str = "flagged",
                       median_fn: str = "percentile",
                       base_sensitivity: float = 6.0,
                       prefix: str = "st",
                       vis_is_base: bool = False) -> tuple[str, str]:
    """(CTE chain, final mask SELECT) of SumThreshold over relation
    ``vis`` (the standard vis columns incl. ``flag``). The final SELECT
    yields (ant1, ant2, t, chan, det) for every PRESENT cell, where
    ``det`` is the post-SumThreshold mask (prior flags OR-ed in) —
    callers join it back onto the fact rows and OR into ``flag``.

    ``median_fn``: "percentile" (Spark) / "quantile_cont" (DuckDB) —
    the one dialect split, identical to operators/ssins.py.
    """
    p = prefix
    med = f32(f"CAST({median_fn}(CASE WHEN present THEN amp END, 0.5)"
              f" OVER (PARTITION BY ant1, ant2) AS DOUBLE)")
    mad = f32(f"CAST({median_fn}(CASE WHEN present THEN ad END, 0.5)"
              f" OVER (PARTITION BY ant1, ant2) AS DOUBLE)")
    re_ = "((xx_re + yy_re) / 2E0)"
    im_ = "((xx_im + yy_im) / 2E0)"
    sig = "(1.4826E0 * mad)"
    sig_ok = (f"({sig} > 0E0 AND NOT ISNAN({sig})"
              f" AND ABS({sig}) <> {_INF})")
    tick = (f"CAST(FLOOR(LEAST(GREATEST((amp - med) / {sig},"
            f" {-CLAMP!r}), {CLAMP!r}) * {float(TICKS)!r} + 5E-1)"
            f" AS BIGINT)")
    base_body = (
        # caller already built the image samples (e.g. the streaming
        # twin's drained state, streaming/rfi_stream.py)
        f"SELECT ant1, ant2, t, chan, prior, amp FROM {vis}"
        if vis_is_base else
        # fact-side amplitude image samples (Stokes-I, rfi.py:113-115)
        f"SELECT ant1, ant2, t, chan, flag AS prior,"
        f" SQRT({re_} * {re_} + {im_} * {im_}) AS amp FROM {vis}")
    ctes = [
        (f"{p}_base", base_body),
        # dense per-baseline grid: this baseline's t-set x chan-set
        # (absent cells behave as flagged inside window sums and are
        # never reported, rfi.py:62-66)
        (f"{p}_bt", f"SELECT DISTINCT ant1, ant2, t FROM {p}_base"),
        (f"{p}_bc", f"SELECT DISTINCT ant1, ant2, chan FROM {p}_base"),
        (f"{p}_g0",
         f"SELECT g.ant1, g.ant2, g.t, g.chan,"
         f" COALESCE(b.prior, FALSE) AS prior,"
         f" b.ant1 IS NOT NULL AS present,"
         f" COALESCE(b.amp, 0E0) AS amp"
         f" FROM (SELECT bt.ant1, bt.ant2, bt.t, bc.chan FROM {p}_bt bt"
         f" JOIN {p}_bc bc ON bt.ant1 = bc.ant1 AND bt.ant2 = bc.ant2) g"
         f" LEFT JOIN {p}_base b ON g.ant1 = b.ant1 AND g.ant2 = b.ant2"
         f" AND g.t = b.t AND g.chan = b.chan"),
        # robust stats over present cells only (rfi.py:72-77), as
        # aggregate-as-window so the plan stays linear
        (f"{p}_med",
         f"SELECT *, {med} AS med FROM {p}_g0"),
        (f"{p}_mad",
         f"SELECT ant1, ant2, t, chan, prior, present, amp, med,"
         f" {mad} AS mad FROM"
         f" (SELECT *, {f32('ABS(amp - med)')} AS ad FROM {p}_med)"),
        # integer-tick residuals; work0 = prior | ~present (rfi.py:81)
        (f"{p}_w0",
         f"SELECT ant1, ant2, t, chan, prior, present, amp, med,"
         f" {sig_ok} AS sig_ok,"
         f" CASE WHEN {sig_ok} THEN {tick} ELSE CAST(0 AS BIGINT) END AS rq,"
         f" prior OR NOT present AS work FROM {p}_mad"),
    ]
    carry = "ant1, ant2, t, chan, prior, present, amp, med, sig_ok, rq"
    prev = f"{p}_w0"
    step = 0
    for m in WINDOWS:
        for axis in ("t", "chan"):       # time pass, then freq pass
            part, order = (("chan", "t") if axis == "t" else ("t", "chan"))
            cq = _chi_ticks(base_sensitivity, m)
            over = f"PARTITION BY ant1, ant2, {part} ORDER BY {order}"
            fwd = (_frame("CURRENT ROW", "CURRENT ROW") if m == 1
                   else _frame("CURRENT ROW", f"{m - 1} FOLLOWING"))
            back = (_frame("CURRENT ROW", "CURRENT ROW") if m == 1
                    else _frame(f"{m - 1} PRECEDING", "CURRENT ROW"))
            step += 1
            a, b = f"{p}_p{step}a", f"{p}_p{step}b"
            # window sums of the chi-substituted residuals (rfi.py:41)
            ctes.append(
                (a,
                 f"SELECT {carry}, work,"
                 f" SUM(CASE WHEN work THEN {cq} ELSE rq END)"
                 f" OVER ({over} {fwd}) AS wsum,"
                 f" COUNT(*) OVER ({over} {fwd}) AS wcnt FROM {prev}"))
            # dilate exceeding window starts over their m cells
            ctes.append(
                (b,
                 f"SELECT {carry}, work OR MAX(CASE WHEN wcnt = {m}"
                 f" AND wsum > {cq * m} THEN 1 ELSE 0 END)"
                 f" OVER ({over} {back}) = 1 AS work FROM {a}"))
            prev = b
    cte_text = ",\n".join(f"{n} AS ({body})" for n, body in ctes)
    # flat-image arm: sigma 0 -> anything off the median is RFI
    # (rfi.py:78-80); otherwise (work & present) | prior
    final = (
        f"SELECT ant1, ant2, t, chan,"
        f" CASE WHEN sig_ok THEN work OR prior"
        f" ELSE (amp <> med) OR prior END AS det"
        f" FROM {prev} WHERE present"
    )
    return cte_text, final


def cell_dedup_select(vis: str = "flagged",
                      columns: tuple[str, ...] = ()) -> str:
    """One row per image cell (ant1, ant2, t, chan), deterministically:
    per-column MIN over duplicate rows (flags OR-combined). The synthetic
    driver tables map several lineitem rows onto one correlator cell; the
    reference's data model has exactly one visibility per cell, and the
    UDF island's image-forming write (rfi.py:115) is last-row-wins —
    order-dependent under a shuffle. Both the UDF and relational F9
    surfaces run on this reduction so the operator is deterministic and
    the cross-engine MIN/MAX aggregation is association-free exact."""
    keys = {"ant1", "ant2", "t", "chan"}
    agg = ", ".join(
        c if c in keys
        else "MAX(CASE WHEN flag THEN 1 ELSE 0 END) = 1 AS flag"
        if c == "flag" else f"MIN({c}) AS {c}"
        for c in columns)
    return f"SELECT {agg} FROM {vis} GROUP BY ant1, ant2, t, chan"


def flag_rfi_parts(vis: str = "flagged",
                   median_fn: str = "percentile",
                   base_sensitivity: float = 6.0,
                   columns: tuple[str, ...] = (),
                   prefix: str = "st") -> tuple[str, str]:
    """(CTE chain incl. the mask, final SELECT) yielding ``vis`` with the
    SumThreshold mask OR-ed into ``flag`` (the F9 operator's output
    contract, rfi.py:93-130). Splice the chain into a WITH that already
    binds ``vis``."""
    ctes, mask = sumthreshold_parts(vis, median_fn, base_sensitivity,
                                    prefix)
    out_cols = ", ".join(
        "(v.flag OR m.det) AS flag" if c == "flag" else f"v.{c}"
        for c in columns)
    final = (
        f"SELECT {out_cols} FROM {vis} v JOIN {prefix}_mask m"
        f" ON v.ant1 = m.ant1 AND v.ant2 = m.ant2"
        f" AND v.t = m.t AND v.chan = m.chan"
    )
    return f"{ctes},\n{prefix}_mask AS ({mask})", final


# ------------------------------------------------- SIR morphology ---

def sir_parts(mask: str = "st_mask", eta: float = 0.2,
              prefix: str = "sir") -> tuple[str, str]:
    """(CTE chain, final SELECT) of the scale-invariant-rank dilation
    (Offringa & van de Gronde 2012 — the morphological post-pass of
    AOFlagger's strategy, reference src/flags.rs:368-437 via FFI) over a
    mask relation (ant1, ant2, t, chan, det): time direction, then
    frequency on the time-dilated mask (rfi.py::sir_mask).

    Per 1-D pass: with integer-tick weights w = eta*D (flagged) /
    (eta-1)*D (unflagged) and P the exclusive prefix sum, sample i
    dilates iff max_{k>i} P(k) - min_{j<=i} P(j) >= 0 — a running sum,
    a forward running max, and a backward running min: three window
    layers, all BIGINT (association-exact in both engines)."""
    from birli_spark.operators.rfi import SIR_D

    en = int(round(eta * SIR_D))
    p = prefix

    def pass_ctes(src: str, part: str, order: str,
                  tag: str) -> list[tuple[str, str]]:
        over = f"PARTITION BY ant1, ant2, {part} ORDER BY {order}"
        return [
            (f"{p}_{tag}p",
             f"SELECT ant1, ant2, t, chan, det,"
             f" SUM(CASE WHEN det THEN {en} ELSE {en - SIR_D} END)"
             f" OVER ({over} ROWS BETWEEN UNBOUNDED PRECEDING AND"
             f" CURRENT ROW) AS p_incl,"
             f" CASE WHEN det THEN {en} ELSE {en - SIR_D} END AS w"
             f" FROM {src}"),
            (f"{p}_{tag}o",
             f"SELECT ant1, ant2, t, chan,"
             f" MAX(p_incl) OVER ({over} ROWS BETWEEN CURRENT ROW AND"
             f" UNBOUNDED FOLLOWING)"
             f" - MIN(p_incl - w) OVER ({over} ROWS BETWEEN UNBOUNDED"
             f" PRECEDING AND CURRENT ROW) >= 0 AS det"
             f" FROM {p}_{tag}p"),
        ]

    ctes = (pass_ctes(mask, "chan", "t", "t")
            + pass_ctes(f"{p}_to", "t", "chan", "f"))
    cte_text = ",\n".join(f"{n} AS ({b})" for n, b in ctes)
    final = f"SELECT ant1, ant2, t, chan, det FROM {p}_fo"
    return cte_text, final
