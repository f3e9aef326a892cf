"""IM1 (beyond-reference) — uv-plane gridding, the imaging handoff.

The reference stops at writing corrected visibilities (UVFITS/MS,
SURVEY.md §2.7); the next tool in the MWA chain (WSClean/imagers) bins
them onto a uv-plane grid. Natural-weighted gridding is relationally just
the A1 averaging shape with a different key: cell = (chan,
floor(u·f/c/du), floor(v·f/c/dv)) in wavelength units, value = weighted
mean of the unflagged samples, weight = sum of contributing weights.

Spark shape: one partial+final hash aggregation keyed on the cell — the
grid is tiny relative to the visibility table (cells ≪ rows at 100 TB),
so the map-side combine collapses almost all of the data before the
exchange. Autocorrelations (u = v = 0) are excluded as imagers do.

The same fragment text is the DuckDB oracle; floats go through the f32
demotion (functions/complex.py) so cross-engine hashes are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from birli_spark.functions.complex import (
    POLS,
    SPEED_OF_LIGHT_M_S,
    f32,
)

#: default cell size in wavelengths (typical MWA snapshot gridding uses
#: a few wavelengths per cell; the synthetic fixture baselines span a few)
DEFAULT_CELL_LAMBDA = 0.5


def _cell(axis: str, cell_lambda: float) -> str:
    # u, v are in metres (geometry emits baseline UVWs, reference
    # src/corrections.rs:277); scale to wavelengths at the row's frequency
    return (f"CAST(FLOOR(({axis} * freq_hz / {SPEED_OF_LIGHT_M_S!r})"
            f" / {cell_lambda!r}) AS INT)")


def uv_grid_fragments(cell_lambda: float = DEFAULT_CELL_LAMBDA
                      ) -> tuple[dict[str, str], dict[str, str]]:
    """(key fragments, aggregate fragments) for the gridding groupBy.

    Expects a vis relation that already carries (u, v) from the geometric
    correction (operators/corrections.py::correct_geometry) and baked
    signed weights (flag → negative, operators/weights.py).
    """
    keys = {
        "chan": "chan",
        "u_cell": _cell("u", cell_lambda),
        "v_cell": _cell("v", cell_lambda),
    }
    wsum_pos = "SUM(CASE WHEN weight > 0 THEN weight ELSE 0.0 END)"
    n_pos = "SUM(CASE WHEN weight > 0 THEN 1 ELSE 0 END)"
    aggs: dict[str, str] = {}
    for p in POLS:
        for c in ("re", "im"):
            # guard the division so an all-flagged cell yields 0.0, not
            # 0.0/0.0 = NaN — the rows are dropped by the n_vis filter /
            # HAVING either way, but this keeps the cross-engine hash
            # independent of whether each engine prunes the group before
            # or after projecting the aggregate
            aggs[f"{p}_{c}"] = f32(
                f"CASE WHEN {n_pos} > 0 THEN "
                f"SUM(CASE WHEN weight > 0 THEN ({p}_{c}) * weight"
                f" ELSE 0.0 END) / ({wsum_pos}) ELSE 0.0 END")
    aggs["grid_weight"] = f32(wsum_pos)
    aggs["n_vis"] = "CAST(SUM(CASE WHEN weight > 0 THEN 1 ELSE 0 END) AS BIGINT)"
    return keys, aggs


def uv_grid(vis: DataFrame,
            cell_lambda: float = DEFAULT_CELL_LAMBDA) -> DataFrame:
    """Natural-weighted uv-grid of a geometry-corrected, weight-baked vis
    DataFrame. Cells with no unflagged sample are dropped (an imager
    leaves them empty)."""
    keys, aggs = uv_grid_fragments(cell_lambda)
    return (
        vis.filter(F.col("ant1") != F.col("ant2"))
        .groupBy(*(F.expr(frag).alias(name) for name, frag in keys.items()))
        .agg(*(F.expr(frag).alias(name) for name, frag in aggs.items()))
        .filter(F.col("n_vis") > 0)
    )


def uv_grid_uniform_fragments(cell_lambda: float = DEFAULT_CELL_LAMBDA
                              ) -> tuple[dict[str, str], dict[str, str]]:
    """Uniform-weighting combine: every unflagged visibility in a cell
    contributes equally (each sample effectively reweighted by 1/N_cell)
    — the imager's ``-weight uniform`` counterpart to the natural
    weighting of :func:`uv_grid_fragments`."""
    keys, _ = uv_grid_fragments(cell_lambda)
    n_pos = "SUM(CASE WHEN weight > 0 THEN 1 ELSE 0 END)"
    aggs: dict[str, str] = {}
    for p in POLS:
        for c in ("re", "im"):
            # same all-flagged-cell division guard as the natural variant
            aggs[f"{p}_{c}"] = f32(
                f"CASE WHEN {n_pos} > 0 THEN "
                f"SUM(CASE WHEN weight > 0 THEN ({p}_{c})"
                f" ELSE 0.0 END) / ({n_pos}) ELSE 0.0 END")
    aggs["n_vis"] = f"CAST({n_pos} AS BIGINT)"
    return keys, aggs


def uv_grid_uniform(vis: DataFrame,
                    cell_lambda: float = DEFAULT_CELL_LAMBDA) -> DataFrame:
    """Uniform-weighted uv-grid — same single partial+final aggregation
    shape as :func:`uv_grid`; only the combine expressions differ."""
    keys, aggs = uv_grid_uniform_fragments(cell_lambda)
    return (
        vis.filter(F.col("ant1") != F.col("ant2"))
        .groupBy(*(F.expr(frag).alias(name) for name, frag in keys.items()))
        .agg(*(F.expr(frag).alias(name) for name, frag in aggs.items()))
        .filter(F.col("n_vis") > 0)
    )


def uv_grid_uniform_oracle_select(vis: str = "vis",
                                  cell_lambda: float = DEFAULT_CELL_LAMBDA
                                  ) -> str:
    keys, aggs = uv_grid_uniform_fragments(cell_lambda)
    key_cols = ", ".join(f"{frag} AS {name}" for name, frag in keys.items())
    agg_cols = ", ".join(f"{frag} AS {name}" for name, frag in aggs.items())
    group = ", ".join(str(i + 1) for i in range(len(keys)))
    return (
        f"SELECT {key_cols}, {agg_cols} FROM {vis}"
        f" WHERE ant1 <> ant2"
        f" GROUP BY {group}"
        f" HAVING SUM(CASE WHEN weight > 0 THEN 1 ELSE 0 END) > 0"
    )


def uv_grid_oracle_select(vis: str = "vis",
                          cell_lambda: float = DEFAULT_CELL_LAMBDA) -> str:
    """The same gridding as ANSI SQL over a relation with (u, v, weight)."""
    keys, aggs = uv_grid_fragments(cell_lambda)
    key_cols = ", ".join(f"{frag} AS {name}" for name, frag in keys.items())
    agg_cols = ", ".join(f"{frag} AS {name}" for name, frag in aggs.items())
    group = ", ".join(str(i + 1) for i in range(len(keys)))
    return (
        f"SELECT {key_cols}, {agg_cols} FROM {vis}"
        f" WHERE ant1 <> ant2"
        f" GROUP BY {group}"
        f" HAVING SUM(CASE WHEN weight > 0 THEN 1 ELSE 0 END) > 0"
    )


# ------------------------------------------------------------------ IM4 ---

#: dirty-image size (pixels per axis) — the DFT pixel grid; pixel p
#: maps to direction cosine l = p / (IMG_L * cell_lambda) by the
#: standard gridded-DFT relation, so the kernel angle is exactly
#: 2*pi * u_cell * p / IMG_L
IMG_L = 8
#: gridded-aperture clip: cells with |u_cell| or |v_cell| beyond this
#: are EXPLICITLY excluded (a declared aperture, like an imager's
#: gridded field — not a silent join drop); covers the synthetic
#: geometry with wide margin (measured at sf0.1: u_cell in [-5, 4],
#: v_cell in [-4, 3])
IMG_APERTURE = 24
#: integer-tick scales (house pattern, cf. operators/delay.py): grid
#: values clamp at IMG_CLAMP then quantize half-up to IMG_GT ticks;
#: each 1-D kernel factor to IMG_CT ticks. Exactness bound: the
#: channel-stacked cell value is clamped AGAIN after the stack sum to
#: +-IMG_CLAMP*IMG_GT = 2^20 ticks (so the bound is independent of the
#: channel count), the kernel product magnitude is <= 2*IMG_CT^2 =
#: 2^25, and the per-pixel sum spans <= (2*IMG_APERTURE + 1)^2 < 2^12
#: cells: |sum| < 2^(20+25+12) = 2^57 — every BIGINT accumulation is
#: exact in any association.
IMG_GT = 1 << 10
IMG_CT = 1 << 12
IMG_CLAMP = 1024.0


def image_kernel_values(axis_cell: str) -> str:
    """One axis of the separable DFT kernel as literal integer ticks:
    rows (cell, p, kre, kim) with k = exp(+2*pi*i * cell * p / IMG_L),
    quantized DRIVER-side so Spark and DuckDB consume the IDENTICAL
    literals (no cross-engine trig). cell spans the declared aperture;
    p spans the centred pixel indices -IMG_L/2 .. IMG_L/2-1."""
    import math
    rows = []
    for cell in range(-IMG_APERTURE, IMG_APERTURE + 1):
        for p in range(-IMG_L // 2, IMG_L // 2):
            ang = 2.0 * math.pi * cell * p / IMG_L
            kre = int(math.floor(math.cos(ang) * IMG_CT + 0.5))
            kim = int(math.floor(math.sin(ang) * IMG_CT + 0.5))
            rows.append(f"({cell}, {p}, {kre}, {kim})")
    return (f"SELECT CAST(c AS INT) AS {axis_cell},"
            f" CAST(p AS INT) AS p, CAST(kre AS BIGINT) AS kre,"
            f" CAST(kim AS BIGINT) AS kim"
            f" FROM (VALUES {', '.join(rows)}) AS k(c, p, kre, kim)")


def dirty_image_select(grid: str) -> str:
    """IM4 — dirty image from a natural-weighted uv grid (dialect-
    common text; the relation is :func:`uv_grid`'s output).

    Multi-frequency synthesis stacks the per-channel grids (BIGINT tick
    sum over chan of the Stokes-I combination (xx + yy) / 2, re-clamped
    after the stack so the exactness bound is channel-count-
    independent), then the image is the real part of the inverse DFT of
    the gridded aperture: ``I(l, m) = Re( sum_cells G(u,v) k_u(l)
    k_v(m) )``. NO Hermitian doubling is applied: the grid's plane
    coverage is whatever the input visibilities carry (the synthetic
    fact holds BOTH orderings of every baseline, i.e. a full plane;
    a single-ordering real scan yields a half plane whose real-part
    image is the half-amplitude dirty map — amplitude convention, not
    a defect, and callers wanting the doubled convention can scale).
    The kernel is SEPARABLE: two tiny literal dims (one per axis),
    each a broadcast join — the transform runs entirely on the
    dim-sized grid (the fact-scale work already happened in the IM1
    aggregation; at 100 TB this stage is bounded by
    aperture^2 x pixels^2, not by data volume)."""
    half = IMG_CLAMP
    g_re = (f"(CASE WHEN (xx_re + yy_re) / 2.0 > {half!r} THEN {half!r}"
            f" WHEN (xx_re + yy_re) / 2.0 < -{half!r} THEN -{half!r}"
            f" ELSE (xx_re + yy_re) / 2.0 END)")
    g_im = (f"(CASE WHEN (xx_im + yy_im) / 2.0 > {half!r} THEN {half!r}"
            f" WHEN (xx_im + yy_im) / 2.0 < -{half!r} THEN -{half!r}"
            f" ELSE (xx_im + yy_im) / 2.0 END)")
    t_re = f"CAST(FLOOR({g_re} * {IMG_GT} + 0.5) AS BIGINT)"
    t_im = f"CAST(FLOOR({g_im} * {IMG_GT} + 0.5) AS BIGINT)"
    scale = float(IMG_GT) * IMG_CT * IMG_CT
    # k = ku * kv (exact integer complex product); the image takes
    # Re(G * k) = g_re*k_re - g_im*k_im
    img_expr = f32(
        "SUM(g_re * (ku.kre * kv.kre - ku.kim * kv.kim)"
        " - g_im * (ku.kre * kv.kim + ku.kim * kv.kre))"
        f" / CAST({scale!r} AS DOUBLE)")
    # re-clamp the stacked sums so the downstream exactness bound does
    # not depend on the channel count (see the IMG_* comment)
    tick_cap = int(IMG_CLAMP) * IMG_GT

    def _clamped(expr: str) -> str:
        return (f"LEAST(GREATEST(SUM({expr}),"
                f" CAST(-{tick_cap} AS BIGINT)),"
                f" CAST({tick_cap} AS BIGINT))")

    # pure subqueries (no WITH) so the whole text embeds as one CTE
    # member of the driver oracle
    stacked = (
        f"SELECT u_cell, v_cell, {_clamped(t_re)} AS g_re,"
        f" {_clamped(t_im)} AS g_im,"
        f" CAST(SUM(n_vis) AS BIGINT) AS n_vis"
        f" FROM {grid}"
        f" WHERE u_cell BETWEEN -{IMG_APERTURE} AND {IMG_APERTURE}"
        f" AND v_cell BETWEEN -{IMG_APERTURE} AND {IMG_APERTURE}"
        f" GROUP BY u_cell, v_cell")
    return (
        f"SELECT ku.p AS lp, kv.p AS mp,"
        f" {img_expr} AS img,"
        f" CAST(SUM(n_vis) AS BIGINT) AS n_vis_total"
        f" FROM ({stacked}) stacked"
        f" JOIN ({image_kernel_values('u_cell')}) ku"
        f" ON ku.u_cell = stacked.u_cell"
        f" JOIN ({image_kernel_values('v_cell')}) kv"
        f" ON kv.v_cell = stacked.v_cell"
        f" GROUP BY ku.p, kv.p"
    )


def dirty_image(vis: DataFrame,
                cell_lambda: float = DEFAULT_CELL_LAMBDA) -> DataFrame:
    """IM4 as a DataFrame op: IM1's natural gridding then the exact-tick
    separable DFT (two broadcast joins over literal kernel dims + one
    dim-sized aggregation)."""
    spark = vis.sparkSession
    uv_grid(vis, cell_lambda).createOrReplaceTempView("im4_grid")
    return spark.sql(dirty_image_select("im4_grid"))


def psf_image_select(grid: str) -> str:
    """IM5 — the point-spread function: the same inverse DFT over the
    grid's WEIGHT plane (g = sum of grid_weight ticks, purely real) —
    the synthesized beam an imager deconvolves the IM4 dirty map with.
    Shares IM4's kernel dims, aperture clip, and exactness bound."""
    t_w = (f"CAST(FLOOR((CASE WHEN grid_weight > {IMG_CLAMP!r}"
           f" THEN {IMG_CLAMP!r} ELSE grid_weight END)"
           f" * {IMG_GT} + 0.5) AS BIGINT)")
    tick_cap = int(IMG_CLAMP) * IMG_GT
    scale = float(IMG_GT) * IMG_CT * IMG_CT
    img_expr = f32(
        "SUM(g_w * (ku.kre * kv.kre - ku.kim * kv.kim))"
        f" / CAST({scale!r} AS DOUBLE)")
    stacked = (
        f"SELECT u_cell, v_cell,"
        f" LEAST(GREATEST(SUM({t_w}), CAST(-{tick_cap} AS BIGINT)),"
        f" CAST({tick_cap} AS BIGINT)) AS g_w,"
        f" CAST(SUM(n_vis) AS BIGINT) AS n_vis"
        f" FROM {grid}"
        f" WHERE u_cell BETWEEN -{IMG_APERTURE} AND {IMG_APERTURE}"
        f" AND v_cell BETWEEN -{IMG_APERTURE} AND {IMG_APERTURE}"
        f" GROUP BY u_cell, v_cell")
    return (
        f"SELECT ku.p AS lp, kv.p AS mp,"
        f" {img_expr} AS psf,"
        f" CAST(SUM(n_vis) AS BIGINT) AS n_vis_total"
        f" FROM ({stacked}) stacked"
        f" JOIN ({image_kernel_values('u_cell')}) ku"
        f" ON ku.u_cell = stacked.u_cell"
        f" JOIN ({image_kernel_values('v_cell')}) kv"
        f" ON kv.v_cell = stacked.v_cell"
        f" GROUP BY ku.p, kv.p"
    )


def psf_image(vis: DataFrame,
              cell_lambda: float = DEFAULT_CELL_LAMBDA) -> DataFrame:
    """IM5 as a DataFrame op over IM1's natural grid."""
    spark = vis.sparkSession
    uv_grid(vis, cell_lambda).createOrReplaceTempView("im5_grid")
    return spark.sql(psf_image_select("im5_grid"))
