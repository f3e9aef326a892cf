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
