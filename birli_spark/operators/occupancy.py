"""A2/A3 — flag-occupancy statistics (SURVEY.md §2.6).

The reference accumulates per-fine-channel and per-baseline counts of set
flags while writing .mwaf files, and emits CH_OCC / BL_OCC HDUs with
(Index, Count, Occupancy = count/rows) (src/io/mwaf.rs:457-470, 528-628).

Spark shape: two tiny hash aggregations with map-side combine; output
cardinality = channels resp. baselines, independent of fact size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from birli_spark.functions.complex import f32

_AGGS = {
    "n_rows": "CAST(COUNT(*) AS BIGINT)",
    "n_flagged": "CAST(SUM(CASE WHEN flag THEN 1 ELSE 0 END) AS BIGINT)",
    "occupancy": f32(
        "CAST(SUM(CASE WHEN flag THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)"
    ),
}


def channel_occupancy(vis: DataFrame) -> DataFrame:
    """A2 — per (coarse, fine) channel flag occupancy
    (reference CH_OCC, src/io/mwaf.rs:457-470, 528-560)."""
    return vis.groupBy("cc", "fc").agg(
        *[F.expr(frag).alias(name) for name, frag in _AGGS.items()]
    )


def baseline_occupancy(vis: DataFrame) -> DataFrame:
    """A3 — per baseline flag occupancy
    (reference BL_OCC, src/io/mwaf.rs:560-628)."""
    return vis.groupBy("ant1", "ant2").agg(
        *[F.expr(frag).alias(name) for name, frag in _AGGS.items()]
    )


def occupancy_oracle_select(vis: str = "vis", keys: tuple[str, ...] = ("cc", "fc")) -> str:
    key_cols = ", ".join(keys)
    agg_cols = ", ".join(f"{frag} AS {name}" for name, frag in _AGGS.items())
    return f"SELECT {key_cols}, {agg_cols} FROM {vis} GROUP BY {key_cols}"
