"""O4 — dry-run / describe (SURVEY.md §2.7; reference's observation
summary Display + ``--dry-run``, src/cli.rs:242-620, 1513-1515).

One long-format summary row per statistic: selection extents, distinct
dimension counts, and the memory estimate the reference derives for
chunking (bytes/timestep, src/cli.rs:1260-1331 — here total bytes at
8 f32 pol values + f32 weight + bool flag per cell = 37 bytes/row).

The SQL is dialect-common (COUNT DISTINCT + UNION ALL), so the same text
runs on Spark and DuckDB. One pass over the fact table per statistic at
worst — Spark computes them as independent tiny aggregates; at scale one
would fuse them into a single multi-aggregate scan, kept separate here
for the shared-text oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

BYTES_PER_ROW = 8 * 4 + 4 + 1  # 8 f32 pol values + f32 weight + bool flag

_STATS: tuple[tuple[str, str], ...] = (
    ("n_rows", "COUNT(*)"),
    ("n_timesteps", "COUNT(DISTINCT t)"),
    ("n_baselines", "COUNT(DISTINCT bl)"),
    ("n_antennas", "COUNT(DISTINCT ant1)"),
    ("n_coarse_chans", "COUNT(DISTINCT cc)"),
    ("n_fine_chans", "COUNT(DISTINCT chan)"),
    ("t_min", "MIN(t)"), ("t_max", "MAX(t)"),
    ("freq_min_hz", "CAST(MIN(freq_hz) AS BIGINT)"),
    ("freq_max_hz", "CAST(MAX(freq_hz) AS BIGINT)"),
    ("est_vis_bytes", f"COUNT(*) * {BYTES_PER_ROW}"),
)


def describe_sql(vis_table: str = "vis") -> str:
    selects = [
        f"SELECT '{name}' AS stat, CAST({expr} AS BIGINT) AS value"
        f" FROM {vis_table}"
        for name, expr in _STATS]
    return "\nUNION ALL\n".join(selects)


def describe(spark: SparkSession, vis: DataFrame) -> DataFrame:
    vis.createOrReplaceTempView("vis_describe")
    return spark.sql(describe_sql("vis_describe"))
