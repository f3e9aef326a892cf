"""A1 — time/frequency averaging ("scrunching"), the flagship groupBy
(SURVEY.md §2.6).

The reference delegates this to its writers (marlu ``write_vis`` with
avg_time/avg_freq factors, src/cli.rs:1882-1927; src/io/mod.rs:460, 589).
Semantics: for each (t block × chan block × baseline) cell,
  - the weighted mean of **unflagged** samples (weight > 0 after the
    flag→weight baking, src/cli.rs:1874-1880), output weight = sum of the
    contributing (positive) weights, flag = false;
  - if ALL samples in the cell are flagged: plain mean of all samples,
    output weight = (negative) sum of all weights, flag = true.
Block indices use ceil-division edges — a trailing partial block is still a
block (reference test expectation src/bin/birli.rs:51-56). Output centroid
times/freqs are at block centres (src/bin/birli.rs:262-266).

Spark shape: single hash aggregation with map-side partial aggregation —
the one unavoidable shuffle of the pipeline, keyed (t_out, chan_out, bl), so
cardinality shrinks by avg_time*avg_freq before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from birli_spark.functions.complex import VIS_COLS, f32

GROUP_KEYS = ("t_out", "chan_out", "bl", "ant1", "ant2")


def _avg_fragments(extra_mean_cols: tuple[str, ...] = ()) -> dict[str, str]:
    frags: dict[str, str] = {}
    n_unflagged = "SUM(CASE WHEN weight > 0 THEN 1 ELSE 0 END)"
    wsum_pos = "SUM(CASE WHEN weight > 0 THEN weight ELSE 0.0 END)"
    for c in VIS_COLS:
        wmean = f"SUM(CASE WHEN weight > 0 THEN ({c}) * weight ELSE 0.0 END) / ({wsum_pos})"
        frags[c] = f32(f"CASE WHEN {n_unflagged} > 0 THEN {wmean} ELSE AVG({c}) END")
    frags["weight"] = f32(
        f"CASE WHEN {n_unflagged} > 0 THEN {wsum_pos} ELSE SUM(weight) END"
    )
    frags["flag"] = f"({n_unflagged} = 0)"
    frags["n_samples"] = "CAST(COUNT(*) AS BIGINT)"
    for c in extra_mean_cols:
        # plain (unweighted) block mean — used for per-block UVWs at the
        # UVFITS sink; f32-demoted like every float aggregate
        frags[c] = f32(f"AVG({c})")
    return frags


def _key_fragments(avg_time: int, avg_freq: int) -> dict[str, str]:
    return {
        "t_out": f"CAST(FLOOR(t / {avg_time}) AS INT)",
        "chan_out": f"CAST(FLOOR(chan / {avg_freq}) AS INT)",
    }


def average_time_freq(vis: DataFrame, avg_time: int, avg_freq: int,
                      extra_mean_cols: tuple[str, ...] = ()) -> DataFrame:
    """Weighted block average over (t div avg_time, chan div avg_freq, bl).

    Input must already have flags baked into weight signs
    (``weights.bake_flags_into_weights``). ``extra_mean_cols`` are carried
    through as plain f32 block means (e.g. per-block UVWs for the sink).
    """
    keys = _key_fragments(avg_time, avg_freq)
    frags = _avg_fragments(extra_mean_cols)
    grouped = vis.withColumn("t_out", F.expr(keys["t_out"])).withColumn(
        "chan_out", F.expr(keys["chan_out"])
    )
    return (
        grouped.groupBy(*GROUP_KEYS)
        .agg(*[F.expr(frag).alias(name) for name, frag in frags.items()])
    )


def averaging_oracle_select(vis: str = "vis", avg_time: int = 2,
                            avg_freq: int = 2,
                            extra_mean_cols: tuple[str, ...] = ()) -> str:
    keys = _key_fragments(avg_time, avg_freq)
    frags = _avg_fragments(extra_mean_cols)
    key_cols = ", ".join(
        [f"{keys['t_out']} AS t_out", f"{keys['chan_out']} AS chan_out",
         "bl", "ant1", "ant2"]
    )
    agg_cols = ", ".join(f"{frag} AS {name}" for name, frag in frags.items())
    return (
        f"SELECT {key_cols}, {agg_cols} FROM {vis}"
        f" GROUP BY {keys['t_out']}, {keys['chan_out']}, bl, ant1, ant2"
    )
