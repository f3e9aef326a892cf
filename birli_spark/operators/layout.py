"""L1 — Z-order (Morton-curve) data layout for multi-dimension skipping.

The reference reads its cube in (timestep, coarse-chan) file order
(src/io/mod.rs:150-319), which serves time-range queries but scatters any
baseline-range selection across every file. At 100 TB the standard fix is
**Z-ordering the sort key at write time**: interleave the bits of the
pruning columns so a file's row-group min/max envelope is tight in BOTH
dimensions, and either predicate prunes ~sqrt-fraction of files instead
of none (the technique behind Delta/Iceberg ``ZORDER BY``; Morton 1966).

This operator computes the z-value as a pure integer projection (bit
interleave via shift/AND — whole-stage codegen, no shuffle), assigns rows
to equal-width z-ranges ("files" — at scale this is
``repartitionByRange(z)`` + sorted parquet write so min/max statistics
align with the ranges), and reports each file's (t, bl) bounding box.
The per-file spans ARE the data-skipping proof: with ``nbits=4`` and 16
files, each file covers a 4×16 or 16×4 rectangle of the 16×16 (t, bl)
grid — a ``t`` predicate hits 4/16 files and a ``bl`` predicate 4/16,
where time-major layout gives 16/16 for ``bl``. The oracle replays the
identical integer arithmetic in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bits per dimension (t and bl are 0..15 in the synthetic obs)
Z_BITS = 4
#: number of equal-width z-range "files"
Z_FILES = 16


def _z_expr(d: str, a: str, b: str, nbits: int = Z_BITS) -> str:
    """Morton interleave: bit i of ``a`` → z bit 2i+1, bit i of ``b`` →
    z bit 2i. Spark spells shifts as functions, DuckDB as operators; the
    expression tree (and the integer result) is identical."""
    parts = []
    for i in range(nbits):
        if d == "spark":
            abit = f"(shiftright({a}, {i}) & 1)"
            bbit = f"(shiftright({b}, {i}) & 1)"
            parts.append(f"shiftleft({abit}, {2 * i + 1})")
            parts.append(f"shiftleft({bbit}, {2 * i})")
        else:
            parts.append(f"(((({a}) >> {i}) & 1) << {2 * i + 1})")
            parts.append(f"(((({b}) >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(parts) + ")"


def zorder_layout_stats(vis: DataFrame, nbits: int = Z_BITS,
                        n_files: int = Z_FILES) -> DataFrame:
    """Per-z-range file statistics: row count and the (t, bl) min/max
    envelope a parquet footer would carry. ``repartitionByRange`` on the
    z-value is the write-side realization; here the range assignment is
    the explicit ``z div width`` so the oracle is exact."""
    width = (1 << (2 * nbits)) // n_files
    z = F.expr(_z_expr("spark", "t", "bl", nbits))
    return (vis
            .withColumn("z", z)
            .withColumn("file_id", F.expr(f"CAST(z div {width} AS INT)"))
            .groupBy("file_id")
            .agg(F.count("*").alias("n_rows"),
                 F.min("t").alias("t_min"), F.max("t").alias("t_max"),
                 F.min("bl").alias("bl_min"), F.max("bl").alias("bl_max"))
            .select("file_id", "n_rows", "t_min", "t_max", "bl_min", "bl_max",
                    (F.col("t_max") - F.col("t_min") + 1).alias("t_span"),
                    (F.col("bl_max") - F.col("bl_min") + 1).alias("bl_span")))


def zorder_layout_oracle_select(vis_rel: str, nbits: int = Z_BITS,
                                n_files: int = Z_FILES) -> str:
    width = (1 << (2 * nbits)) // n_files
    zq = _z_expr("duck", "t", "bl", nbits)
    return f"""
SELECT file_id, COUNT(*) AS n_rows,
  MIN(t) AS t_min, MAX(t) AS t_max,
  MIN(bl) AS bl_min, MAX(bl) AS bl_max,
  MAX(t) - MIN(t) + 1 AS t_span,
  MAX(bl) - MIN(bl) + 1 AS bl_span
FROM (SELECT t, bl, CAST(FLOOR({zq} / {width}) AS INT) AS file_id
      FROM {vis_rel})
GROUP BY file_id"""
