"""Streaming histogram quantile sketch: the incremental twin of
``operators/sketches.hist_quantiles`` (SK5).

The histogram IS the streaming-friendly quantile summary: per-bin
counts are additive, so the stream is just a native
``groupBy(bin).count()`` stateful aggregation — no custom state, no
UDF; the state store holds ≤ nbins counters total, sharded by bin.
Quantile estimation replays the same interpolation as the batch sketch
over the final counter table (:func:`quantiles_from_bins`), giving
exact batch parity.

Scale: state is O(nbins) regardless of stream length — the smallest
possible stateful-aggregation footprint; watermarking is unnecessary
because bins are value-buckets, not time windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from birli_spark.operators.sketches import (HIST_BINS, HIST_HI, HIST_LO,
                                            HIST_PS)
# one source of truth for the documents stream source (schema drift in a
# caller-supplied file-source schema silently reads nulls)
from birli_spark.streaming.dedup import (DOCS_SCHEMA,  # noqa: F401
                                         read_documents_stream)


def hist_stream(stream: DataFrame, lo: int = HIST_LO, hi: int = HIST_HI,
                nbins: int = HIST_BINS) -> DataFrame:
    """Native streaming per-bin count — additive state, ≤ nbins rows."""
    w = (hi - lo) / nbins
    binx = (f"LEAST(CAST({nbins - 1} AS INT), GREATEST(0, "
            f"CAST(FLOOR((CAST(n_chars AS DOUBLE) - {lo}) / {w!r}) AS INT)))")
    return (stream.select(F.expr(binx).alias("bin"))
            .groupBy("bin").count())


def quantiles_from_bins(bins: DataFrame, lo: int = HIST_LO,
                        hi: int = HIST_HI, nbins: int = HIST_BINS,
                        ps: tuple = HIST_PS) -> DataFrame:
    """Batch-identical interpolation over the final counter table."""
    from pyspark.sql import Window
    w = (hi - lo) / nbins
    wspec = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cum = (bins.withColumnRenamed("count", "cnt")
           .withColumn("cum", F.sum("cnt").over(wspec))
           .withColumn("cumb", F.expr("cum - cnt")))
    n_tot = bins.agg(F.sum("count").alias("n"))
    pdf_ = ", ".join(f"CAST({p!r} AS DOUBLE)" for p in ps)
    p_rows = (n_tot.select(
        F.explode(F.expr(f"array({pdf_})")).alias("p"), "n")
        .withColumn("target", F.expr("p * CAST(n AS DOUBLE)")))
    est = (f"{lo} + {w!r} * (CAST(bin AS DOUBLE) + "
           f"(target - CAST(cumb AS DOUBLE)) / CAST(cnt AS DOUBLE))")
    from birli_spark.functions.complex import f32
    return (p_rows.join(cum, F.expr("CAST(cum AS DOUBLE) >= target"))
            .groupBy("p", "target")
            .agg(F.expr("MIN(struct(bin, cnt, cum, cumb))").alias("s"))
            .select("p", "target",
                    F.col("s.bin").cast("int").alias("bin"),
                    F.expr("s.cnt AS cnt"), F.expr("s.cumb AS cumb"))
            .withColumn("hist_q", F.expr(f32(est)))
            .select("p", "bin", "hist_q"))


def run_available_now(spark: SparkSession, sf_dir: str,
                      query_name: str = "stream_hist") -> DataFrame:
    out = hist_stream(read_documents_stream(spark, sf_dir))
    from birli_spark.streaming import drain_to_memory
    return drain_to_memory(out, query_name, "complete")


def hist_stream_oracle_sql() -> str:
    """The BATCH sk5 oracle minus its exact-percentile baseline column —
    per-bin counts are additive, so the drained counters equal the batch
    histogram and the same interpolation yields identical quantiles."""
    from birli_spark.operators.sketches import hist_quantiles_oracle_sql
    return (f"SELECT p, bin, hist_q FROM "
            f"({hist_quantiles_oracle_sql()}\n) q")
