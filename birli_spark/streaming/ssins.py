"""Streaming SSINS: the stateful twin of ``operators/ssins.py`` (F11) —
live RFI monitoring while an observation is still being written.

The batch operator lag-windows adjacent timesteps per (bl, chan); the
stream carries exactly that window as state: **8 doubles (the last
cell's f32-demoted pol values) + the last timestep index per (bl,
chan)** — O(1) per key, never re-reading history. Each micro-batch (a
newly-arrived gpubox time segment, sources/gpubox.py S1f) folds its
cell means in time order against the carried cell, emitting per-
baseline difference amplitudes; the incoherent (t, chan) noise image
and the median/MAD scoring then run **relationally over the drained
amplitudes** (the same post-algebra pattern as the theta/KMV streaming
twins).

Parity is exact, not tolerance: the transition performs the identical
f64 arithmetic with the identical f32 demotions as the batch SQL
(functions/complex.py:f32), and both engines see f32-representable
cell values, so the subtraction is exact and the hashes match.

**Ordering assumption** (same as the EWMA twin): micro-batches arrive
in per-key time order — true for the correlator's append-only feed and
the availableNow file source. The batch LAG diffs adjacent *rows* (not
t, t−1 pairs), so gaps behave identically in both forms.

**Cell-completeness assumption** (stronger, and *enforced*): every row
of a (bl, chan, t) cell arrives in ONE micro-batch, because the mean is
folded per micro-batch and the output mode is append (an emitted
amplitude cannot be retracted when more rows for the same t arrive
later). This holds for both supported layouts — the driver's one-file
tables and the gpubox one-file-per-(coarse-channel, time-segment)
stream, where a cell's chan maps to exactly one cc and its t to exactly
one segment, and Spark's file source never splits a single file across
micro-batches. A multi-part parquet directory that scatters one cell's
rows over part files *violates* it; rather than silently emitting two
amplitudes for the same t (diverging from the batch ``ssins_ins`` CTE),
the transition raises when a batch's earliest t does not advance past
the carried state's last t. Remedy: coalesce to cell-aligned files or
run the batch operator.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, IntegerType, LongType,
                               StructField, StructType)

from birli_spark.functions.complex import POLS, VIS_COLS, f32
from birli_spark.sources import synthetic as syn

OUTPUT_SCHEMA = StructType(
    [StructField("t", IntegerType()), StructField("chan", IntegerType()),
     StructField("bl", IntegerType())]
    + [StructField(f"a_{p}", DoubleType()) for p in POLS])

STATE_SCHEMA = StructType(
    [StructField("last_t", LongType())]
    + [StructField(f"v_{c}", DoubleType()) for c in VIS_COLS])


def read_vis_stream(spark: SparkSession, sf_dir: str,
                    glob: str = "lineitem.parquet") -> DataFrame:
    """File-source stream of the synthetic long-format vis (one parquet
    file = one micro-batch under availableNow; production = the S1f
    gpubox stream). The same projection as the batch scan, on a stream."""
    schema = (spark.read.option("pathGlobFilter", glob)
              .parquet(sf_dir).schema)
    lineitem = (spark.readStream.schema(schema)
                .option("pathGlobFilter", glob)
                .parquet(sf_dir))
    return lineitem.selectExpr(
        *(f"{frag} AS {name}" for name, frag in syn.VIS_FRAGMENTS.items()))


def _fold_key(chan: int, bl: int, batch: pd.DataFrame,
              prev: tuple | None) -> tuple[pd.DataFrame, tuple]:
    """Pure transition: f32-demoted cell means per t (the batch cube
    CTE), diffed in time order against the carried last cell."""
    cells = (batch.groupby("t")[list(VIS_COLS)].mean().sort_index())
    out = []
    last_t = int(prev[0]) if prev is not None else None
    if last_t is not None and len(cells) and int(cells.index.min()) <= last_t:
        raise RuntimeError(
            f"streaming SSINS cell-completeness violation: key "
            f"(bl={bl}, chan={chan}) received t="
            f"{int(cells.index.min())} after already folding t={last_t}; "
            "a (bl, chan, t) cell straddled micro-batches (multi-part-file "
            "input?) and its already-emitted amplitude cannot be retracted "
            "in append mode — coalesce to cell-aligned files or use the "
            "batch operator (operators/ssins.py)")
    prev_v = (np.array(prev[1:], dtype=np.float64)
              if prev is not None else None)
    for t, row in cells.iterrows():
        cur = np.float64(np.float32(row.to_numpy(dtype=np.float64)))
        if prev_v is not None:
            d = cur - prev_v
            rec = {"t": int(t), "chan": int(chan), "bl": int(bl)}
            for i, p in enumerate(POLS):
                dre, dim = d[2 * i], d[2 * i + 1]
                rec[f"a_{p}"] = float(np.float32(np.sqrt(dre * dre + dim * dim)))
            out.append(rec)
        prev_v, last_t = cur, int(t)
    state = (last_t, *(float(v) for v in prev_v))
    return pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA]), state


def ssins_amp_stream(stream: DataFrame) -> DataFrame:
    """Per-(bl, chan) stateful adjacent-time difference amplitudes."""
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        bl, chan = key
        batch = pd.concat(list(pdfs), ignore_index=True)
        prev = tuple(state.get) if state.exists else None
        out, new_state = _fold_key(chan, bl, batch, prev)
        state.update(new_state)
        if len(out):
            yield out

    return (stream
            .select("t", "chan", "bl", *VIS_COLS)
            .groupBy("bl", "chan")
            .applyInPandasWithState(
                fn, OUTPUT_SCHEMA, STATE_SCHEMA, "append",
                GroupStateTimeout.NoTimeout))


def ins_from_updates(updates: DataFrame) -> DataFrame:
    """Incoherent (t, chan) noise image from the drained amplitudes —
    identical fragments to the batch ``ssins_ins`` CTE."""
    return (updates.groupBy("t", "chan")
            .agg(*(F.expr(f32(f"AVG(a_{p})")).alias(f"{p}_amp")
                   for p in POLS),
                 F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_bl")))


def score_drained(ins: DataFrame,
                  threshold: float = 5.0) -> DataFrame:
    """Per-channel median/MAD robust scoring over a drained incoherent
    noise image — the batch operator's scoring CTEs run relationally on
    the streaming output (the theta-twin post-algebra pattern)."""
    from birli_spark.operators.ssins import scoring_parts

    spark = ins.sparkSession
    ins.createOrReplaceTempView("ssins_drained_ins")
    ctes, final = scoring_parts("ssins_drained_ins", threshold)
    return spark.sql(f"WITH {ctes} {final}")


def run_available_now(spark: SparkSession, sf_dir: str,
                      query_name: str = "stream_ssins") -> DataFrame:
    out = ssins_amp_stream(read_vis_stream(spark, sf_dir))
    from birli_spark.streaming import drain_to_memory
    return drain_to_memory(out, query_name, "append")


# ------------------------------------------- catalogue twin (MO2) ---

def read_vis_stream_multiobs(spark: SparkSession, sf_dir: str,
                             n_obs: int | None = None) -> DataFrame:
    """The CATALOGUE live feed: each arriving file fans out per obs as
    a pure projection (explode over a literal obs array — no
    stream-static join needed), then the same per-obs transforms as
    ``operators/multiobs.multi_vis_cte`` (global t, epoch stride, gain
    drift). One micro-batch still contains every (obs, bl, chan, t)
    cell whole, so the cell-completeness contract holds per obs."""
    from birli_spark.operators import multiobs as mo

    n = n_obs or mo.N_OBS
    base = read_vis_stream(spark, sf_dir)
    fan = base.withColumn(
        "obs_id", F.explode(F.array(*[F.lit(o) for o in range(n)])))
    # the SAME per-column transforms as the batch multi_vis_cte — one
    # shared builder, so the twins cannot drift
    return fan.selectExpr("obs_id", *mo.mo_vis_col_exprs())


def ssins_amp_stream_multiobs(stream: DataFrame) -> DataFrame:
    """Per-(obs, bl, chan) stateful differencing: the state key carries
    the obs, so no lag ever crosses an observation boundary — the
    streaming mirror of ``ssins_parts(obs_expr=...)``."""
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        _obs, bl, chan = key
        batch = pd.concat(list(pdfs), ignore_index=True)
        prev = tuple(state.get) if state.exists else None
        out, new_state = _fold_key(chan, bl, batch, prev)
        state.update(new_state)
        if len(out):
            yield out

    return (stream
            .select("obs_id", "t", "chan", "bl", *VIS_COLS)
            .groupBy("obs_id", "bl", "chan")
            .applyInPandasWithState(
                fn, OUTPUT_SCHEMA, STATE_SCHEMA, "append",
                GroupStateTimeout.NoTimeout))


def score_drained_multiobs(ins: DataFrame,
                           threshold: float = 5.0) -> DataFrame:
    """Per-(obs, chan) robust scoring over the drained catalogue image
    (obs recovered from the global t the amplitudes carry)."""
    from birli_spark.operators.ssins import scoring_parts

    spark = ins.sparkSession
    ins.selectExpr(f"CAST(FLOOR(t / {syn.NUM_T}) AS INT) AS obs_id",
                   "*").createOrReplaceTempView("ssins_mo_drained_ins")
    ctes, final = scoring_parts("ssins_mo_drained_ins", threshold,
                                per_obs=True)
    return spark.sql(f"WITH {ctes} {final}")


def run_available_now_multiobs(spark: SparkSession, sf_dir: str,
                               query_name: str = "stream_mo_ssins",
                               n_obs: int | None = None) -> DataFrame:
    out = ssins_amp_stream_multiobs(
        read_vis_stream_multiobs(spark, sf_dir, n_obs))
    from birli_spark.streaming import drain_to_memory
    return drain_to_memory(out, query_name, "append")
