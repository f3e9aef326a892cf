"""st13 — streaming calibration-solution drift monitor: the stateful
twin of MO6 (``operators/multiobs.mo6_calsol_drift_sql``).

Each observation's calibration solutions land as ONE file (the
observatory publishes a solution set per obs); the monitor keys state
on (ant, chan) and carries the PREVIOUS obs's four solution components
plus the accumulated (n_steps, max_drift, total_drift_ticks) — O(1)
state per key, never re-reading history. Per arriving obs it folds the
drift with the identical expression order as the batch SQL
(fixed-association 4-term sum of squares -> SQRT -> f32 demotion ->
half-up tick), so the drained per-ant reduction equals the batch MO6
output EXACTLY — the driver hash-gates st13 against the same DuckDB
oracle as mo6.

**Ordering assumption**: per-key obs order (one file per obs under
availableNow gives global obs order). A late solution set cannot be
retro-folded; production would stage files per obs_id.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, IntegerType, LongType,
                               StructField, StructType)

from birli_spark.operators.multiobs import (MO6_DRIFT_THRESHOLD,
                                            MO6_TICKS, N_OBS,
                                            mo6_calsols_select)

OUTPUT_SCHEMA = StructType([
    StructField("ant", IntegerType()),
    StructField("chan", IntegerType()),
    StructField("n_steps", LongType()),
    StructField("max_drift", DoubleType()),
    StructField("total_drift_ticks", LongType()),
])

STATE_SCHEMA = StructType([
    StructField("obs_id", LongType()),
    StructField("j00_re", DoubleType()),
    StructField("j00_im", DoubleType()),
    StructField("j11_re", DoubleType()),
    StructField("j11_im", DoubleType()),
    StructField("n_steps", LongType()),
    StructField("max_drift", DoubleType()),
    StructField("total_drift_ticks", LongType()),
])

_J = ("j00_re", "j00_im", "j11_re", "j11_im")


def write_obs_files(spark: SparkSession, out_dir: str,
                    n_obs: int | None = None) -> str:
    """One parquet file per observation (the arrival unit), values
    computed by the SAME calsols SELECT as the batch plan."""
    import os
    n = n_obs or N_OBS
    sols = spark.sql(mo6_calsols_select(n))
    for o in range(n):
        (sols.filter(F.col("obs_id") == o).coalesce(1)
         .write.mode("overwrite")
         .parquet(os.path.join(out_dir, f"obs={o:04d}")))
    return out_dir


def read_calsols_stream(spark: SparkSession, in_dir: str) -> DataFrame:
    schema = ("obs_id int, ant int, chan int, j00_re double, "
              "j00_im double, j11_re double, j11_im double")
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(in_dir))


def _fold(ant: int, chan: int, batch: pd.DataFrame,
          prev: tuple | None) -> tuple[pd.DataFrame, tuple]:
    """Pure transition — the batch SQL's drift expression in the same
    IEEE operation order: ((d00re^2 + d00im^2) + d11re^2) + d11im^2,
    SQRT, f32 demotion, half-up MO6_TICKS quantization."""
    srt = batch.sort_values("obs_id", ignore_index=True)
    if prev is None:
        last_obs = -1
        pj = None
        n_steps, max_drift, ticks = 0, float("-inf"), 0
    else:
        last_obs = int(prev[0])
        pj = [float(v) for v in prev[1:5]]
        n_steps, max_drift, ticks = int(prev[5]), float(prev[6]), int(prev[7])
    if len(srt) and int(srt["obs_id"].min()) <= last_obs:
        raise RuntimeError(
            f"st13 obs-order violation for (ant={ant}, chan={chan}): "
            f"obs {int(srt['obs_id'].min())} arrived after {last_obs}")
    for _, row in srt.iterrows():
        cur = [float(row[c]) for c in _J]
        if pj is not None:
            d = (((cur[0] - pj[0]) * (cur[0] - pj[0])
                  + (cur[1] - pj[1]) * (cur[1] - pj[1]))
                 + (cur[2] - pj[2]) * (cur[2] - pj[2])) \
                + (cur[3] - pj[3]) * (cur[3] - pj[3])
            drift = float(np.float32(math.sqrt(d)))
            n_steps += 1
            max_drift = max(max_drift, drift)
            ticks += int(math.floor(drift * MO6_TICKS + 0.5))
        pj = cur
        last_obs = int(row["obs_id"])
    out = pd.DataFrame([{
        "ant": int(ant), "chan": int(chan), "n_steps": n_steps,
        "max_drift": max_drift,
        "total_drift_ticks": ticks,
    }]) if n_steps else pd.DataFrame(
        [], columns=[f.name for f in OUTPUT_SCHEMA])
    state = (last_obs, *pj, n_steps,
             max_drift if n_steps else 0.0, ticks)
    return out, state


def drift_stream(stream: DataFrame) -> DataFrame:
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        ant, chan = key
        batch = pd.concat(list(pdfs), ignore_index=True)
        prev = tuple(state.get) if state.exists else None
        out, new_state = _fold(ant, chan, batch, prev)
        state.update(new_state)
        if len(out):
            yield out

    return (stream.groupBy("ant", "chan")
            .applyInPandasWithState(
                fn, OUTPUT_SCHEMA, STATE_SCHEMA, "update",
                GroupStateTimeout.NoTimeout))


def drift_from_updates(updates: DataFrame) -> DataFrame:
    """Latest per-(ant, chan) snapshot -> the batch MO6 per-ant shape
    (same column names/types, hash-gated against mo6's oracle)."""
    from pyspark.sql import Window
    w = Window.partitionBy("ant", "chan").orderBy(F.desc("n_steps"))
    latest = (updates.withColumn("rn", F.row_number().over(w))
              .filter("rn = 1"))
    return (latest.groupBy("ant").agg(
        F.expr("CAST(SUM(n_steps) AS BIGINT)").alias("n_steps"),
        F.max("max_drift").alias("max_drift"),
        F.expr("CAST(SUM(total_drift_ticks) AS BIGINT)")
         .alias("total_drift_ticks"))
        .withColumn(
            "drifted",
            F.expr(f"max_drift > CAST({MO6_DRIFT_THRESHOLD!r}"
                   f" AS DOUBLE)")))


def run_available_now(spark: SparkSession, sf_dir: str,
                      query_name: str = "stream_calsol") -> DataFrame:
    import os
    import shutil
    import tempfile
    root = tempfile.mkdtemp(prefix="st13_")
    feed = os.path.join(root, "sols")
    write_obs_files(spark, feed)
    out = drift_stream(read_calsols_stream(spark, feed))
    # explicit per-run checkpoint: never inherit a stale session-global
    # location whose committed offsets would silently skip input files
    q = (out.writeStream.format("memory").queryName(query_name)
         .option("checkpointLocation", os.path.join(root, "ckpt"))
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    # the memory sink holds the rows; feed + checkpoint are disposable
    shutil.rmtree(root, ignore_errors=True)
    return spark.table(query_name)
