"""st14 — streaming incremental DI calibration solve: the stateful twin
of c7 (``operators/calibration.solve_di_gains``).

Visibility scans arrive one TIMESTEP per micro-batch (the correlator's
arrival unit). The monitor keys state on (chan, ant1, ant2) and carries
the SUFFICIENT STATISTICS of the solve — the running sums of the 16
model and data components plus the row count (17 values per key,
O(1) regardless of observation length; the batch solver's relational
time-mean is exactly ``sum / n`` over the same rows). Each batch emits
the per-key snapshot; at drain the latest snapshot per key feeds the
SAME StEFCal solver the batch path uses, so the streamed result is
hash-gated against the identical known-truth oracle as c7 — the
convergence target does not depend on the 1e-16 association difference
between the stream's batched accumulation and the batch AVG.

This is the online-calibration shape a live array needs: gains update
as integrations arrive, no history re-read, state bounded by
n_baselines x n_chans.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (DoubleType, IntegerType, LongType,
                               StructField, StructType)

from birli_spark.operators.calibration import (
    SOLVE_IN_COLS, synth_pair_exprs)

#: the 16 accumulated component sums, in SOLVE_IN_COLS order
_SUMS = [f"s_{c}" for c in SOLVE_IN_COLS]

OUTPUT_SCHEMA = StructType(
    [StructField("chan", IntegerType()),
     StructField("ant1", IntegerType()),
     StructField("ant2", IntegerType()),
     StructField("n_rows", LongType())]
    + [StructField(c, DoubleType()) for c in _SUMS])

STATE_SCHEMA = StructType(
    [StructField("n_rows", LongType())]
    + [StructField(c, DoubleType()) for c in _SUMS])


def write_t_files(spark: SparkSession, sf_dir: str, out_dir: str) -> str:
    """One parquet file per timestep (the arrival unit): the ROW-wise
    pairs derivation — the same expressions the batch plan AVG-reduces
    (calibration.synth_pair_exprs over the coarse-channel label)."""
    from birli_spark.sources import synthetic as syn
    syn.load_vis(spark, sf_dir).createOrReplaceTempView("st14_vis")
    cols = ", ".join(f"({e}) AS {n}" for n, e in synth_pair_exprs("cc"))
    rows = spark.sql(
        f"SELECT t, cc AS chan, ant1, ant2, {cols} FROM st14_vis"
        f" WHERE ant1 <> ant2")
    # ONE pass: partitionBy(t) lands each timestep in its own directory
    # (file-per-trigger arrival unit); order across files is irrelevant
    # here — the accumulated sums commute (unlike st13's drift fold)
    (rows.repartition("t").write.mode("overwrite")
     .partitionBy("t").parquet(out_dir))
    return out_dir


def read_pairs_stream(spark: SparkSession, in_dir: str) -> DataFrame:
    schema = ("chan int, ant1 int, ant2 int, "
              + ", ".join(f"{c} double" for c in SOLVE_IN_COLS))
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(in_dir))


def accumulate_stream(stream: DataFrame) -> DataFrame:
    """The stateful accumulation: per (chan, ant1, ant2), fold each
    micro-batch's rows into the running component sums."""
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        chan, a1, a2 = (int(k) for k in key)
        batch = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            prev = tuple(state.get)
            n = int(prev[0])
            sums = [float(v) for v in prev[1:]]
        else:
            n, sums = 0, [0.0] * len(_SUMS)
        n += len(batch)
        for i, c in enumerate(SOLVE_IN_COLS):
            # numpy sum, NOT pandas (skipna=True) — a NaN component
            # must poison its running sum exactly like the batch AVG,
            # so the solver masks the same equations on both paths
            sums[i] += float(batch[c].to_numpy(dtype=float).sum())
        state.update((n, *sums))
        yield pd.DataFrame([{
            "chan": chan, "ant1": a1, "ant2": a2, "n_rows": n,
            **{f"s_{c}": sums[i] for i, c in enumerate(SOLVE_IN_COLS)},
        }])

    return (stream.groupBy("chan", "ant1", "ant2")
            .applyInPandasWithState(
                fn, OUTPUT_SCHEMA, STATE_SCHEMA, "update",
                GroupStateTimeout.NoTimeout))


def run_available_now(spark: SparkSession, sf_dir: str,
                      query_name: str = "stream_calsolve") -> DataFrame:
    """Write the per-timestep files, run the accumulation stream to
    completion (availableNow), return the update log as a DataFrame
    (the st13 memory-sink harness shape)."""
    import os
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="st14_")
    feed = os.path.join(root, "pairs")
    write_t_files(spark, sf_dir, feed)
    upd = accumulate_stream(read_pairs_stream(spark, feed))
    # explicit per-run checkpoint: never inherit a stale session-global
    # location whose committed offsets would silently skip input files
    q = (upd.writeStream.format("memory").queryName(query_name)
         .option("checkpointLocation", os.path.join(root, "ckpt"))
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    # the memory sink holds the rows; feed + checkpoint are disposable
    shutil.rmtree(root, ignore_errors=True)
    return spark.table(query_name)


def gains_from_updates(updates: DataFrame, *, n_ant: int,
                       tick: str) -> DataFrame:
    """Latest per-key snapshot -> means -> the SAME StEFCal solve as
    the batch path -> ref-normalised integer ticks (the c7 output
    shape, hash-gated against the c7 known-truth oracle)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from birli_spark.operators.calibration import solve_di_gains

    w = Window.partitionBy("chan", "ant1", "ant2").orderBy(
        F.desc("n_rows"))
    latest = (updates.withColumn("rn", F.row_number().over(w))
              .filter("rn = 1"))
    means = latest.select(
        "chan", "ant1", "ant2",
        *[(F.col(f"s_{c}") / F.col("n_rows")).alias(c)
          for c in SOLVE_IN_COLS])
    sol = solve_di_gains(means, n_ant=n_ant, normalize_ref=0,
                         iters=500, tol=1e-15)
    from birli_spark.operators.calibration import gain_ticks_exprs
    return sol.selectExpr(*gain_ticks_exprs(tick))
