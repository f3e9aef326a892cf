"""The closed calibration loop: SOLVE per-antenna gains from
(model, data) visibility pairs with the distributed StEFCal operator,
write them to a real MWAOCAL ``.bin``, and APPLY them back through the
C6 sandwich — recovering the data exactly.

This is the workflow the reference delegates to external tools (its
``--apply-di-cal`` consumes a file produced by Andre Offringa's
``calibrate``); here both halves run as Spark plans:

- solve: relational time-mean per (chan, ant1, ant2) → ONE chan-block
  ``applyInPandas`` shuffle → vectorised StEFCal iteration
  (operators/calibration.solve_di_gains — Salvini & Wijnholds 2014);
- apply: two broadcast joins + a fused Jones-sandwich projection
  (operators/calibration.apply_di_calsol).

Run: python examples/calibration_loop.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from birli_spark.operators import calibration  # noqa: E402
from birli_spark.session import get_spark  # noqa: E402
from birli_spark.sources import aocal  # noqa: E402
from birli_spark.sources import synthetic as syn  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def run(spark=None):
    own = spark is None
    if spark is None:
        spark = get_spark("calibration_loop")

    # 1. a "perturbed" observation: apply known diagonal gains to the
    #    model visibilities (stands in for the instrument response)
    syn.load_vis(spark, SF_DIR).createOrReplaceTempView("cal_vis")
    pairs = spark.sql(calibration.synth_pairs_select("cal_vis"))

    # 2. SOLVE the gains back — one solve per coarse channel
    sol = calibration.solve_di_gains(
        pairs, n_ant=syn.NUM_ANTS, iters=500, tol=1e-16).toPandas()
    worst = float(sol["rel_residual"].max())
    print(f"solved {len(sol)} (chan, ant) gains, "
          f"worst channel residual {worst:.2e}")

    # 3. write a real MWAOCAL .bin (diagonal Jones per [tile][chan])
    n_chan = int(sol["chan"].max()) + 1
    di = np.zeros((1, syn.NUM_ANTS, n_chan, 8))
    for r in sol.itertuples():
        di[0, r.ant, r.chan] = (r.gx_re, r.gx_im, 0, 0,
                                0, 0, r.gy_re, r.gy_im)
    bin_path = os.path.join(tempfile.mkdtemp(prefix="calloop_"),
                            "solved.bin")
    aocal.write_mwaocal(bin_path, di)
    print(f"wrote {bin_path} ({os.path.getsize(bin_path)} bytes)")

    # 4. APPLY the solved gains to the model: the result must equal the
    #    perturbed data the solve saw (the loop closes)
    vis = syn.load_vis(spark, SF_DIR).filter("ant1 <> ant2")
    calsols = aocal.calsols_df(spark, bin_path)
    ratio = (syn.NUM_CC * syn.NUM_FC) // n_chan
    applied = calibration.apply_di_calsol(vis, calsols, ratio)

    got = (applied.groupBy("cc", "ant1", "ant2")
           .agg(*[F.avg(c).alias(c)
                  for c in ("xx_re", "xx_im", "yy_re", "yy_im")]))
    want = pairs.select("chan", "ant1", "ant2",
                        F.col("d_xx_re").alias("w_xx_re"),
                        F.col("d_xx_im").alias("w_xx_im"),
                        F.col("d_yy_re").alias("w_yy_re"),
                        F.col("d_yy_im").alias("w_yy_im"))
    joined = got.join(want, (got.cc == want.chan)
                      & (got.ant1 == want.ant1)
                      & (got.ant2 == want.ant2)).toPandas()
    err = max(
        float((joined[f"{p}_{c}"] - joined[f"w_{p}_{c}"]).abs().max())
        for p in ("xx", "yy") for c in ("re", "im"))
    # the apply operator demotes each corrected cell to f32 exactly
    # like the reference ("promote, correct, demote"), so the loop
    # closes at single precision, not double
    print(f"apply(solve(data)) round-trip max |error| = {err:.2e} "
          "(f32 demotion floor)")
    assert err < 1e-6
    if own:
        spark.stop()


if __name__ == "__main__":
    run()
