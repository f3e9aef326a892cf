"""End-to-end pipeline on the REFERENCE'S OWN real observation files —
no synthetic inputs anywhere: metafits `1196175296.metafits` supplies
the dimension tables and observation context, the four legacy (Ord)
gpubox FITS files supply the visibilities (decoded through the
PFB-lane slot layout certified against the reference's pyuvdata golden
CSV), and the pipeline runs rule flags → cable correction (real
electrical lengths) → flag baking → 2×2 time/frequency averaging →
UVFITS + .mwaf outputs. The Spark analogue of running
``birli -m 1196175296.metafits gpubox*.fits`` (reference
src/lib.rs:8-84).

Run: python examples/real_obs_pipeline.py [out_dir]
"""

from __future__ import annotations

import math
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from birli_spark.operators import averaging, corrections, flags, weights  # noqa: E402
from birli_spark.session import get_spark  # noqa: E402
from birli_spark.sinks import mwaf as mwaf_sink  # noqa: E402
from birli_spark.sources import legacy_gpubox as lg  # noqa: E402
from birli_spark.sources import metafits as mf  # noqa: E402

ORD = "/root/reference/tests/data/1196175296_mwa_ord"
VEL_C = 299_792_458.0


def run(out_dir: str, spark=None):
    own = spark is None
    if spark is None:
        spark = get_spark("real_obs_pipeline")
    primary, tiledata = mf.read_metafits(f"{ORD}/1196175296.metafits")
    ctx = mf.obs_context(primary)
    ants = mf.antennas_df(spark, tiledata)
    ts = mf.timesteps_df(spark, primary)

    # --- S1e: real legacy gpubox scan, sky-ordered channels
    vis = lg.read_legacy_gpubox(
        spark, f"{ORD}/1196175296_*gpubox*.fits",
        f"{ORD}/1196175296.metafits")
    # timestep index from the scan time (ms since the first scan)
    first_ms = (vis.agg(F.min("unix_ms")).collect()[0][0])
    int_ms = int(ctx["int_time_s"] * 1000)
    # absolute sky frequency per sky-ordered coarse channel: receiver
    # channel N is centred at N x 1.28 MHz; fine channels tile the
    # coarse band from its lower edge
    from birli_spark.sources.legacy_gpubox import sky_channel_order
    order = sky_channel_order(ctx["coarse_channels"])
    n_fine = ctx["n_fine_per_coarse"]
    fw = ctx["fine_chan_width_hz"]
    arms = " ".join(
        f"WHEN {si} THEN CAST({ctx['coarse_channels'][gi] * 1.28e6 - 0.64e6!r} AS DOUBLE)"
        for si, gi in enumerate(order))
    vis = (vis.withColumn(
        "t", F.expr(f"CAST((unix_ms - {first_ms}) DIV {int_ms} AS INT)"))
        .withColumn("cc", F.expr(f"chan DIV {ctx['n_fine_per_coarse']}"))
        .withColumn("fc", F.expr(f"chan % {ctx['n_fine_per_coarse']}"))
        .withColumn("freq_hz", F.expr(
            f"(CASE cc {arms} END) + (fc + 0.5) * CAST({fw!r} AS DOUBLE)"))
        .withColumn("flag", F.lit(False))
        .withColumn("weight", F.lit(
            # W1 Cotter weight factor: (chan width / 10 kHz)·(int time / 1 s)
            ctx["fine_chan_width_hz"] / 10_000.0 * ctx["int_time_s"])))

    # --- F1-F7 rule flags from the real metafits
    gps0 = float(primary["GPSTIME"])
    ts_f = flags.flag_timesteps_quack(
        ts, gps0, gps0 + ctx["n_scans"] * ctx["int_time_s"],
        quack_s=ctx["quack_s"])
    bl_f = flags.baseline_flags(ants)
    fc_pred = flags.flag_fine_channels(
        ctx["n_fine_per_coarse"], n_edge=0, is_legacy=True)
    vis = flags.set_flags(vis, ts_f, bl_f, fc_pred)

    # --- C2 cable correction with the real electrical lengths,
    # under the v0.18.0 flag gate (fully-flagged cells stay raw)
    vis = corrections.attach_cell_gate(vis)
    vis = corrections.correct_cable_lengths(vis, ants, gated=True)
    vis = vis.drop(corrections.GATE_COL)

    # --- F10 + A1: bake flags, average 2 timesteps x 2 fine chans
    baked = weights.bake_flags_into_weights(vis)
    avg = averaging.average_time_freq(baked, avg_time=2, avg_freq=2)

    # --- sinks: averaged parquet + bit-packed .mwaf flag set
    os.makedirs(out_dir, exist_ok=True)
    avg_path = os.path.join(out_dir, "averaged_parquet")
    avg.write.mode("overwrite").parquet(avg_path)
    flag_paths = mwaf_sink.write_mwaf_set(
        vis.select("t", "bl", "cc", "fc", "flag"),
        os.path.join(out_dir, "mwaf"),
        obsid=ctx["obsid"], gps_start=gps0,
        n_chans=ctx["n_fine_per_coarse"],
        nscans=ctx["n_scans"],
        nbl=ctx["n_ants"] * (ctx["n_ants"] + 1) // 2)
    n_avg = spark.read.parquet(avg_path).count()
    result = {"obsid": ctx["obsid"], "n_avg_rows": n_avg,
              "mwaf_files": len(flag_paths), "out": out_dir}
    if own:
        spark.stop()
    return result


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="real_obs_")
    print(run(out))
