"""End-to-end demo mirroring the reference's crate-root example
(reference src/lib.rs:8-84 and examples/preprocess.rs:30-110): read raw
gpubox FITS files, apply rule flags + the correction chain, bake flags
into weights, average, and write real UVFITS + .mwaf outputs.

Run: python examples/preprocess.py [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from birli_spark import pipeline  # noqa: E402
from birli_spark.operators import averaging, flags, weights  # noqa: E402
from birli_spark.session import get_spark  # noqa: E402
from birli_spark.sinks import mwaf, uvfits  # noqa: E402
from birli_spark.sources import gpubox  # noqa: E402
from birli_spark.sources import synthetic as syn  # noqa: E402

N_CC, N_ANTS, N_FINE, N_TS = 3, 4, 8, 8


def main(out_dir: str | None = None) -> dict:
    out_dir = out_dir or os.path.join(tempfile.gettempdir(), "birli_spark_demo")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("preprocess_example")

    # 1. raw telescope data: one gpubox FITS per coarse channel
    raw_dir = os.path.join(out_dir, "raw")
    os.makedirs(raw_dir, exist_ok=True)
    for cc in range(N_CC):
        gpubox.write_gpubox(
            os.path.join(raw_dir, f"gpubox_{cc:02d}.fits"), cc, N_ANTS,
            N_FINE, N_TS, obsid=1297526432, gps_start=syn.GPS_START,
            int_time_s=syn.INT_TIME_S)

    # 2. distributed scan -> long-format fact table (+ weight fill, W3)
    vis = (gpubox.read_gpubox(spark, raw_dir + "/*.fits")
           .withColumn("weight", F.lit(syn.WEIGHT_FACTOR))
           .withColumn("flag", F.lit(False))
           .withColumn("freq_hz", F.expr(
               f"{syn.BASE_FREQ_HZ!r} + chan * {syn.FINE_CHAN_WIDTH_HZ!r}"))
           .withColumn("ts_gps", F.expr(
               f"{syn.GPS_START!r} + t * {syn.INT_TIME_S!r}"
               f" + {syn.INT_TIME_S / 2!r}")))

    # 3. rule-based flags (F1-F7) over the scanned data
    ts = syn.load_dim(spark, "timesteps")
    ants = syn.load_dim(spark, "antennas")
    ts_f = flags.flag_timesteps_quack(
        ts, syn.GPS_START, syn.GPS_START + N_TS * syn.INT_TIME_S,
        quack_s=pipeline.QUACK_S)
    bl_f = flags.baseline_flags(ants)
    fc_pred = flags.flag_fine_channels(
        N_FINE, n_edge=pipeline.N_EDGE, is_legacy=pipeline.IS_LEGACY)
    vis = flags.set_flags(vis, ts_f, bl_f, fc_pred)

    # 4. write the flag set (O3, the real bit-packed format)
    mwaf_dir = os.path.join(out_dir, "mwaf")
    mwaf_paths = mwaf.write_mwaf_set(
        vis, mwaf_dir, obsid=1297526432, gps_start=syn.GPS_START)

    # 5. corrections under the v0.18.0 flag gate (cable + digital
    # gains only touch unflagged (t, cc) cells; geometry is ungated,
    # like the reference)
    from birli_spark.operators import corrections
    vis = corrections.attach_cell_gate(vis)
    vis = corrections.correct_cable_lengths(vis, ants, gated=True)
    vis = corrections.correct_digital_gains(
        vis, syn.load_dim(spark, "digital_gains"), gated=True)
    vis = vis.drop(corrections.GATE_COL)
    vis = corrections.correct_geometry(vis, syn.load_dim(spark, "part_uvw"))

    # 6. bake + average (F10 + A1)
    vis = weights.bake_flags_into_weights(vis)
    avg = averaging.average_time_freq(
        vis, pipeline.AVG_TIME, pipeline.AVG_FREQ,
        extra_mean_cols=("u", "v", "w"))

    # 7. UVFITS sink (O1): ordered stream -> random-groups FITS
    rows = (avg
            .withColumn("bl_code", F.expr("256 * (ant1 + 1) + (ant2 + 1)"))
            .withColumn("jd", F.expr(
                f"CAST({uvfits.GPS_EPOCH_JD!r} AS DOUBLE)"
                f" + ({syn.GPS_START!r} + t_out * {pipeline.AVG_TIME}"
                f" * {syn.INT_TIME_S!r}) / 86400.0"))
            .orderBy("t_out", "bl", "chan_out").toPandas())
    all_chans = sorted(rows.chan_out.unique())
    groups = []
    for (_, _), grp in rows.groupby(["t_out", "bl"]):
        grp = grp.set_index("chan_out").reindex(all_chans)
        data = np.stack(
            [np.stack([grp[f"{p}_re"].fillna(0.0), grp[f"{p}_im"].fillna(0.0),
                       grp["weight"].fillna(0.0)], axis=-1)
             for p in uvfits.UVFITS_POLS], axis=1)
        g0 = grp.dropna(subset=["bl_code"]).iloc[0]
        groups.append((g0.u, g0.v, g0.w, g0.bl_code, g0.jd, data))
    uv_path = os.path.join(out_dir, "preprocessed.uvfits")
    uvfits.write_uvfits(uv_path, iter(groups), len(all_chans), len(groups),
                        jd_zero=uvfits.obs_jd_zero(syn.GPS_START))

    result = {
        "raw_files": N_CC,
        "fact_rows": vis.count(),
        "mwaf_files": len(mwaf_paths),
        "uvfits_groups": len(groups),
        "uvfits_path": uv_path,
    }
    print(result)
    spark.stop()
    return result


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
