"""Catalogue-axis scale proof (VERDICT r7 ask 6): the multi-observation
pipeline (MO1) and the per-obs UVFITS catalogue fan-out (MO4) measured
along the n_obs axis — the axis a 100 TB archive actually grows along.

For each rung of the ladder the tool records wall, the Python driver's
and the JVM's resident set (which must stay ~flat while n_obs grows:
nothing per-obs may ever materialize on the driver), the fact row
count, and the physical plan's exchange count (the single-fact-shuffle
claim, PLANS.md). Output: MO_SCALE_r8.json.

Usage: python tools/mo_scale.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LADDER = (8, 32, 96)
OUT_DIR = "/tmp/mo_scale_out"


def _rss_mb(pid: int | str = "self") -> float:
    with open(f"/proc/{pid}/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return round(int(line.split()[1]) / 1024.0, 1)
    return 0.0


def _jvm_pid() -> int:
    me = os.getpid()
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat", "rb") as f:
                raw = f.read().decode("ascii", "replace")
            rest = raw[raw.rfind(")") + 2:].split()
            with open(f"/proc/{d}/comm") as f:
                comm = f.read().strip()
            if comm == "java" and int(rest[1]) == me:
                return int(d)
        except OSError:
            continue
    return 0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from birli_spark.operators import multiobs
    from birli_spark.session import get_spark
    from birli_spark.sinks import uvfits
    from birli_spark.sources import synthetic as syn

    spark = get_spark("birli_spark_mo_scale")
    jvm = _jvm_pid()
    syn.load_vis(spark, sf_dir)  # registers the lineitem view
    rungs = []
    for n_obs in LADDER:
        rung: dict = {"n_obs": n_obs}
        spark.catalog.clearCache()

        # MO1: the whole catalogue pipeline to a noop sink
        df = spark.sql(multiobs.multi_obs_preprocess_sql(n_obs=n_obs))
        plan = df._jdf.queryExecution().executedPlan().toString()
        rung["mo1_exchanges"] = plan.count("Exchange hashpartitioning")
        rung["mo1_sort_merge_joins"] = plan.count("SortMergeJoin")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        rung["mo1_wall_s"] = round(time.perf_counter() - t0, 1)
        rung["mo1_out_rows"] = df.count()

        # MO4: the per-obs UVFITS fan-out (one physical file per obs,
        # written executor-parallel from ONE plan)
        out = os.path.join(OUT_DIR, f"n{n_obs}")
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out, exist_ok=True)
        rows = spark.sql(multiobs.mo_uvfits_rows_sql(n_obs=n_obs))
        n_chan = syn.NUM_CC * syn.NUM_FC // 2
        t0 = time.perf_counter()
        paths = uvfits.write_uvfits_catalogue(
            rows, out, n_chan, syn.GPS_START, multiobs.OBS_STRIDE_S,
            syn.NUM_T // 2)
        rung["mo4_wall_s"] = round(time.perf_counter() - t0, 1)
        rung["mo4_files"] = len(paths)
        rung["mo4_bytes"] = sum(
            os.path.getsize(p) for p in paths.values())
        rung["driver_py_rss_mb"] = _rss_mb()
        rung["driver_jvm_rss_mb"] = _rss_mb(jvm) if jvm else None
        print(json.dumps(rung))
        rungs.append(rung)

    rec = {
        "sf_dir": sf_dir,
        "ladder": rungs,
        "note": ("driver_py/jvm RSS must stay ~flat along the ladder "
                 "(no per-obs driver materialization); wall should "
                 "scale ~linearly with n_obs; mo1_exchanges is the "
                 "plan's single fact shuffle"),
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "MO_SCALE_r8.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
