"""Bench harness: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full computation, no
driver collect) — the Spark analogue of the reference's criterion stage
benchmarks (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from birli_spark.session import get_spark  # noqa: E402

#: headline subset — full pipeline + the stage benchmarks the reference
#: itself tracks (read, cable, geometry; doc/benchmark_results.md) + the
#: flagship groupBy.
HEADLINE = [
    "s1_vis_scan",
    "f7_set_flags",
    "c2_cable_correction",
    "c3_geometric_correction",
    "c6_di_calibration",
    "a1_average_time_freq",
    "a2_channel_occupancy",
    "pipeline_preprocess",
    # training-data pipeline: the scale-sensitive shapes (LSH band join,
    # brute pairwise cosine, streaming-shaped groupBy)
    "d3_minhash_lsh",
    "d5_embedding_neardup",
    "ann_lsh_topk",
    "e1_windowed_agg",
    # UDF islands last — their Python-worker residency (Arrow batches,
    # long-lived reused daemons) perturbs later JVM-side queries
    "c1_van_vleck",
    "f9_rfi_sumthreshold",
]


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("birli_spark_bench")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sys.argv[1:] if n in qs and n not in HEADLINE
    ]
    timings: dict[str, float] = {}
    # warm the JVM + parquet footers once with the cheapest query
    run_query(qs["s1_vis_scan"](spark, sf_dir).limit(1))
    for name in names:
        t0 = time.perf_counter()
        run_query(qs[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
