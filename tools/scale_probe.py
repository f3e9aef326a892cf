"""Scale-stress probe: replicate the corpus N× into /tmp and run the
heaviest corpus-scale operators end-to-end (noop sink), looking for
superlinear cliffs the sf0.1 bench can't expose.

Replication multiplies doc_id/vec_id into disjoint ranges, so exact
dedup stays non-trivial and LSH/near-dup pair graphs grow with real
duplicate mass (every doc gains N−1 exact copies — the worst case for
pair-generation operators, which is the point).

Usage: python tools/scale_probe.py [N] [sf_dir]
Last measured (N=10, sf0.1 → 50k docs / 50k vectors / 6M lineitem
rows, local[32], round 3): t26 7.3s, d3 10.5s, d6 11.4s, i2 5.2s,
sk7 3.1s, t27 6.8s, d1 0.5s, d10 21.1s, f11 1.5s, im1 1.2s,
pipeline_ssins 6.9s, o1b uvfits byte gate 6.5s, o2c MS byte gate
4.7s — all within ~linear of the 1× timings except the
pair generators, whose growth is the inherent quadratic-in-duplicates
pair mass (every vector gains 9 exact copies), not a plan regression.
The write-stage probes grow sublinearly: the averaged group grid is
fixed, so 10× denser cells only thicken the map-side partials ahead of
the same-size file write.
Catalogue axis (round 4, probed to 48 obs): mo1 at sf0.1 runs 3.7s
with 12 obs and 4.4s with 48 obs warm — 16x the fact rows of the 3-obs
shape for ~flat wall-clock (32 cores absorb the row mass; stage and
shuffle counts are obs-invariant). The MO4/MO5 WRITE stages, split
rows-build vs write+byte-gate (clean single-job run):
  mo4: rows 5.4/2.5/3.8s, write+gate 5.7/7.8/12.7s at 3/12/48 obs
  mo5: rows 2.0/2.4/4.3s, write+gate 3.2/4.7/8.4s at 3/12/48 obs
— the rows build is obs-flat; write+gate grows ~1.6-1.8x per 4x obs,
and that growth is the GATE's driver-side byte read-back (one file per
obs re-parsed for the hash check), not the distributed write itself —
files/obs stay the parallel axis.
**d5 is now the LSH-bucketed path (round 3): 3.6s at 50k vectors where
the r2 brute-force baseline took 116s** — the signature/bucket join
scales ~linearly while brute is O(N²); the brute form survives as
d5b for correctness gating. The vis-side probes (f11 SSINS, im1
uv-grid, the RFI-inclusive pipeline) are flat: replicated rows densify
cube cells and the map-side partial aggregation absorbs them before
any exchange.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from birli_spark.session import get_spark  # noqa: E402

PROBES = ["t26_substring_dedup", "d3_minhash_lsh", "d6_neardup_clusters",
          "i2_bm25_topk", "sk7_theta_pairs", "t27_bigram_lm",
          "d1_exact_dedup", "d5_embedding_neardup", "d10_semantic_dedup",
          # vis-side probes: SSINS lag-window chain and the uv-grid
          # aggregate over the Nx-replicated fact table (denser cells —
          # the cube/grid partial aggregation must absorb the growth
          # map-side)
          "f11_ssins_spectra", "im1_uv_grid", "pipeline_preprocess_ssins",
          # write-stage probes: the physical UVFITS and casacore-layout
          # MS byte gates (pipeline + executor-parallel write +
          # read-back) against the replicated fact
          "o1b_uvfits_file", "o2c_ms_file"]


def replicate(spark, src: str, out: str, n: int) -> None:
    docs = spark.read.parquet(f"{src}/documents.parquet")
    nd = docs.count()
    big = None
    for i in range(n):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * nd))
        big = d if big is None else big.unionByName(d)
    big.repartition(32).write.mode("overwrite").parquet(
        f"{out}/documents.parquet")
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    ne = emb.count()
    bige = None
    for i in range(n):
        e = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * ne))
        bige = e if bige is None else bige.unionByName(e)
    bige.repartition(32).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet")
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    nl = li.count()
    bigl = None
    for i in range(n):
        # disjoint l_orderkey ranges keep the vis derivation's coordinate
        # mixes distinct, so replicated rows fill MORE cube cells, not
        # just the same ones
        l = li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * nl))
        bigl = l if bigl is None else bigl.unionByName(l)
    bigl.repartition(32).write.mode("overwrite").parquet(
        f"{out}/lineitem.parquet")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = f"/tmp/scale_probe_x{n}"
    spark = get_spark("scale_probe")
    if not os.path.exists(out):
        replicate(spark, src, out, n)
    print(f"docs: {spark.read.parquet(f'{out}/documents.parquet').count()}")
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    for name in PROBES:
        t0 = time.time()
        qs[name](spark, out).write.format("noop").mode("overwrite").save()
        print(f"{name}: {time.time() - t0:.1f}s")

    # catalogue-axis probe: the multi-obs pipeline must scale ~linearly
    # in observation count (the obs axis is input splits only — no new
    # stages, no new join keys). Probed to 48 obs (r4 ask 6), with the
    # MO4/MO5 WRITE stages split into rows-build vs write+byte-gate.
    from birli_spark.operators import multiobs
    from birli_spark.sources import synthetic as syn

    syn.load_vis(spark, src)
    for n_obs in (3, 12, 48):
        t0 = time.time()
        spark.sql(multiobs.multi_obs_preprocess_sql(n_obs=n_obs)) \
             .write.format("noop").mode("overwrite").save()
        print(f"mo1[n_obs={n_obs}]: {time.time() - t0:.1f}s")
    for n_obs in (3, 12, 48):
        t0 = time.time()
        spark.sql(multiobs.mo_uvfits_rows_sql(n_obs=n_obs)) \
             .write.format("noop").mode("overwrite").save()
        t_rows = time.time() - t0
        t0 = time.time()
        multiobs.mo_uvfits_gate_rows(
            spark, src, f"/tmp/scale_probe_mo4_{n_obs}", n_obs=n_obs) \
            .write.format("noop").mode("overwrite").save()
        print(f"mo4[n_obs={n_obs}]: rows {t_rows:.1f}s,"
              f" write+gate {time.time() - t0:.1f}s")
    for n_obs in (3, 12, 48):
        t0 = time.time()
        spark.sql(multiobs.mo_ms_rows_sql(n_obs=n_obs)) \
             .write.format("noop").mode("overwrite").save()
        t_rows = time.time() - t0
        t0 = time.time()
        multiobs.mo_ms_gate_rows(
            spark, src, f"/tmp/scale_probe_mo5_{n_obs}", n_obs=n_obs) \
            .write.format("noop").mode("overwrite").save()
        print(f"mo5[n_obs={n_obs}]: rows {t_rows:.1f}s,"
              f" write+gate {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
