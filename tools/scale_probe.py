"""Scale-stress probe: replicate the corpus N× into /tmp and run the
heaviest corpus-scale operators end-to-end (noop sink), looking for
superlinear cliffs the sf0.1 bench can't expose.

Replication multiplies doc_id/vec_id into disjoint ranges, so exact
dedup stays non-trivial and LSH/near-dup pair graphs grow with real
duplicate mass (every doc gains N−1 exact copies — the worst case for
pair-generation operators, which is the point).

Usage: python tools/scale_probe.py [N] [sf_dir]
Last measured (N=10, sf0.1 → 50k docs, local[32]): t26 7.1s,
d3 10.7s, d6 14.2s, i2 6.4s, sk7 4.0s, t27 9.2s, d1 0.6s — all within
~linear of the 1× timings; the d3/d6 growth is the inherent
quadratic-in-duplicates pair mass, not a plan regression.
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
          "d1_exact_dedup", "d5_embedding_neardup"]


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


if __name__ == "__main__":
    main()
