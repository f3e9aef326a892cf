"""End-to-end LLM pretraining-data curation demo — the full recipe a
100 TB corpus runs before tokenization, each stage one engine operator:

1. Gopher-style quality filter (T14 rule booleans, filter pushes to scan)
2. exact substring-dup gate (T26 — drop docs that are mostly duplicated
   spans, the Lee et al. signal)
3. benchmark-contamination scrub (T10 broadcast shingle semi-join)
4. bigram-LM perplexity band filter (T27 — drop both tails, the
   CCNet-style cut)
5. deterministic stratified sample per language (T7 hash-bucket)
6. training-sequence packing manifest (T24 concat-then-chop)
plus the DSIR importance weights (T25) and a per-source survival report.

Every stage is declarative DataFrame code — the survivors' lineage is
one Catalyst plan, so the corpus is scanned once per independent
aggregate, not once per stage.

Run: python examples/pretrain_data_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from birli_spark.operators import corpus_clean, dedup, text  # noqa: E402
from birli_spark.session import get_spark  # noqa: E402
from birli_spark.sources import corpus  # noqa: E402

MAX_DUP_FRAC = 0.5
PPL_LO, PPL_HI = 0.5, 9.0   # bits/bigram band (drop both tails)


def main(sf_dir: str | None = None, out_dir: str | None = None) -> dict:
    sf_dir = sf_dir or "/root/testdata/sf0.001"
    out_dir = out_dir or tempfile.mkdtemp(prefix="pretrain_out_")
    spark = get_spark("pretrain_data_pipeline_example")

    docs = corpus.load_documents(spark, sf_dir)
    n_in = docs.count()

    # 1. quality rules — keep is a pure per-row predicate
    quality_keep = text.quality_filter(docs).filter("keep").select("doc_id")

    # 2. substring-dup gate: mostly-duplicated docs out
    dup = corpus_clean.substring_dedup(docs)
    dup_keep = dup.filter(F.col("dup_frac") <= MAX_DUP_FRAC).select("doc_id")

    # 3. contamination scrub: anything sharing a shingle with the
    #    benchmark set is out (broadcast semi-join, anti here)
    contaminated = dedup.contamination(docs).select("doc_id")
    # 4. perplexity band
    lm = text.bigram_lm_bits(docs)
    lm_keep = lm.filter(
        (F.col("bits_per_bigram") >= PPL_LO)
        & (F.col("bits_per_bigram") <= PPL_HI)).select("doc_id")

    survivors = (docs
                 .join(quality_keep, "doc_id", "left_semi")
                 .join(dup_keep, "doc_id", "left_semi")
                 .join(lm_keep, "doc_id", "left_semi")
                 .join(contaminated, "doc_id", "left_anti"))

    # 5. stratified sample of the survivors (per-language rates);
    #    the sampler emits keys, so semi-join the full rows back
    sampled_ids = corpus_clean.stratified_sample(survivors).select("doc_id")
    sampled = survivors.join(sampled_ids, "doc_id", "left_semi")

    # 6. packing manifest + DSIR weights over the final set
    manifest = corpus_clean.sequence_packing(sampled)
    weights = text.dsir_weights(sampled)

    sampled.write.mode("overwrite").partitionBy("lang").parquet(
        os.path.join(out_dir, "curated"))
    manifest.write.mode("overwrite").parquet(
        os.path.join(out_dir, "pack_manifest"))
    weights.write.mode("overwrite").parquet(
        os.path.join(out_dir, "dsir_weights"))

    report = (docs.select("doc_id", "source")
              .join(sampled.select("doc_id", F.lit(1).alias("kept")),
                    "doc_id", "left")
              .groupBy("source")
              .agg(F.count("*").alias("n_docs"),
                   F.sum(F.coalesce("kept", F.lit(0))).alias("n_kept")))
    report.write.mode("overwrite").parquet(
        os.path.join(out_dir, "survival_report"))

    n_out = sampled.count()
    n_seqs = manifest.count()
    stats = {"n_in": n_in, "n_out": n_out, "n_sequences": n_seqs,
             "out_dir": out_dir}
    print(stats)
    return stats


if __name__ == "__main__":
    main(*(sys.argv[1:3] or [None, None]))
