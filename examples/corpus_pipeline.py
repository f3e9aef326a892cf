"""End-to-end demo of the training-data side of the engine: ingest a
document corpus, clean it (exact dedup → MinHash-LSH near-dup removal →
quality filter), cluster the remaining near-dup graph transitively,
attach language / token / fingerprint metadata, and write a curated
parquet dataset partitioned by (lang, source) plus a rollup report.

Run: python examples/corpus_pipeline.py [sf_dir] [out_dir]
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


def main(sf_dir: str | None = None, out_dir: str | None = None) -> dict:
    sf_dir = sf_dir or "/root/testdata/sf0.001"
    out_dir = out_dir or tempfile.mkdtemp(prefix="corpus_out_")
    spark = get_spark("corpus_pipeline_example")

    docs = corpus.load_documents(spark, sf_dir)
    n_in = docs.count()

    # 1. clean: exact dedup -> LSH near-dup removal -> quality floor
    survivors = corpus_clean.clean_corpus(docs)

    # 2. transitive clusters over the survivors' near-dup graph (D6):
    #    the cluster id travels with each doc as provenance metadata
    clusters = dedup.neardup_clusters(docs).select("doc_id", "cluster_id",
                                                   "cluster_size")

    # 3. metadata: language id + rolling-hash fingerprint
    lang = text.lang_id(docs).select("doc_id", F.col("lang").alias("lang_id"))
    fp = text.fingerprint(docs).select("doc_id", "fingerprint")

    curated = (survivors
               .join(clusters, "doc_id")
               .join(lang, "doc_id")
               .join(fp, "doc_id"))

    # 4. curated dataset, partitioned for downstream partition pruning
    dataset_path = os.path.join(out_dir, "curated")
    (curated.write.mode("overwrite")
     .partitionBy("lang", "source").parquet(dataset_path))

    # 5. per-source quality rollup (the curation dashboard table)
    rollup = text.source_quality_rollup(docs)
    rollup_path = os.path.join(out_dir, "rollup")
    rollup.write.mode("overwrite").parquet(rollup_path)

    n_out = spark.read.parquet(dataset_path).count()
    n_parts = len([d for d in os.listdir(dataset_path)
                   if d.startswith("lang=")])
    print(f"in={n_in} docs, curated={n_out} "
          f"({n_in - n_out} removed), lang partitions={n_parts}")
    print(f"dataset: {dataset_path}\nrollup:  {rollup_path}")
    spark.stop()
    return {"n_in": n_in, "n_out": n_out, "lang_partitions": n_parts,
            "dataset_path": dataset_path, "rollup_path": rollup_path}


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None,
         sys.argv[2] if len(sys.argv) > 2 else None)
