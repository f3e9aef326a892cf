"""End-to-end demo of the retrieval side of the engine: build the
lexical index artifacts (doc-sharded inverted index + BM25 ranking) and
the embedding-side index artifacts (k-means coarse cells + product-
quantization codes + two-stage rerank), then write a retrieval bundle:

- ``index/``   — inverted-index parquet, partitioned by shard
- ``pq/``      — per-vector PQ codes (8 bytes/vector equivalent)
- ``results/`` — BM25 top-k and rerank top-k for the demo query sets

This is the offline half of a RAG/search stack: everything the online
service needs (postings, codebooks, coarse cells) is produced as plain
partitioned parquet by declarative Spark plans.

Run: python examples/search_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from birli_spark.operators import quantization, search, similarity  # noqa: E402
from birli_spark.session import get_spark  # noqa: E402
from birli_spark.sources import corpus  # noqa: E402


def main(sf_dir: str | None = None, out_dir: str | None = None) -> dict:
    sf_dir = sf_dir or "/root/testdata/sf0.001"
    out_dir = out_dir or tempfile.mkdtemp(prefix="search_out_")
    spark = get_spark("search_pipeline_example")

    docs = corpus.load_documents(spark, sf_dir)
    emb = corpus.load_embeddings(spark, sf_dir)

    # 1. lexical index: shard postings by doc id so no term row can
    #    exceed a task at corpus scale; partitionBy(shard) gives readers
    #    doc-range pruning for free
    idx = search.inverted_index(docs)
    idx.write.mode("overwrite").partitionBy("shard").parquet(
        os.path.join(out_dir, "index"))

    # 2. BM25 ranking for the demo query workload
    bm25 = search.bm25_topk(docs, spark)
    bm25.write.mode("overwrite").parquet(os.path.join(out_dir, "results",
                                                      "bm25"))

    # 3. embedding index: PQ codes (the compressed store) and the
    #    coarse→rerank search over the raw vectors
    pq = quantization.pq_codes(emb)
    pq.write.mode("overwrite").parquet(os.path.join(out_dir, "pq"))
    rerank = similarity.rerank_topk(emb)
    rerank.write.mode("overwrite").parquet(
        os.path.join(out_dir, "results", "rerank"))

    report = {
        "out_dir": out_dir,
        "n_docs": docs.count(),
        "n_index_rows": spark.read.parquet(
            os.path.join(out_dir, "index")).count(),
        "n_bm25_hits": spark.read.parquet(
            os.path.join(out_dir, "results", "bm25")).count(),
        "n_pq_rows": spark.read.parquet(os.path.join(out_dir, "pq")).count(),
        "n_rerank_hits": spark.read.parquet(
            os.path.join(out_dir, "results", "rerank")).count(),
    }
    print(report)
    spark.stop()
    return report


if __name__ == "__main__":
    main(*sys.argv[1:3])
