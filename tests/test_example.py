"""Smoke test of the end-to-end example (gpubox FITS → pipeline →
UVFITS + mwaf): the reference's examples/preprocess.rs analogue."""

from __future__ import annotations

import runpy
import sys

import numpy as np


def test_example_end_to_end(tmp_path, monkeypatch):
    # the example manages its own SparkSession (getOrCreate reuses ours)
    sys.modules.pop("examples.preprocess", None)
    mod = runpy.run_path("examples/preprocess.py")
    # prevent the example from stopping the shared test session
    import birli_spark.session as sess
    real_stop = None
    result = None
    spark = sess.get_spark("birli_spark_tests")
    real_stop = spark.stop
    try:
        spark.stop = lambda: None
        result = mod["main"](str(tmp_path / "demo"))
    finally:
        spark.stop = real_stop
    assert result["raw_files"] == 3 and result["mwaf_files"] == 3
    assert result["uvfits_groups"] == 20  # 10 baselines x 2 avg blocks
    from birli_spark.sinks import uvfits
    header, params, data = uvfits.read_uvfits(result["uvfits_path"])
    assert header["GCOUNT"] == 20
    assert np.isfinite(data).all()

def test_corpus_example_end_to_end(tmp_path):
    sys.modules.pop("examples.corpus_pipeline", None)
    mod = runpy.run_path("examples/corpus_pipeline.py")
    import birli_spark.session as sess
    spark = sess.get_spark("birli_spark_tests")
    real_stop = spark.stop
    try:
        spark.stop = lambda: None
        result = mod["main"](out_dir=str(tmp_path / "corpus"))
    finally:
        spark.stop = real_stop
    assert result["n_in"] == 500
    assert 0 < result["n_out"] < result["n_in"]
    assert result["lang_partitions"] >= 1
    curated = spark.read.parquet(result["dataset_path"])
    assert {"doc_id", "cluster_id", "cluster_size", "fingerprint",
            "quality_score", "lang", "source"} <= set(curated.columns)
    # survivors of the pairwise policy may still carry a cluster_id of a
    # removed doc, but every doc_id is unique
    assert curated.count() == curated.select("doc_id").distinct().count()


def test_search_example_end_to_end(tmp_path):
    sys.modules.pop("examples.search_pipeline", None)
    mod = runpy.run_path("examples/search_pipeline.py")
    import birli_spark.session as sess
    spark = sess.get_spark("birli_spark_tests")
    real_stop = spark.stop
    try:
        spark.stop = lambda: None
        result = mod["main"](out_dir=str(tmp_path / "search"))
    finally:
        spark.stop = real_stop
    assert result["n_docs"] == 500
    assert result["n_index_rows"] > 0
    assert result["n_bm25_hits"] == 40      # 4 queries x k=10
    assert result["n_pq_rows"] == 500
    assert result["n_rerank_hits"] == 40    # 8 queries x k=5
    # sharded layout on disk: one directory per posting shard
    import os
    shards = [d for d in os.listdir(tmp_path / "search" / "index")
              if d.startswith("shard=")]
    assert len(shards) == 8


def test_events_example_end_to_end(tmp_path):
    sys.modules.pop("examples.events_pipeline", None)
    mod = runpy.run_path("examples/events_pipeline.py")
    import birli_spark.session as sess
    spark = sess.get_spark("birli_spark_tests")
    real_stop = spark.stop
    try:
        spark.stop = lambda: None
        result = mod["main"](out_dir=str(tmp_path / "events"))
    finally:
        spark.stop = real_stop
    assert result["n_events"] > 0
    assert result["n_sessions"] > 0
    assert result["n_history_rows"] > 0
    assert set(result["funnel"]) == {"signup", "view", "click", "purchase"}
    assert result["stream_parity"] is True
