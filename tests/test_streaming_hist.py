"""Streaming histogram sketch: batch/stream parity — the streamed
per-bin counters must reproduce the batch sketch's quantile estimates
exactly."""

from __future__ import annotations

from birli_spark.operators import sketches
from birli_spark.sources import corpus
from birli_spark.streaming import hist


def test_stream_bins_match_batch(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.streaming.checkpointLocation",
                   str(tmp_path / "ckpt"))
    bins = hist.run_available_now(spark, sf_dir, "t_hist")
    got = {r.bin: r["count"] for r in bins.collect()}
    docs = corpus.load_documents(spark, sf_dir)
    w = (hist.HIST_HI - hist.HIST_LO) / hist.HIST_BINS
    exp = {}
    for r in docs.select("n_chars").collect():
        b = min(hist.HIST_BINS - 1,
                max(0, int((r.n_chars - hist.HIST_LO) // w)))
        exp[b] = exp.get(b, 0) + 1
    assert got == exp


def test_stream_quantiles_match_batch_sketch(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.streaming.checkpointLocation",
                   str(tmp_path / "ckpt2"))
    bins = hist.run_available_now(spark, sf_dir, "t_hist2")
    got = (hist.quantiles_from_bins(bins)
           .orderBy("p").toPandas())
    docs = corpus.load_documents(spark, sf_dir)
    exp = (sketches.hist_quantiles(docs)
           .orderBy("p").toPandas())
    assert got.p.tolist() == exp.p.tolist()
    assert got.bin.tolist() == exp.bin.tolist()
    assert got.hist_q.tolist() == exp.hist_q.tolist()
