"""Streaming SSINS twin: state (8 doubles per (bl, chan)) carries the
last cell across REAL micro-batches; the drained incoherent noise image
equals the batch operator bit-for-bit."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

from birli_spark.operators import ssins as batch_ssins
from birli_spark.sources import synthetic as syn
from birli_spark.streaming import ssins as stream_ssins


def _split_lineitem_by_time(spark, sf_dir: str, out_dir: str) -> str:
    """Two time-ordered lineitem halves: batch 1 = timesteps [0, 8),
    batch 2 = [8, 16) — the second micro-batch's first diff crosses the
    batch boundary, exercising the carried state."""
    pdf = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    t = (pdf.l_orderkey + pdf.l_linenumber) % syn.NUM_T
    os.makedirs(out_dir, exist_ok=True)
    pdf[t < 8].to_parquet(f"{out_dir}/part0.parquet", index=False)
    pdf[t >= 8].to_parquet(f"{out_dir}/part1.parquet", index=False)
    return out_dir


def test_two_batch_state_continuation_bitwise(spark, sf_dir, tmp_path):
    src = _split_lineitem_by_time(spark, sf_dir, str(tmp_path / "li_split"))
    stream = stream_ssins.read_vis_stream(spark, src, glob="part*.parquet")
    # force one file per trigger so the [8, 16) half genuinely arrives
    # in a second micro-batch with state restored from the checkpoint
    stream = stream_ssins.ssins_amp_stream(stream)
    q = (stream.writeStream.format("memory").queryName("mb_ssins")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .option("maxFilesPerTrigger", 1)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    got = stream_ssins.ins_from_updates(spark.table("mb_ssins")).toPandas()

    want = (
        batch_ssins.ssins_spectra(syn.load_vis(spark, sf_dir))
        .select("t", "chan", *(f"{p}_amp" for p in ("xx", "xy", "yx", "yy")),
                "n_bl").toPandas())
    key = ["t", "chan"]
    got = got.sort_values(key, ignore_index=True)
    want = want.sort_values(key, ignore_index=True)
    # t=8 rows exist (the cross-batch diff) and every amplitude is
    # BIT-identical to the batch lag-window derivation
    assert (got.t == 8).any()
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_state_size_is_constant_per_key(spark):
    # the documented O(1) state: 1 long + 8 doubles per (bl, chan)
    assert len(stream_ssins.STATE_SCHEMA) == 9
