"""int8 scalar quantization (emb3): known-value semantics and a numpy
recomputation over real embeddings."""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import Row

from birli_spark.operators import quantization
from birli_spark.sources import corpus


def test_quantize_known_values(spark):
    # dim=4 vector [1, -0.5, 0.25, 0]: scale=1, codes round-half-up
    emb = spark.createDataFrame(
        [Row(vec_id=0, embedding=[1.0, -0.5, 0.25, 0.0])])
    out = quantization.quantize_stats(emb, dim=4).collect()[0]
    assert out.scale == 1.0
    codes = [127, -63, 32, 0]        # floor(x*127 + .5)
    assert out.q_md5 == hashlib.md5(
        ",".join(str(c) for c in codes).encode()).hexdigest()
    assert out.n_clipped == 1        # the 1.0 component sits at ±127
    recon = np.array(codes) / 127.0
    exp_mse = float(np.mean((np.array([1.0, -0.5, 0.25, 0.0]) - recon) ** 2))
    assert abs(out.mse - exp_mse) < 1e-7


def test_quantize_matches_numpy(spark, sf_dir):
    emb = corpus.load_embeddings(spark, sf_dir).filter("vec_id < 50")
    got = {r.vec_id: r for r in quantization.quantize_stats(emb).collect()}
    for row in emb.select("vec_id", "embedding").collect():
        v = np.array(row.embedding, dtype=np.float64)
        scale = float(np.abs(v).max())
        q = np.clip(np.floor(v / scale * 127.0 + 0.5), -127, 127).astype(int)
        g = got[row.vec_id]
        assert g.q_md5 == hashlib.md5(
            ",".join(str(int(c)) for c in q).encode()).hexdigest()
        assert g.n_clipped == int((np.abs(q) == 127).sum())
