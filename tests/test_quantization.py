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


def test_pq_codes_match_numpy(spark, sf_dir):
    import numpy as np
    from birli_spark.operators import quantization as qz
    from birli_spark.sources import corpus
    emb = corpus.load_embeddings(spark, sf_dir)
    got = qz.pq_codes(emb).orderBy("vec_id").toPandas()
    pdf = emb.orderBy("vec_id").toPandas()
    vecs = np.array([np.asarray(v, dtype=np.float64)
                     for v in pdf.embedding])
    cb = vecs[:qz.PQ_K]
    M, S = qz.PQ_M, qz.PQ_SUB
    for r, v in zip(got.itertuples(), vecs):
        codes, err, nz = [], 0.0, 0
        for m in range(M):
            sub = v[m * S:(m + 1) * S]
            d2 = ((cb[:, m * S:(m + 1) * S] - sub) ** 2).sum(axis=1)
            kbest = int(np.argmin(d2))   # np.argmin = first min = tie on k
            codes.append(str(kbest))
            err += float(d2[kbest])
            nz += int(d2[kbest] == 0.0)
        assert r.pq_code == ",".join(codes)
        assert abs(r.sq_err - err) < 1e-4 * max(err, 1.0)
        assert r.n_exact_sub == nz


def test_pq_codebook_vectors_self_code(spark, sf_dir):
    from birli_spark.operators import quantization as qz
    from birli_spark.sources import corpus
    emb = corpus.load_embeddings(spark, sf_dir)
    got = (qz.pq_codes(emb).filter(f"vec_id < {qz.PQ_K}")
           .orderBy("vec_id").toPandas())
    # every codebook vector reconstructs itself exactly
    for r in got.itertuples():
        assert r.sq_err == 0.0
        assert r.n_exact_sub == qz.PQ_M
        assert r.pq_code == ",".join([str(r.vec_id)] * qz.PQ_M)
