"""Semantic tests for ANN search: brute-force top-k against numpy; LSH
bucketing properties."""

from __future__ import annotations

import numpy as np

from birli_spark.operators import similarity
from birli_spark.sources import corpus


def _numpy_topk(emb_pdf, qid, k):
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in emb_pdf.itertuples()}
    q = vecs[qid]
    scored = sorted(
        ((float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v))), vid)
         for vid, v in vecs.items() if vid != qid),
        key=lambda t: (-t[0], t[1]))
    return [vid for _, vid in scored[:k]]


def test_brute_topk_matches_numpy(spark, sf_dir):
    emb = corpus.load_embeddings(spark, sf_dir).filter("vec_id < 120")
    got = similarity.brute_topk(emb, k=5, n_queries=4).toPandas()
    pdf = emb.toPandas()
    for qid in range(4):
        mine = (got[got.qid == qid].sort_values("rank").vec_id.tolist())
        expect = _numpy_topk(pdf, qid, 5)
        assert mine == expect, f"qid={qid}: {mine} != {expect}"
    # cosine sanity: within [-1, 1], ranks strictly ordered by cos desc
    g0 = got[got.qid == 0].sort_values("rank")
    assert (g0.cos.values <= 1.0 + 1e-12).all()
    assert (np.diff(g0.cos.values) <= 1e-18).all()


def _hamming(a: str, b: str) -> int:
    return sum(x != y for x, y in zip(a, b))


def test_lsh_topk_is_bucket_restricted_subset(spark, sf_dir):
    """Single-probe: every LSH result must appear in the brute-force
    ranking of the same-bucket candidate set, in the same order.
    Multiprobe (the default): the candidate set widens to buckets
    within Hamming distance 1 of the query's."""
    emb = corpus.load_embeddings(spark, sf_dir).filter("vec_id < 200")
    from pyspark.sql import functions as F
    from birli_spark.functions import textsql as X
    buckets = {r.vec_id: r.bucket for r in emb.select(
        "vec_id",
        F.expr(similarity._bucket_expr(X.SPARK, "embedding")).alias("bucket")
    ).collect()}
    pdf = emb.toPandas()
    single = similarity.lsh_topk(emb, k=3, n_queries=6,
                                 multiprobe=False).toPandas()
    multi = similarity.lsh_topk(emb, k=3, n_queries=6).toPandas()
    for qid in range(6):
        mine = single[single.qid == qid].sort_values("rank").vec_id.tolist()
        cands = [v for v, bk in buckets.items()
                 if bk == buckets[qid] and v != qid]
        sub = pdf[pdf.vec_id.isin(cands + [qid])]
        expect = _numpy_topk(sub, qid, 3)
        assert mine == expect
        for v in mine:
            assert buckets[v] == buckets[qid]
        mm = multi[multi.qid == qid].sort_values("rank").vec_id.tolist()
        mcands = [v for v, bk in buckets.items()
                  if _hamming(bk, buckets[qid]) <= 1 and v != qid]
        msub = pdf[pdf.vec_id.isin(mcands + [qid])]
        assert mm == _numpy_topk(msub, qid, 3)
        for v in mm:
            assert _hamming(buckets[v], buckets[qid]) <= 1


def test_ivf_topk_is_cell_restricted_subset(spark, sf_dir):
    """Every IVF result must be the brute-force ranking of the candidate
    set living in the query's probed cells."""
    emb = corpus.load_embeddings(spark, sf_dir).filter("vec_id < 200")
    pdf = emb.toPandas()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in pdf.itertuples()}
    cents = {v: e for v, e in vecs.items() if v % similarity.IVF_STRIDE == 0}

    def cell_ranking(v):
        ve = vecs[v]
        return sorted(
            ((-float(ve @ ce / (np.linalg.norm(ve) * np.linalg.norm(ce))), c)
             for c, ce in cents.items()))

    cell = {v: cell_ranking(v)[0][1] for v in vecs}
    got = similarity.ivf_topk(emb, k=3, n_queries=6).toPandas()
    for qid in range(6):
        probed = {c for _, c in cell_ranking(qid)[:similarity.IVF_NPROBE]}
        cands = [v for v in vecs if cell[v] in probed and v != qid]
        expect = _numpy_topk(pdf[pdf.vec_id.isin(cands + [qid])], qid, 3)
        mine = got[got.qid == qid].sort_values("rank").vec_id.tolist()
        assert mine == expect, f"qid={qid}: {mine} != {expect}"
        for v in mine:
            assert cell[v] in probed


def test_planes_are_deterministic():
    p0 = similarity._plane(0)
    assert len(p0) == similarity.EMB_DIM
    assert p0 == similarity._plane(0)
    # gaussian components: finite, zero-centred-ish, not all tiny
    assert all(abs(x) < 6.0 for x in p0)
    assert max(abs(x) for x in p0) > 0.5
    assert similarity._plane(1) != p0


def test_label_centroids_matches_numpy(spark, sf_dir):
    emb = corpus.load_embeddings(spark, sf_dir)
    got = similarity.label_centroids(emb).toPandas()
    pdf = emb.toPandas()
    for (label, dim), grp in got.groupby(["label", "dim"]):
        vecs = np.stack(pdf[pdf.label == label].embedding.to_numpy())
        exp = np.float32(vecs[:, dim].astype("float64").mean())
        row = grp.iloc[0]
        assert row.n_vectors == len(vecs)
        assert abs(row.centroid - exp) < 2e-7 * max(1.0, abs(exp))


def test_rerank_recall_vs_brute(spark, sf_dir):
    from birli_spark.operators import similarity
    from birli_spark.sources import corpus
    emb = corpus.load_embeddings(spark, sf_dir)
    brute = {(r.qid, r.rank): r.vec_id
             for r in similarity.brute_topk(emb, k=5).collect()}
    rer = {(r.qid, r.rank): r for r in
           similarity.rerank_topk(emb, k=5).collect()}
    assert set(r[0] for r in rer) == set(b[0] for b in brute)
    # conditional exactness: within each query the reranked order must be
    # the true full-cosine order of the surviving candidates — i.e. the
    # final cosines are the brute cosines (synthetic random embeddings
    # have weakly-correlated prefixes, so absolute recall is data-poor
    # here; the SHAPE — coarse prune then exact rerank — is under test)
    import numpy as np
    pdf = emb.orderBy("vec_id").toPandas()
    vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
            for r in pdf.itertuples()}
    for r in rer.values():
        a, b = vecs[r.qid], vecs[r.vec_id]
        true_cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r.cos - true_cos) < 1e-9
        assert 1 <= r.coarse_rank <= similarity.RERANK_CAND
    for qid in set(r[0] for r in rer):
        ranks = sorted(rr.rank for key, rr in rer.items() if key[0] == qid)
        coss = [rr.cos for key, rr in sorted(rer.items())
                if key[0] == qid]
        assert ranks == [1, 2, 3, 4, 5]
        assert coss == sorted(coss, reverse=True)


def test_ivfpq_topk_semantics(spark, sf_dir):
    """IVF-PQ + rerank: final ranks are by EXACT cosine over the ADC
    shortlist, every hit comes from a probed cell, and the top-1 hit
    agrees with exact search whenever brute force's best lives in a
    probed cell (rerank cannot invent candidates)."""
    from birli_spark.operators import similarity
    from birli_spark.sources import corpus
    emb = corpus.load_embeddings(spark, sf_dir)
    out = similarity.ivfpq_topk(emb).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.qid, []).append(r)
    assert set(by_q) == set(range(8))
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        # ranks are contiguous and ordered by exact cosine desc
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        coss = [r.cos for r in rows]
        assert coss == sorted(coss, reverse=True)
        assert all(r.vec_id != qid for r in rows)
    # the shortlist is ADC-based but the final score column is exact:
    # spot-check one hit against a direct cosine computation
    import math

    r0 = by_q[0][0]
    vecs = {v.vec_id: v.embedding for v in emb.filter(
        emb.vec_id.isin([0, int(r0.vec_id)])).collect()}
    a, b = vecs[0], vecs[r0.vec_id]
    dot = sum(float(x) * float(y) for x, y in zip(a, b))
    na = math.sqrt(sum(float(x) ** 2 for x in a))
    nb = math.sqrt(sum(float(x) ** 2 for x in b))
    assert abs(r0.cos - dot / (na * nb)) < 1e-9


def test_auto_nprobe_rule(spark):
    """Round 6: IVF_NPROBE=None resolves greatest(4, ceil(2*sqrt(C)))
    IN-PLAN — at the driver scale (10 cells) every query probes exactly
    7 cells; small cell counts clamp to the floor of 4. The rule is the
    same SQL text the DuckDB oracle runs, so the ANN queries stay
    hash-gated at auto defaults."""
    from birli_spark.functions import textsql as X
    from birli_spark.operators import similarity as S

    # the SQL rule itself, evaluated in-engine at a few cell counts
    for n_cells, want in ((1, 4), (4, 4), (10, 7), (100, 20), (10000, 200)):
        got = spark.sql(
            f"SELECT {S._auto_nprobe_sql(str(n_cells))} AS np"
        ).collect()[0].np
        assert got == want, (n_cells, got, want)

    # end to end: at 500 vectors / stride 50 -> 10 cells -> 7 probes
    from birli_spark.sources import corpus
    emb = corpus.load_embeddings(spark, "/root/testdata/sf0.001")
    n_vec = emb.count()
    n_cells = len([v for v in range(0, n_vec, 1)
                   if v % S.IVF_STRIDE == 0])
    import math
    want_probes = max(4, math.ceil(2.0 * math.sqrt(n_cells)))
    _assigned, qprobe = S._ivf_assignments(
        emb, n_queries=4, stride=S.IVF_STRIDE, nprobe=None)
    per_q = (qprobe.groupBy("qid").count().collect())
    assert per_q and all(r["count"] == min(want_probes, n_cells)
                         for r in per_q), (want_probes, per_q)
