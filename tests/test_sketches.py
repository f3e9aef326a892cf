"""KMV distinct sketch: exact-path semantics on tiny vocabularies,
estimate-path agreement with an independent python KMV, and DuckDB
oracle identity (the estimate itself, not just row counts)."""

from __future__ import annotations

import hashlib

import duckdb
from pyspark.sql import Row

from birli_spark.operators import sketches
from birli_spark.sources import corpus


def _mk_docs(spark, rows):
    return spark.createDataFrame([
        Row(doc_id=i, text=t, lang="en", source=s, n_chars=len(t))
        for i, (s, t) in enumerate(rows)])


def _py_kmv(tokens, k):
    hs = sorted({hashlib.md5(t.encode()).hexdigest() for t in tokens})
    if len(hs) < k:
        return float(len(hs))
    frac = max(int(hs[k - 1][:8], 16), 1)
    return (k - 1) * 4294967296.0 / frac


def test_kmv_exact_path_small_vocab(spark):
    docs = _mk_docs(spark, [("a", "x y z x"), ("a", "y w"),
                            ("b", "p q")])
    out = {r.source: r for r in
           sketches.kmv_distinct_tokens(docs, k=64).collect()}
    assert out["a"].exact_distinct == 4      # x y z w
    assert out["a"].kmv_distinct == 4.0      # sketch saw everything
    assert out["b"].exact_distinct == 2
    assert out["b"].kmv_distinct == 2.0


def test_kmv_estimate_path_matches_python(spark):
    # 500 distinct tokens >> k=16: the estimate path must engage and
    # match an independently-computed KMV exactly (same md5, same k)
    toks = [f"tok{i}" for i in range(500)]
    text = " ".join(toks)
    docs = _mk_docs(spark, [("a", text), ("a", " ".join(toks[:100]))])
    out = sketches.kmv_distinct_tokens(docs, k=16).collect()[0]
    assert out.exact_distinct == 500
    exp = _py_kmv(toks, 16)
    assert out.kmv_distinct == exp
    # sanity: the estimate is in the right ballpark
    assert 0.5 * 500 <= out.kmv_distinct <= 2.0 * 500


def test_kmv_oracle_identity(spark, sf_dir):
    got = (sketches.kmv_distinct_tokens(
        corpus.load_documents(spark, sf_dir)).orderBy("source").toPandas())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    exp = (con.execute(sketches.kmv_distinct_tokens_oracle_sql())
           .df().sort_values("source", ignore_index=True))
    assert got.source.tolist() == exp.source.tolist()
    assert got.exact_distinct.tolist() == exp.exact_distinct.tolist()
    # bit-exact estimate across engines — the whole point of md5-KMV
    assert got.kmv_distinct.tolist() == exp.kmv_distinct.tolist()


def test_cms_overestimates_and_tracks_exact(spark):
    # token "a" appears 50x, "b" 30x, others once — CMS min-estimate must
    # be >= exact (collisions only add) and equal where no collision
    text = " ".join(["a"] * 50 + ["b"] * 30 + [f"z{i}" for i in range(10)])
    docs = _mk_docs(spark, [("s", text)])
    out = {r.term: r for r in
           sketches.cms_heavy_hitters(docs, top_k=5).collect()}
    assert out["a"].tf_exact == 50 and out["a"].cms_estimate >= 50
    assert out["b"].tf_exact == 30 and out["b"].cms_estimate >= 30
    assert len(out) == 5
    # with 4 independent rows of width 256 over a 12-term vocab, the min
    # row is collision-free here
    assert out["a"].cms_estimate == 50


def test_cms_oracle_identity(spark, sf_dir):
    got = (sketches.cms_heavy_hitters(
        corpus.load_documents(spark, sf_dir)).orderBy("term").toPandas())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    exp = (con.execute(sketches.cms_heavy_hitters_oracle_sql())
           .df().sort_values("term", ignore_index=True))
    assert got.term.tolist() == exp.term.tolist()
    assert got.tf_exact.tolist() == exp.tf_exact.tolist()
    assert got.cms_estimate.tolist() == exp.cms_estimate.tolist()


def test_hex32_fold_cross_engine_bulk(spark):
    # the digit fold must equal int(hex[:8], 16) in BOTH engines — checked
    # in bulk (200 random-ish md5 strings via md5 of counters)
    import hashlib
    from birli_spark.functions import textsql as X
    from birli_spark.operators.sketches import _hex32
    hs = [hashlib.md5(str(i).encode()).hexdigest() for i in range(200)]
    exp = [int(h[:8], 16) for h in hs]
    got_spark = [r.v for r in spark.createDataFrame(
        [(h,) for h in hs], "h string")
        .selectExpr(f"{_hex32(X.SPARK, 'h')} AS v").collect()]
    assert got_spark == exp
    con = duckdb.connect()
    got_duck = [r[0] for r in con.execute(
        "SELECT " + _hex32(X.DUCK, "h") + " FROM (SELECT unnest(?) AS h)",
        [hs]).fetchall()]
    assert got_duck == exp


def test_bloom_membership_semantics(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    got = sketches.bloom_membership(orders, customer).toPandas()
    n_cust = customer.count()
    members = {p: set(r.o_custkey for r in rows.itertuples())
               for p, rows in orders.select(
                   "o_orderpriority", "o_custkey").toPandas().groupby(
                   "o_orderpriority")}
    assert set(got.o_orderpriority) == set(members)
    for _, r in got.iterrows():
        # no false negatives, FP accounting closes, bounded filter
        assert r.n_probed == n_cust
        assert r.n_members == len(
            members[r.o_orderpriority] & set(
                x.c_custkey for x in customer.select(
                    "c_custkey").collect()))
        assert r.n_maybe >= r.n_members
        assert r.false_positives == r.n_maybe - r.n_members
        assert 0 < r.n_bits_set <= sketches.BLOOM_M


def test_bloom_fp_rate_reasonable(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    got = sketches.bloom_membership(orders, customer).toPandas()
    # m=4096, k=3, n<=~1500 members -> theoretical FP < ~20%; require
    # the filter actually filters (not everything "maybe")
    for _, r in got.iterrows():
        non_members = r.n_probed - r.n_members
        if non_members > 20:
            assert r.false_positives / non_members < 0.5


def test_hist_quantiles_close_to_exact(spark, sf_dir):
    from birli_spark.sources import corpus
    docs = corpus.load_documents(spark, sf_dir)
    got = sketches.hist_quantiles(docs).toPandas().sort_values("p")
    assert list(got.p) == [0.5, 0.9, 0.99]
    w = (sketches.HIST_HI - sketches.HIST_LO) / sketches.HIST_BINS
    for _, r in got.iterrows():
        # estimate within one bin width of the exact percentile
        assert abs(r.hist_q - r.exact_q) <= w + 1e-6


def test_hll_windowed_estimates_track_exact(spark, sf_dir):
    from birli_spark.sources import corpus
    ev = corpus.load_events(spark, sf_dir)
    got = sketches.hll_windowed_users(ev).toPandas()
    assert len(got) > 0
    # estimates within the usual HLL error envelope (1.04/sqrt(256) ~ 6.5%,
    # allow 4 sigma) of the exact windowed distinct
    for r in got.itertuples():
        assert r.exact_distinct > 0
        assert 0 < r.v_nonempty <= sketches.HLL_M
        rel = abs(r.hll_estimate - r.exact_distinct) / r.exact_distinct
        assert rel < 0.26, (r.hour, r.hll_estimate, r.exact_distinct)


def test_hll_windowed_window_is_trailing(spark):
    from pyspark.sql import Row
    h = sketches._US_PER_HOUR * 1000  # ns per hour
    # user 1 only in hour 0; window 6 -> hours 0..5 include it, hour 6 not
    rows = [Row(event_id=1, ts=0, user_id=1, event_type="x",
                value=1.0, props="{}"),
            Row(event_id=2, ts=6 * h, user_id=2, event_type="x",
                value=1.0, props="{}")]
    out = {r.hour: r.exact_distinct for r in
           sketches.hll_windowed_users(
               spark.createDataFrame(rows)).collect()}
    assert out[0] == 1
    assert out[6] == 1   # hour 0 fell out of the trailing window


def test_theta_sketch_pairs_exact_when_exhaustive(spark):
    from pyspark.sql import Row
    from birli_spark.operators import sketches
    # tiny docs: sketches hold everything, so estimates are exact set
    # sizes. doc sources share exactly the shingle "a b c".
    docs = spark.createDataFrame([
        Row(doc_id=1, text="a b c d e", lang="en", source="s1", n_chars=0),
        Row(doc_id=2, text="a b c x y", lang="en", source="s2", n_chars=0)])
    out = sketches.theta_sketch_pairs(docs).collect()
    assert len(out) == 1
    r = out[0]
    # s1 shingles: {a b c, b c d, c d e}; s2: {a b c, b c x, c x y}
    assert r.n_inter == 1 and r.n_union == 5
    assert r.est_intersect == 1.0 and r.est_union == 5.0
    assert abs(r.est_jaccard - 0.2) < 1e-12


def test_theta_sketch_estimates_track_exact(spark, sf_dir):
    from birli_spark.operators import sketches
    from birli_spark.sources import corpus
    docs = corpus.load_documents(spark, sf_dir)
    out = sketches.theta_sketch_pairs(docs, k=128).toPandas()
    assert (out.est_union >= out.est_intersect - 1e-9).all()
    assert ((out.est_jaccard >= 0) & (out.est_jaccard <= 1)).all()
    # thresholded sketches must extrapolate beyond the retained minima
    assert (out.est_union > out.n_union).any()
