"""Corpus-cleaning pipeline: constructed corpus with one exact dupe, one
near-dupe, and one junk doc — survivors and removal reasons are known."""

from __future__ import annotations

from pyspark.sql import Row

from birli_spark.operators import corpus_clean
from birli_spark.sources import corpus

GOOD = ("the quick brown fox jumps over the lazy dog while many other "
        "animals watch the scene with great interest and some concern")
NEAR = GOOD.replace("dog", "cat")          # high shingle overlap with GOOD
JUNK = "a a a a a a a a a a a a"           # all stopwords, zero diversity


def test_clean_corpus_drops_the_right_docs(spark):
    docs = spark.createDataFrame([
        Row(doc_id=0, text=GOOD, lang="en", source="s0", n_chars=len(GOOD)),
        Row(doc_id=1, text=GOOD, lang="en", source="s1", n_chars=len(GOOD)),
        Row(doc_id=2, text=NEAR, lang="en", source="s2", n_chars=len(NEAR)),
        Row(doc_id=3, text=JUNK, lang="en", source="s3", n_chars=len(JUNK)),
        Row(doc_id=4, text="completely unrelated words forming a decent "
                           "document about spark physical query planning",
            lang="en", source="s4", n_chars=90),
    ])
    out = corpus_clean.clean_corpus(docs).toPandas()
    survivors = set(out.doc_id)
    assert 0 in survivors                  # cluster representative kept
    assert 1 not in survivors              # exact dupe of 0
    assert 2 not in survivors              # near-dupe of 0 (jaccard > 0.7)
    assert 3 not in survivors              # quality below threshold
    assert 4 in survivors
    assert (out.quality_score >= corpus_clean.QUALITY_MIN).all()

def test_stratified_sample_matches_python_predicate(spark, sf_dir):
    import hashlib

    from birli_spark.sources import corpus
    docs = corpus.load_documents(spark, sf_dir)
    got = {r.doc_id for r in
           corpus_clean.stratified_sample(docs).collect()}
    pdf = docs.select("doc_id", "lang").toPandas()
    expect = set()
    for r in pdf.itertuples():
        rate = corpus_clean.SAMPLE_RATES.get(
            r.lang, corpus_clean.SAMPLE_DEFAULT_RATE)
        bucket = hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8]
        if bucket < corpus_clean._rate_to_hex(rate):
            expect.add(r.doc_id)
    assert got == expect
    # sanity: the en stratum was actually thinned, rare strata survive
    n_en = (pdf.lang == "en").sum()
    kept_en = sum(1 for r in pdf.itertuples()
                  if r.lang == "en" and r.doc_id in got)
    if n_en > 50:
        assert 0.3 < kept_en / n_en < 0.7


def test_rate_to_hex_thresholds():
    assert corpus_clean._rate_to_hex(0.5) == "80000000"
    assert corpus_clean._rate_to_hex(0.0) == "00000000"
    assert corpus_clean._rate_to_hex(1.0) == "g"
    assert "ffffffff" < "g"  # the keep-everything sentinel really keeps all


def test_weighted_sample_priority_math(spark, sf_dir):
    import hashlib
    from birli_spark.operators import corpus_clean
    from birli_spark.sources import corpus
    docs = corpus.load_documents(spark, sf_dir)
    got = corpus_clean.weighted_sample(docs, k=20).toPandas()
    pdf = docs.select("doc_id", "n_chars").toPandas()
    prios = {}
    for r in pdf.itertuples():
        u = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16) \
            / 4294967296.0
        prios[r.doc_id] = u / r.n_chars
    exp = sorted(prios, key=lambda d: (prios[d], d))[:20]
    assert got.doc_id.tolist() == exp
    assert got["rank"].tolist() == list(range(1, 21))
    # long docs are favored: the sample's mean length beats the corpus's
    assert got.n_chars.mean() > pdf.n_chars.mean()


def test_classifier_score_matches_python(spark, sf_dir):
    import hashlib

    from birli_spark.operators.corpus_clean import CLF_BIAS, CLF_RANGE

    def w(tok: str) -> int:
        h = hashlib.md5(tok.encode()).hexdigest()
        return (int(h[0], 16) * 16 + int(h[1], 16)) % CLF_RANGE - 8

    docs = corpus.load_documents(spark, sf_dir)
    out = corpus_clean.classifier_score(docs).orderBy("doc_id").collect()
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    for r in out[:50]:
        toks = [t for t in texts[r.doc_id].strip(" ").split(" ") if t]
        exp = CLF_BIAS + sum(w(t) for t in toks)
        assert r.clf_score == exp and r.n_toks == len(toks)
        assert r.keep == (exp > 0)


def test_domain_mix_plan_invariants(spark, sf_dir):
    import math
    out = corpus_clean.domain_mix_plan(
        corpus.load_documents(spark, sf_dir)).collect()
    assert len(out) > 1
    total = sum(r.n_docs for r in out)
    for r in out:
        assert r.weight == math.isqrt(r.n_docs)
        assert 0 <= r.rate_ppm <= 1_000_000
        assert r.planned_docs == total * r.mix_ppm // 1_000_000
    # floor-division shares can't exceed one whole
    assert sum(r.mix_ppm for r in out) <= 1_000_000
    # sqrt-temperature never boosts the head (equality iff uniform mix)
    big = max(out, key=lambda r: r.n_docs)
    assert big.mix_ppm / 1e6 <= big.n_docs / total


def test_domain_mix_plan_flattens_skew(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="x", lang="en",
             source="head" if i < 900 else "tail", n_chars=1)
         for i in range(1000)])
    out = {r.source: r for r in corpus_clean.domain_mix_plan(docs).collect()}
    # corpus is 90/10 head/tail; the sqrt plan is 30:10 -> 75/25
    assert out["head"].mix_ppm / 1e6 < 0.9
    assert out["tail"].mix_ppm / 1e6 > 0.1
    # head downsamples, tail keeps everything
    assert out["head"].rate_ppm < 1_000_000
    assert out["tail"].rate_ppm == 1_000_000


def test_leakage_safe_split_clusters_never_straddle(spark, sf_dir):
    from pyspark.sql import functions as F

    from birli_spark.operators import corpus_clean
    from birli_spark.sources import corpus
    out = corpus_clean.leakage_safe_split(
        corpus.load_documents(spark, sf_dir))
    per_cluster = (out.groupBy("cluster_id")
                   .agg(F.countDistinct("split").alias("n_splits"),
                        F.count("*").alias("n")))
    rows = per_cluster.collect()
    assert all(r.n_splits == 1 for r in rows)          # no straddling
    assert any(r.n > 1 for r in rows)                  # real clusters exist
    splits = {r.split for r in out.select("split").distinct().collect()}
    assert "train" in splits and len(splits) >= 2


# ------------------------------------------------ T30: PII scrub ---

def test_pii_scrub_counts_and_redaction(spark):
    from pyspark.sql import Row

    from birli_spark.operators import text as T

    docs = spark.createDataFrame([
        Row(doc_id=0, text="mail me at jo.doe+x@example.org or "
                           "admin@sub.example.co soon"),
        Row(doc_id=1, text="server at 10.0.255.3 then 192.168.1.10 up"),
        Row(doc_id=2, text="call +61 (08) 9999-1234 after lunch"),
        Row(doc_id=3, text="no personal information in this row"),
    ])
    out = {r.doc_id: r for r in T.pii_scrub(docs).collect()}
    assert out[0].n_email == 2 and out[0].n_ipv4 == 0
    assert out[1].n_ipv4 == 2 and out[1].n_email == 0
    assert out[2].n_phone == 1
    assert (out[3].n_email, out[3].n_ipv4, out[3].n_phone) == (0, 0, 0)
    # scrubbed text no longer matches any pattern (hash of a clean doc
    # differs from the raw hash only when something was scrubbed)
    import hashlib
    raw3 = hashlib.md5(b"no personal information in this row").hexdigest()
    assert out[3].scrubbed_md5 == raw3
    assert out[0].scrubbed_md5 != hashlib.md5(
        b"mail me at jo.doe+x@example.org or admin@sub.example.co soon"
    ).hexdigest()


def test_pii_scrub_cross_engine(spark):
    """Spark (Java regex) and DuckDB (RE2) agree match-for-match on the
    lookahead-free pattern classes, on text WITH planted PII."""
    import duckdb
    import pandas as pd
    from pyspark.sql import Row

    from birli_spark.operators import text as T

    rows = [
        Row(doc_id=0, text="a@b.io and c.d-e@f.gh.ij plus +1 555 010 9999"),
        Row(doc_id=1, text="1.2.3.4 5.6.7.8 bare 999.999.999.999 still"),
        Row(doc_id=2, text="email-less +44 20 7946 0958 and (not) phone"),
        Row(doc_id=3, text="clean"),
    ]
    docs = spark.createDataFrame(rows)
    got = T.pii_scrub(docs).toPandas().sort_values("doc_id") \
        .reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", pd.DataFrame([r.asDict() for r in rows]))
    want = con.execute(T.pii_scrub_oracle_sql()).df() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64"}), want.astype({"doc_id": "int64"}))
