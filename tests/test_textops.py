"""Semantic tests for the text-analysis operators: results are recomputed
independently in Python (collections.Counter / hashlib) — not just
cross-checked against the SQL oracle, which the driver already does."""

from __future__ import annotations

import hashlib

from birli_spark.operators import text
from birli_spark.sources import corpus


def _docs_pdf(spark, sf_dir, n=25):
    df = corpus.load_documents(spark, sf_dir)
    return df.filter(f"doc_id < {n}"), (
        df.filter(f"doc_id < {n}").orderBy("doc_id").toPandas())


def test_token_stats_matches_python(spark, sf_dir):
    docs, pdf = _docs_pdf(spark, sf_dir)
    got = text.token_stats(docs).orderBy("doc_id").toPandas()
    for _, row in pdf.iterrows():
        toks = row["text"].strip().split(" ")
        g = got[got.doc_id == row.doc_id].iloc[0]
        assert g.n_tokens == len(toks)
        assert g.n_unique == len(set(toks))
        n_stop = sum(t in text.EN_STOPWORDS for t in toks)
        assert g.stopword_ratio == n_stop / len(toks)
        assert g.mean_token_len == sum(map(len, toks)) / len(toks)
        assert 0.0 <= g.quality_score <= 1.1


def test_lang_id_scores_match_python(spark, sf_dir):
    docs, pdf = _docs_pdf(spark, sf_dir)
    got = text.lang_id(docs).orderBy("doc_id").toPandas()
    for _, row in pdf.iterrows():
        toks = row["text"].strip().split(" ")
        g = got[got.doc_id == row.doc_id].iloc[0]
        for lang, markers in text.LANG_MARKERS.items():
            assert g[f"score_{lang}"] == sum(t in markers for t in toks)
        # synthetic corpus: 'the'/'a' always present -> en unless tie upset
        assert g.pred_lang in set(text.LANG_MARKERS) | {"und"}


def test_fingerprint_matches_hashlib(spark, sf_dir):
    docs, pdf = _docs_pdf(spark, sf_dir, n=5)
    got = text.fingerprint(docs).orderBy("doc_id").toPandas()
    for _, row in pdf.iterrows():
        toks = row["text"].strip().split(" ")
        shingles = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
        expect = min(
            hashlib.md5(f"0#{s}".encode()).hexdigest()[:16] for s in shingles)
        g = got[got.doc_id == row.doc_id].iloc[0]
        assert g.n_shingles == len(shingles)
        assert g.fingerprint == expect


def test_vocab_stats_matches_python(spark, sf_dir):
    docs = corpus.load_documents(spark, sf_dir).filter("doc_id < 100")
    got = (text.vocab_stats(docs, top_n=20).toPandas()
           .sort_values("rank").reset_index(drop=True))
    from collections import Counter
    tf, df = Counter(), Counter()
    for r in docs.select("doc_id", "text").collect():
        toks = [t for t in r.text.strip().split(" ") if t]
        tf.update(toks)
        df.update(set(toks))
    expect = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(zip(got.term, got.tf_total)) == expect
    assert all(df[t] == d for t, d in zip(got.term, got.df))
    assert got["rank"].tolist() == list(range(1, len(expect) + 1))


def test_tfidf_top_terms_exact(spark):
    import math

    import numpy as np
    docs = spark.createDataFrame([
        (0, "apple banana apple cherry"),
        (1, "banana banana date"),
        (2, "apple elderberry elderberry elderberry"),
    ], ["doc_id", "text"])
    got = {(r.doc_id, r.rnk): r
           for r in text.tfidf_top_terms(docs, k=2).collect()}
    # brute-force recomputation
    corpus_toks = [["apple", "banana", "apple", "cherry"],
                   ["banana", "banana", "date"],
                   ["apple", "elderberry", "elderberry", "elderberry"]]
    df = {}
    for toks in corpus_toks:
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    for d, toks in enumerate(corpus_toks):
        scores = sorted(
            ((np.float32(toks.count(t) * math.log(3.0 / df[t])), t)
             for t in set(toks)),
            key=lambda p: (-p[0], p[1]))
        for rnk, (s, t) in enumerate(scores[:2], start=1):
            r = got[(d, rnk)]
            assert r.term == t and abs(r.tfidf - float(s)) < 1e-12


def test_length_quantiles_interpolation(spark):
    from pyspark.sql import Row
    rows = [Row(doc_id=i, text="x", lang="en", source="s", n_chars=c)
            for i, c in enumerate([10, 20, 30, 40])]
    out = text.length_quantiles(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    r = out[0]
    # linear interpolation over sorted [10,20,30,40]: p25 at idx 0.75
    assert r.n_docs == 4
    assert abs(r.p25_chars - 17.5) < 1e-9
    assert abs(r.p50_chars - 25.0) < 1e-9
    assert abs(r.p90_chars - 37.0) < 1e-9


def test_top_bigrams_counts(spark):
    from pyspark.sql import Row
    rows = [
        Row(doc_id=1, text="a b a b c", lang="en", source="s", n_chars=9),
        Row(doc_id=2, text="a b", lang="en", source="s", n_chars=3),
        Row(doc_id=3, text="solo", lang="fr", source="s", n_chars=4),
    ]
    out = text.top_bigrams(spark.createDataFrame(rows), k=2).collect()
    en = {r.bigram: (r.n_occurrences, r.rank) for r in out if r.lang == "en"}
    # "a b" occurs 3x (2 in doc1 + 1 in doc2), "b a" and "b c" once each;
    # tie at rank 2 breaks lexicographically -> "b a".
    assert en["a b"] == (3, 1)
    assert en["b a"] == (1, 2)
    assert not [r for r in out if r.lang == "fr"]  # 1 token -> no bigram


def test_redact_counts_and_scrubs(spark):
    from pyspark.sql import Row
    import hashlib
    rows = [Row(doc_id=0, text="the cat and the dog of thine",
                lang="en", source="s", n_chars=28),
            Row(doc_id=1, text="nothing matches here",
                lang="en", source="s", n_chars=20)]
    out = {r.doc_id: r for r in text.redact(spark.createDataFrame(rows)).collect()}
    assert out[0].n_redacted == 4        # the, and, the, of — not "thine"
    exp = "<REDACTED> cat <REDACTED> <REDACTED> dog <REDACTED> thine"
    assert out[0].redacted_md5 == hashlib.md5(exp.encode()).hexdigest()
    assert out[1].n_redacted == 0
    assert out[1].redacted_md5 == hashlib.md5(
        b"nothing matches here").hexdigest()


def test_repetition_stats_exact(spark):
    from pyspark.sql import Row
    docs = spark.createDataFrame([
        Row(doc_id=1, text="a b a b a", lang="en", source="s", n_chars=9),
        Row(doc_id=2, text="x y z", lang="en", source="s", n_chars=5),
        Row(doc_id=3, text="w", lang="en", source="s", n_chars=1),
    ])
    out = {r.doc_id: r for r in text.repetition_stats(docs).collect()}
    r1 = out[1]  # tokens a,b,a,b,a; bigrams ab,ba,ab,ba; trigrams aba,bab,aba
    assert r1.n_tokens == 5
    assert abs(r1.top_token_frac - 3 / 5) < 1e-6
    assert abs(r1.dup_bigram_frac - 2 / 4) < 1e-6
    assert abs(r1.dup_trigram_frac - 1 / 3) < 1e-6
    r2 = out[2]  # all distinct
    assert r2.dup_bigram_frac == 0.0 and r2.dup_trigram_frac == 0.0
    r3 = out[3]  # single token: no shingles at all -> 0.0 guards
    assert r3.n_tokens == 1
    assert r3.dup_bigram_frac == 0.0 and r3.dup_trigram_frac == 0.0
    assert r3.top_token_frac == 1.0


def test_rarity_stats_constructed(spark):
    from pyspark.sql import Row
    docs = spark.createDataFrame([
        Row(doc_id=0, text="apple banana apple"),
        Row(doc_id=1, text="banana cherry"),
    ])
    from birli_spark.operators import text as textops
    out = {r.doc_id: r for r in textops.rarity_stats(docs).collect()}
    # df: apple=1 (doc0 only), banana=2, cherry=1
    d0 = out[0]
    assert d0.n_tokens == 3 and d0.n_distinct == 2
    assert d0.n_hapax == 2          # two "apple" instances, df=1
    assert d0.sum_df == 1 + 2 + 1   # apple, banana, apple
    assert d0.max_df == 2
    d1 = out[1]
    assert d1.n_hapax == 1 and d1.max_df == 2 and d1.sum_df == 3


def test_bpe_pairs_match_python(spark, sf_dir):
    from collections import Counter
    docs, pdf = _docs_pdf(spark, sf_dir, n=500)
    got = text.bpe_pair_stats(docs, top_n=20).toPandas()
    wfreq = Counter()
    for _, row in pdf.iterrows():
        wfreq.update(t for t in row["text"].strip().split(" ") if t)
    totals, nwords = Counter(), Counter()
    for w, c in wfreq.items():
        for i in range(len(w) - 1):
            pass
        for p in {w[i:i + 2] for i in range(len(w) - 1)}:
            nwords[p] += 1
        for i in range(len(w) - 1):
            totals[w[i:i + 2]] += c
    exp = sorted(totals.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r.pair, r.total_count) for _, r in got.iterrows()] == exp
    for _, r in got.iterrows():
        assert r.n_words == nwords[r.pair]


def test_chunk_udtf_windows(spark, sf_dir):
    import hashlib
    docs, pdf = _docs_pdf(spark, sf_dir, n=15)
    got = text.chunk_documents(docs, spark).toPandas()
    for _, row in pdf.iterrows():
        toks = [t for t in row["text"].strip().split(" ") if t]
        sub = got[got.doc_id == row.doc_id].sort_values("chunk_idx")
        starts = list(range(0, max(len(toks) - text.CHUNK_SIZE, 0) + 1,
                            text.CHUNK_STRIDE))
        if starts[-1] + text.CHUNK_SIZE < len(toks):
            starts.append(starts[-1] + text.CHUNK_STRIDE)
        assert list(sub.chunk_idx) == list(range(len(starts)))
        for i, s in enumerate(starts):
            piece = toks[s:s + text.CHUNK_SIZE]
            r = sub.iloc[i]
            assert r.n_tokens == len(piece)
            assert r.chunk_md5 == hashlib.md5(
                " ".join(piece).encode()).hexdigest()


def test_pmi_collocations_match_python(spark, sf_dir):
    import math
    from collections import Counter
    docs, pdf = _docs_pdf(spark, sf_dir, n=500)
    got = text.pmi_collocations(docs, min_count=20, top_n=15).toPandas()
    uni, bi = Counter(), Counter()
    n_tot = 0
    for _, row in pdf.iterrows():
        toks = row["text"].strip().split(" ")
        toks_nz = [t for t in toks if t]
        uni.update(toks_nz)
        n_tot += len(toks_nz)
        bi.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    assert len(got) == 15
    prev = None
    for _, r in got.iterrows():
        assert bi[r.pair] == r.c_ab and r.c_ab >= 20
        a, b = r.pair.split(" ")
        assert uni[a] == r.c_a and uni[b] == r.c_b
        pmi_ref = math.log2(n_tot * r.c_ab / (r.c_a * r.c_b))
        assert abs(r.pmi_ticks / (1 << 24) - pmi_ref) < 1e-4
        if prev is not None:
            assert r.pmi_ticks <= prev
        prev = r.pmi_ticks


def test_dsir_weights_semantics(spark):
    """DSIR importance: a doc whose bigrams land in high-target-weight
    buckets scores higher than one in low-weight buckets; empty/1-token
    docs get weight 0; ticks are exact integers."""
    from pyspark.sql import Row

    from birli_spark.operators import text as textops
    docs = spark.createDataFrame([
        Row(doc_id=1, text="alpha beta alpha beta alpha", lang="en",
            source="s", n_chars=27),
        Row(doc_id=2, text="gamma delta gamma delta gamma", lang="en",
            source="s", n_chars=29),
        Row(doc_id=3, text="single", lang="en", source="s", n_chars=6),
    ])
    out = {r.doc_id: r for r in textops.dsir_weights(docs).collect()}
    assert out[1].n_bigrams == 4 and out[2].n_bigrams == 4
    assert out[3].n_bigrams == 0 and out[3].importance_ticks == 0
    # weights differ between the two docs (different buckets) and are
    # reproducible run to run
    assert out[1].importance_ticks != out[2].importance_ticks
    again = {r.doc_id: r for r in textops.dsir_weights(docs).collect()}
    assert again[1].importance_ticks == out[1].importance_ticks


def test_novelty_first_doc_wins(spark):
    from pyspark.sql import Row

    from birli_spark.operators import text as textops
    shared = "a b c d e f g h"          # exactly one 8-shingle
    docs = spark.createDataFrame([
        Row(doc_id=1, text=shared, lang="en", source="s", n_chars=0),
        Row(doc_id=2, text=shared, lang="en", source="s", n_chars=0),
        Row(doc_id=3, text="q r s t u v w x", lang="en", source="s",
            n_chars=0),
        Row(doc_id=4, text="too short", lang="en", source="s", n_chars=0)])
    out = {r.doc_id: r for r in textops.novelty_stats(docs).collect()}
    assert out[1].novelty == 1.0          # first occurrence
    assert out[2].novelty == 0.0          # pure repeat of doc 1
    assert out[3].novelty == 1.0
    assert out[4].n_shingles == 0 and out[4].novelty == 0.0
