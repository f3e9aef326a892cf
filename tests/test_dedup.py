"""Semantic tests for the dedup family on constructed corpora with known
duplicate structure (plus brute-force recomputation in Python)."""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pytest
from pyspark.sql import Row

from birli_spark.operators import dedup


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])


BASE = "the quick brown fox jumps over the lazy dog again and again today"


def test_exact_dedup_groups(spark):
    docs = _mk_docs(spark, [BASE, BASE, BASE + " x", "totally different words"])
    out = {r.doc_id: r for r in dedup.exact_dedup(docs).collect()}
    assert out[0].keep_doc_id == 0 and not out[0].is_dupe
    assert out[1].keep_doc_id == 0 and out[1].is_dupe
    assert out[1].group_size == 2
    assert out[2].keep_doc_id == 2 and not out[2].is_dupe


def _py_jaccard(a, b, n=3):
    sa = {" ".join(a[i:i + n]) for i in range(len(a) - n + 1)}
    sb = {" ".join(b[i:i + n]) for i in range(len(b) - n + 1)}
    return len(sa & sb) / len(sa | sb)


def test_shingle_jaccard_exact_values(spark):
    texts = [BASE,
             BASE.replace("dog", "cat"),
             "one two three four five six seven eight nine ten"]
    docs = _mk_docs(spark, texts)
    got = {(r.doc_a, r.doc_b): r.jaccard
           for r in dedup.shingle_jaccard_pairs(docs, threshold=0.01).collect()}
    toks = [t.split(" ") for t in texts]
    for i, j in itertools.combinations(range(3), 2):
        expect = _py_jaccard(toks[i], toks[j])
        if expect > 0.01:
            assert abs(got[(i, j)] - expect) < 1e-15
        else:
            assert (i, j) not in got


def test_minhash_lsh_finds_duplicates(spark):
    texts = [BASE, BASE, BASE.replace("dog", "cat"),
             "one two three four five six seven eight nine ten"]
    docs = _mk_docs(spark, texts)
    got = {(r.doc_a, r.doc_b): r.jaccard
           for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert got[(0, 1)] == 1.0           # identical docs always collide
    assert (0, 3) not in got and (1, 3) not in got


def test_simhash_identical_docs_distance_zero(spark):
    texts = [BASE, BASE, "one two three four five six seven eight nine ten"]
    docs = _mk_docs(spark, texts)
    sigs = {r.doc_id: r.sig for r in dedup.simhash_signatures(docs).collect()}
    assert sigs[0] == sigs[1]
    assert 0 <= sigs[0] < 1 << 16
    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in dedup.simhash_pairs(docs, max_hamming=0).collect()}
    assert pairs[(0, 1)] == 0


def test_simhash_band_recall_vs_bruteforce(spark, sf_dir):
    """4 bands x 4 bits must recover ALL pairs with hamming <= 3
    (pigeonhole) — checked against a brute-force O(n^2) scan."""
    from birli_spark.sources import corpus
    docs = corpus.load_documents(spark, sf_dir).filter("doc_id < 60")
    sigs = {r.doc_id: r.sig for r in dedup.simhash_signatures(docs).collect()}
    brute = {(a, b): bin(sigs[a] ^ sigs[b]).count("1")
             for a, b in itertools.combinations(sorted(sigs), 2)
             if bin(sigs[a] ^ sigs[b]).count("1") <= 3}
    got = {(r.doc_a, r.doc_b): r.hamming
           for r in dedup.simhash_pairs(docs, max_hamming=3).collect()}
    assert got == brute


def test_embedding_neardup_exact_cosine(spark):
    rng = np.random.default_rng(7)
    v = rng.normal(size=8).astype(np.float32)
    rows = [Row(vec_id=0, embedding=[float(x) for x in v]),
            Row(vec_id=1, embedding=[float(x) for x in v]),          # identical
            Row(vec_id=2, embedding=[float(-x) for x in v]),         # opposite
            Row(vec_id=3, embedding=[float(x) for x in rng.normal(size=8)])]
    out = {(r.vec_a, r.vec_b): r.cos
           for r in dedup.embedding_neardup(
               spark.createDataFrame(rows), tau=0.99).collect()}
    assert (0, 1) in out and abs(out[(0, 1)] - 1.0) < 1e-12
    assert (0, 2) not in out


def test_neardup_clusters_transitive(spark):
    # doc1 ~ doc0 and doc1 ~ doc2, but doc0 and doc2 differ in two words
    # (below threshold) — transitivity must still cluster all three
    texts = [BASE,
             BASE.replace("dog", "cat"),
             BASE.replace("dog", "cat").replace("quick", "slow"),
             "one two three four five six seven eight nine ten",
             "one two three four five six seven eight nine ten"]
    docs = _mk_docs(spark, texts)
    pairs = {(r.doc_a, r.doc_b)
             for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert (0, 1) in pairs and (1, 2) in pairs and (0, 2) not in pairs
    out = {r.doc_id: r for r in dedup.neardup_clusters(docs, 0.5).collect()}
    assert [out[i].cluster_id for i in range(5)] == [0, 0, 0, 3, 3]
    assert out[2].cluster_size == 3 and out[2].is_dupe
    assert out[0].cluster_size == 3 and not out[0].is_dupe
    assert out[3].cluster_size == 2 and not out[3].is_dupe


def test_neardup_clusters_singletons_only(spark):
    docs = _mk_docs(spark, ["alpha beta gamma delta epsilon zeta eta",
                            "one two three four five six seven"])
    out = {r.doc_id: r for r in dedup.neardup_clusters(docs).collect()}
    assert all(out[i].cluster_id == i and out[i].cluster_size == 1
               and not out[i].is_dupe for i in range(2))


def _py_components(n_vertices, edges):
    parent = list(range(n_vertices))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in {x for e in edges for x in e}}


def test_connected_components_vs_union_find(spark):
    # adversarial shapes for label propagation: a long chain (diameter =
    # length), a star, a cycle, descending-id edges, and an isolated pair
    edges = (
        [(i, i + 1) for i in range(10, 20)]          # chain 10..20
        + [(30, j) for j in range(31, 38)]           # star at 30
        + [(40, 41), (41, 42), (42, 43), (43, 40)]   # cycle
        + [(52, 51), (51, 50)]                       # labels must flow "up"
        + [(60, 61)]
    )
    rng = np.random.default_rng(7)
    perm = rng.permutation(len(edges))
    shuffled = [edges[i] for i in perm]
    pairs = spark.createDataFrame(
        [Row(doc_a=a, doc_b=b) for a, b in shuffled])
    exp = _py_components(70, edges)
    # driver union-find path (small graph) and distributed label
    # propagation (forced via driver_max_edges=0) must agree exactly
    got = {r.u: r.lbl for r in dedup.connected_components(pairs).collect()}
    assert got == exp
    got_dist = {r.u: r.lbl for r in dedup.connected_components(
        pairs, driver_max_edges=0).collect()}
    assert got_dist == exp


def test_connected_components_pointer_doubling_long_chain(spark):
    # chain of diameter 40: plain min-propagation needs ~40 rounds, the
    # pointer-doubling variant O(log d) — must converge well under that
    edges = [(i, i + 1) for i in range(100, 140)]
    pairs = spark.createDataFrame([Row(doc_a=a, doc_b=b) for a, b in edges])
    got = {r.u: r.lbl
           for r in dedup.connected_components(
               pairs, max_iter=10, driver_max_edges=0).collect()}
    assert got == {v: 100 for v in range(100, 141)}
    # and an impossible budget raises instead of returning split labels
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(pairs, max_iter=1, driver_max_edges=0)


def test_minhash_bucket_cap_drops_hot_bucket(spark):
    # 6 identical docs form one hot band bucket (size 6); one genuine
    # near-dup pair sits in a small bucket and must survive the cap
    texts = [BASE] * 6 + [BASE.replace("dog", "cat").replace("fox", "ox"),
                          BASE.replace("dog", "cat").replace("fox", "ox")
                          + " extra"]
    docs = _mk_docs(spark, texts)
    capped = {(r.doc_a, r.doc_b)
              for r in dedup.minhash_lsh_pairs(
                  docs, threshold=0.5, max_bucket=5).collect()}
    assert (6, 7) in capped
    assert not any(a < 6 and b < 6 for a, b in capped)  # hot bucket gone
    # without the cap the identical-doc pairs are all present
    full = {(r.doc_a, r.doc_b)
            for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert {(a, b) for a in range(6) for b in range(a + 1, 6)} <= full


def test_connected_components_random_graph(spark):
    # seeded Erdos-Renyi-ish graph: 60 vertices, ~90 random edges
    rng = np.random.default_rng(42)
    edges = {tuple(sorted(e)) for e in rng.integers(0, 60, (90, 2))
             if e[0] != e[1]}
    pairs = spark.createDataFrame(
        [Row(doc_a=int(a), doc_b=int(b)) for a, b in sorted(edges)])
    exp = _py_components(60, sorted(edges))
    got = {r.u: r.lbl for r in dedup.connected_components(pairs).collect()}
    assert got == exp
    got_dist = {r.u: r.lbl for r in dedup.connected_components(
        pairs, driver_max_edges=0).collect()}
    assert got_dist == exp


def test_cluster_representatives_keeps_best_quality(spark):
    # doc0 ~ doc1 near-dups (one token changed); doc0 swaps "dog" for a
    # repeated stopword -> lower uniq_ratio & higher stop_ratio -> lower
    # quality, so the keeper must be doc1 despite the higher doc_id
    texts = [BASE.replace("dog", "and"),
             BASE,
             "one two three four five six seven eight nine ten"]
    docs = _mk_docs(spark, texts)
    out = {r.doc_id: r
           for r in dedup.cluster_representatives(docs, 0.5).collect()}
    assert len(out) == 3
    assert out[0].cluster_id == 0 and out[1].cluster_id == 0
    assert out[0].quality_score < out[1].quality_score
    assert out[1].keep and not out[0].keep
    assert out[2].keep  # singleton keeps itself


def test_contamination_counts_shared_shingles(spark):
    # benchmark = doc_id < 5; doc 7 copies doc 1's text -> shares all
    # shingles; doc 8 shares none
    texts = ["bench doc zero has some words in it today",
             BASE, "b2 b2 b2", "b3 b3 b3", "b4 b4 b4",
             "five distinct words entirely fresh",
             "six other tokens nothing shared",
             BASE,
             "totally disjoint vocabulary everywhere"]
    docs = _mk_docs(spark, texts)
    out = {r.doc_id: r.n_shared_shingles
           for r in dedup.contamination(docs).collect()}
    n_shingles = len(BASE.split()) - dedup.SHINGLE_N + 1
    assert out[7] == n_shingles
    assert 8 not in out and 5 not in out and 6 not in out


def test_containment_catches_subset_jaccard_misses(spark):
    # doc1 = 30 unique tokens; doc0 = its first 6 tokens verbatim.
    # Jaccard = 4/28 (tiny) but containment(doc0 in doc1) = 1.0
    long_toks = [f"w{i}" for i in range(30)]
    docs = _mk_docs(spark, [" ".join(long_toks[:6]), " ".join(long_toks)])
    out = {(r.doc_a, r.doc_b): r
           for r in dedup.shingle_containment_pairs(docs, 0.9).collect()}
    assert (0, 1) in out
    assert out[(0, 1)].cont_a_in_b == 1.0
    assert out[(0, 1)].cont_b_in_a < 0.2
    jac = {(r.doc_a, r.doc_b)
           for r in dedup.shingle_jaccard_pairs(docs, 0.5).collect()}
    assert (0, 1) not in jac


# ------------------------------------------ D11: incremental index ---

def test_incremental_minhash_semantics(spark):
    """Batch membership is doc_id % 5 == 4. Construct: corpus doc 0 with
    an exact copy at batch id 4 (new_old, est 1.0); batch ids 9 and 14
    exact copies of each other (new_new, est 1.0); corpus ids 1 and 2
    exact copies (index-index: must NOT emit); unrelated texts
    elsewhere."""
    from pyspark.sql import Row

    other = ("completely unrelated text about ships and harbours and "
             "tides rolling in before dawn with gulls overhead")
    third = ("a third topic entirely concerning compilers parsing "
             "grammars and abstract syntax trees in the evening")
    texts = {
        0: BASE,          # corpus
        4: BASE,          # batch — dup of corpus 0 -> new_old
        9: other,         # batch
        14: other,        # batch — dup of 9 -> new_new
        1: third,         # corpus
        2: third,         # corpus — dup of 1: index-index, silent
        3: "nothing like anything else whatsoever in this tiny corpus",
    }
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in texts.items()])
    out = {(r.doc_a, r.doc_b): r
           for r in dedup.minhash_incremental_pairs(docs).collect()}
    assert (0, 4) in out and out[(0, 4)].pair_type == "new_old"
    assert out[(0, 4)].est_jaccard == 1.0
    assert (9, 14) in out and out[(9, 14)].pair_type == "new_new"
    assert out[(9, 14)].est_jaccard == 1.0
    assert (1, 2) not in out          # the index never self-pairs
    assert all(a != 3 and b != 3 for a, b in out)


def test_incremental_index_probe_matches_full_lsh_on_batch_pairs(spark):
    """Every batch-involving pair the full D3 LSH finds at estimated
    Jaccard 1.0 is also found incrementally (the index probe loses no
    exact-duplicate recall)."""
    from pyspark.sql import Row

    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(40)]
    texts = []
    for i in range(20):
        body = " ".join(rng.choice(words, size=25))
        texts.append(body)
    # plant cross-split exact dups
    texts[4] = texts[0]     # batch id 4 == corpus id 0
    texts[9] = texts[3]     # batch id 9 == corpus id 3
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    inc = {(r.doc_a, r.doc_b)
           for r in dedup.minhash_incremental_pairs(docs).collect()}
    assert {(0, 4), (3, 9)} <= inc
