"""Round-2 additions: HLL sketch (sk3), grouping sets (e14), star-join
top-k (h3), z-order layout (l1), quality filter (t14), unigram-LM
cross-entropy with fixed-point log2 (t15)."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest
from pyspark.sql import Row

from birli_spark.functions import textsql as X
from birli_spark.operators import layout, relational, sketches, text
from birli_spark.operators.events import type_dow_grouping_sets
from birli_spark.sources import corpus


def _mk_docs(spark, rows):
    return spark.createDataFrame([
        Row(doc_id=i, text=t, lang="en", source=s, n_chars=len(t))
        for i, (s, t) in enumerate(rows)])


# ----------------------------------------------------------------- log2fix ---

def _py_log2fix_ref(cnt, nbits):
    """Independent reimplementation (matches the documented algorithm)."""
    b = cnt.bit_length() - 1
    m = cnt / (1 << b)
    acc = 0
    for _ in range(nbits):
        m *= m
        if m >= 2.0:
            m *= 0.5
            acc = acc * 2 + 1
        else:
            acc *= 2
    return b * (1 << nbits) + acc


@pytest.mark.parametrize("cnt", [1, 2, 3, 7, 100, 12345, 1 << 40,
                                 (1 << 52) + 12345])
def test_log2fix_py_close_to_log2_and_matches_ref(cnt):
    ticks = X.log2fix_py(cnt)
    assert ticks == _py_log2fix_ref(cnt, 24)
    approx = ticks / (1 << 24)
    assert abs(approx - math.log2(cnt)) < 2 ** -20


def test_log2fix_three_engines_identical(spark):
    """Python, Spark (withColumn steps) and DuckDB (nested subqueries)
    produce the identical BIGINT ticks for awkward counts."""
    vals = [1, 2, 3, 5, 6, 7, 9, 99, 1000, 999983, (1 << 31) - 1]
    sdf = spark.createDataFrame([(v,) for v in vals], "cnt long")
    got_spark = {r.cnt: r.ticks for r in
                 text._log2fix_ticks(sdf, "cnt", "ticks").collect()}
    inner = "SELECT unnest(%s) AS cnt" % vals
    got_duck = dict(duckdb.sql(
        X.log2fix_duck_sql(inner, "cnt", "ticks", ["cnt"])).fetchall())
    for v in vals:
        expect = X.log2fix_py(v)
        assert got_spark[v] == expect, v
        assert got_duck[v] == expect, v


def test_unigram_logprob_semantics(spark):
    # corpus: 'a' x3, 'b' x1 → total 4; doc0 = "a a a", doc1 = "b"
    docs = _mk_docs(spark, [("s", "a a a"), ("s", "b")])
    out = {r.doc_id: r for r in text.unigram_logprob(docs).collect()}
    # bits(doc0) ≈ log2(4) - log2(3) = 0.415..; bits(doc1) = log2(4) - 0 = 2
    assert out[1].n_tokens == 1
    assert abs(out[1].bits_per_token - 2.0) < 1e-5
    assert abs(out[0].bits_per_token - (2.0 - math.log2(3))) < 1e-5


# --------------------------------------------------------------------- HLL ---

def _py_hll(tokens):
    regs = {}
    for t in sorted({*tokens}):
        h = hashlib.md5(t.encode()).hexdigest()
        bucket = int(h[:2], 16)
        rest = h[2:]
        bits = bin(int(rest, 16))[2:].zfill(120)
        rho = min(len(bits) - len(bits.lstrip("0")) + 1, 54)
        regs[bucket] = max(regs.get(bucket, 0), rho)
    s = sum(1 << (54 - r) for r in regs.values())
    s += (256 - len(regs)) * (1 << 54)
    alpha = 0.7213 / (1 + 1.079 / 256)
    return len(regs), alpha * 65536.0 * (float(1 << 54) / float(s))


def test_hll_matches_independent_python(spark):
    toks = [f"tok{i}" for i in range(2000)]
    docs = _mk_docs(spark, [("a", " ".join(toks)),
                            ("a", " ".join(toks[:500]))])
    out = sketches.hll_distinct_tokens(docs).collect()[0]
    v, est = _py_hll(toks)
    assert out.exact_distinct == 2000
    assert out.v_nonempty == v
    assert out.hll_estimate == est
    # HLL relative error ~ 1.04/sqrt(256) ≈ 6.5%; allow 3 sigma
    assert abs(est - 2000) / 2000 < 0.2


def test_hll_oracle_identity(spark, sf_dir):
    got = (sketches.hll_distinct_tokens(
        corpus.load_documents(spark, sf_dir)).orderBy("source").toPandas())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    want = con.execute(
        sketches.hll_distinct_tokens_oracle_sql()
        + " ORDER BY source").df()
    assert list(got["source"]) == list(want["source"])
    assert list(got["v_nonempty"]) == list(want["v_nonempty"])
    assert list(got["hll_estimate"]) == list(want["hll_estimate"])


# ----------------------------------------------------------- grouping sets ---

def test_grouping_sets_levels(spark):
    ev = spark.createDataFrame(
        [Row(event_id=i, ts=i * 10 ** 9, user_id=1, event_type="c",
             value=1.0, props="{}") for i in range(4)])
    rows = type_dow_grouping_sets(ev).collect()
    gids = {(r.event_type, r.dow): r.gid for r in rows}
    # leaves + the two one-dim margins; NO grand total row
    assert ("c", 0) in gids and gids[("c", 0)] == 0
    assert ("c", -1) in gids and gids[("c", -1)] == 1   # dow rolled up
    assert ("ALL", 0) in gids and gids[("ALL", 0)] == 2  # type rolled up
    assert ("ALL", -1) not in gids
    leaf = [r for r in rows if r.gid == 0][0]
    assert leaf.n_events == 4 and leaf.sum_value == 4.0


# ------------------------------------------------------------------ h3 top ---

def test_region_top_suppliers_ranking(spark):
    li = spark.createDataFrame(
        [Row(l_orderkey=i, l_suppkey=s, l_quantity=1.0,
             l_extendedprice=p, l_discount=0.0)
         for i, (s, p) in enumerate([(1, 100.0), (1, 50.0), (2, 120.0),
                                     (3, 10.0)])])
    supp = spark.createDataFrame(
        [Row(s_suppkey=k, s_name=f"S{k}", s_nationkey=k % 2,
             s_acctbal=0.0) for k in (1, 2, 3)])
    nat = spark.createDataFrame(
        [Row(n_nationkey=0, n_name="N0", n_regionkey=0),
         Row(n_nationkey=1, n_name="N1", n_regionkey=0)])
    reg = spark.createDataFrame([Row(r_regionkey=0, r_name="R")])
    out = relational.region_top_suppliers(li, supp, nat, reg, k=2).collect()
    assert [(r.s_suppkey, r.rank, r.revenue) for r in
            sorted(out, key=lambda r: r.rank)] == [
        (1, 1, 150.0), (2, 2, 120.0)]


# ----------------------------------------------------------------- z-order ---

def test_zorder_file_envelopes_are_square(spark):
    # full 16x16 (t, bl) grid → each of the 16 z-files covers a 4x4 tile
    rows = [Row(t=t, bl=b) for t in range(16) for b in range(16)]
    df = spark.createDataFrame(rows)
    out = layout.zorder_layout_stats(df).collect()
    assert len(out) == 16
    for r in out:
        assert r.n_rows == 16
        assert r.t_span == 4 and r.bl_span == 4  # sqrt-tight both dims


def test_zorder_value_is_morton(spark):
    df = spark.createDataFrame([Row(t=5, bl=3)])  # 0101, 0011
    z = df.selectExpr(
        layout._z_expr("spark", "t", "bl") + " AS z").collect()[0].z
    # interleave: t bits → odd positions, bl bits → even
    expect = sum(((5 >> i) & 1) << (2 * i + 1) for i in range(4)) + \
        sum(((3 >> i) & 1) << (2 * i) for i in range(4))
    assert z == expect == 0b100111


# ---------------------------------------------------------- quality filter ---

def test_quality_filter_rules(spark):
    good = " ".join(f"w{i}" for i in range(50)) + " the of and it is"
    docs = _mk_docs(spark, [("s", good), ("s", "tiny doc")])
    out = {r.doc_id: r for r in text.quality_filter(docs).collect()}
    assert out[0].keep
    assert not out[1].keep          # fails ok_min_tokens
    assert not out[1].ok_min_tokens
    assert out[1].ok_stopwords is False or out[1].ok_stopwords is True
