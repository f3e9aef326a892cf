"""Constructed-case semantics for the round-2 TPC-H shape additions:
H15 (Q7 volume shipping), H16 (Q8 market share), H18 (Q11 important
parts), H21 (Q19 disjunctive predicate), H23 (Q21 exactly-one-late
blame), H24 (Q22 idle rich customers)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from birli_spark.operators import relational


def _ts(y, m, d):
    return datetime.datetime(y, m, d)


def test_volume_shipping_directions(spark):
    nation = spark.createDataFrame([
        Row(n_nationkey=0, n_name="A", n_regionkey=0),
        Row(n_nationkey=1, n_name="B", n_regionkey=0),
        Row(n_nationkey=2, n_name="C", n_regionkey=0)])
    supplier = spark.createDataFrame([
        Row(s_suppkey=10, s_name="s10", s_nationkey=0, s_acctbal=0.0),
        Row(s_suppkey=11, s_name="s11", s_nationkey=1, s_acctbal=0.0),
        Row(s_suppkey=12, s_name="s12", s_nationkey=2, s_acctbal=0.0)])
    customer = spark.createDataFrame([
        Row(c_custkey=1, c_name="c1", c_nationkey=0, c_acctbal=0.0,
            c_mktsegment="m"),
        Row(c_custkey=2, c_name="c2", c_nationkey=1, c_acctbal=0.0,
            c_mktsegment="m")])
    orders = spark.createDataFrame([
        Row(o_orderkey=1, o_custkey=2, o_orderstatus="O", o_totalprice=0.0,
            o_orderdate=_ts(1996, 1, 1), o_orderpriority="x"),
        Row(o_orderkey=2, o_custkey=1, o_orderstatus="O", o_totalprice=0.0,
            o_orderdate=_ts(1996, 1, 1), o_orderpriority="x")])
    lineitem = spark.createDataFrame([
        # supp A -> cust B: counted as (A, B)
        Row(l_orderkey=1, l_suppkey=10, l_extendedprice=100.0,
            l_discount=0.0, l_shipdate=_ts(1996, 2, 1)),
        # supp B -> cust B: same nation, dropped
        Row(l_orderkey=1, l_suppkey=11, l_extendedprice=100.0,
            l_discount=0.0, l_shipdate=_ts(1996, 2, 1)),
        # supp B -> cust A: counted as (B, A)
        Row(l_orderkey=2, l_suppkey=11, l_extendedprice=50.0,
            l_discount=0.0, l_shipdate=_ts(1997, 2, 1)),
        # supp C not in the pair: dropped
        Row(l_orderkey=2, l_suppkey=12, l_extendedprice=50.0,
            l_discount=0.0, l_shipdate=_ts(1997, 2, 1))])
    out = relational.volume_shipping(
        customer, orders, lineitem, supplier, nation,
        nation_a="A", nation_b="B")
    rows = {(r.supp_nation, r.cust_nation, r.l_year):
            (r.n_items, r.volume) for r in out.collect()}
    assert rows == {("A", "B", 1996): (1, 100.0),
                    ("B", "A", 1997): (1, 50.0)}


def test_important_parts_threshold_exact(spark):
    # two parts: 999 vs 1 of 1000 total; ppm=1000 keeps only the big one
    # (1 * 1000 > 1000 is false — strict inequality, integer-exact)
    lineitem = spark.createDataFrame([
        Row(l_orderkey=1, l_partkey=1, l_extendedprice=999.0,
            l_discount=0.0),
        Row(l_orderkey=1, l_partkey=2, l_extendedprice=1.0,
            l_discount=0.0)])
    part = spark.createDataFrame([
        Row(p_partkey=1, p_name="big"), Row(p_partkey=2, p_name="small")])
    out = relational.important_parts(lineitem, part, ppm=1000)
    rows = {r.p_name: r.value for r in out.collect()}
    assert rows == {"big": 999.0}


def test_disjunctive_revenue_branches(spark):
    part = spark.createDataFrame([
        Row(p_partkey=1, p_name="a", p_brand="Brand#1", p_type="t",
            p_size=3, p_retailprice=1.0),
        Row(p_partkey=2, p_name="b", p_brand="Brand#2", p_type="t",
            p_size=8, p_retailprice=1.0),
        Row(p_partkey=3, p_name="c", p_brand="Brand#3", p_type="t",
            p_size=20, p_retailprice=1.0)])   # size 20 > 15: never matches
    lineitem = spark.createDataFrame([
        Row(l_orderkey=1, l_partkey=1, l_quantity=5.0,
            l_extendedprice=10.0, l_discount=0.0),    # branch 1
        Row(l_orderkey=1, l_partkey=1, l_quantity=15.0,
            l_extendedprice=10.0, l_discount=0.0),    # qty out for Brand#1
        Row(l_orderkey=1, l_partkey=2, l_quantity=15.0,
            l_extendedprice=20.0, l_discount=0.5),    # branch 2
        Row(l_orderkey=1, l_partkey=3, l_quantity=25.0,
            l_extendedprice=99.0, l_discount=0.0)])   # size kills branch 3
    out = relational.disjunctive_revenue(lineitem, part).collect()[0]
    assert out.n_items == 2
    assert out.revenue == 10.0 + 10.0


def test_blame_suppliers_exactly_one_late(spark):
    orders = spark.createDataFrame([
        Row(o_orderkey=1, o_orderdate=_ts(1996, 1, 1)),
        Row(o_orderkey=2, o_orderdate=_ts(1996, 1, 1)),
        Row(o_orderkey=3, o_orderdate=_ts(1996, 1, 1))])
    supplier = spark.createDataFrame([
        Row(s_suppkey=10, s_name="s10", s_nationkey=0, s_acctbal=0.0),
        Row(s_suppkey=11, s_name="s11", s_nationkey=0, s_acctbal=0.0)])
    on_time = _ts(1996, 1, 15)
    late = _ts(1996, 6, 1)
    lineitem = spark.createDataFrame([
        # order 1: two suppliers, only s10 late -> blame s10
        Row(l_orderkey=1, l_suppkey=10, l_shipdate=late),
        Row(l_orderkey=1, l_suppkey=11, l_shipdate=on_time),
        # order 2: two suppliers BOTH late -> nobody blamed
        Row(l_orderkey=2, l_suppkey=10, l_shipdate=late),
        Row(l_orderkey=2, l_suppkey=11, l_shipdate=late),
        # order 3: single-supplier order -> excluded (n_supp < 2)
        Row(l_orderkey=3, l_suppkey=10, l_shipdate=late)])
    out = relational.blame_suppliers(orders, lineitem, supplier)
    rows = {r.s_name: r.numwait for r in out.collect()}
    assert rows == {"s10": 1}


def test_idle_rich_customers_avg_and_antijoin(spark):
    # positive balances: 100, 300 -> avg 200; c2 (300) is above it;
    # c3's negative balance is excluded from the average entirely
    customer = spark.createDataFrame([
        Row(c_custkey=1, c_name="c1", c_nationkey=0, c_acctbal=100.0,
            c_mktsegment="m"),
        Row(c_custkey=2, c_name="c2", c_nationkey=0, c_acctbal=300.0,
            c_mktsegment="m"),
        Row(c_custkey=3, c_name="c3", c_nationkey=0, c_acctbal=-50.0,
            c_mktsegment="m"),
        Row(c_custkey=4, c_name="c4", c_nationkey=1, c_acctbal=300.0,
            c_mktsegment="m")])
    nation = spark.createDataFrame([
        Row(n_nationkey=0, n_name="N0", n_regionkey=0),
        Row(n_nationkey=1, n_name="N1", n_regionkey=0)])
    orders = spark.createDataFrame([
        # c4 ordered recently -> not idle; c2 only ordered before cutoff
        Row(o_orderkey=1, o_custkey=4, o_orderstatus="O", o_totalprice=0.0,
            o_orderdate=_ts(2000, 1, 1), o_orderpriority="x"),
        Row(o_orderkey=2, o_custkey=2, o_orderstatus="O", o_totalprice=0.0,
            o_orderdate=_ts(1997, 1, 1), o_orderpriority="x")])
    out = relational.idle_rich_customers(
        customer, orders, nation, cutoff="1999-01-01 00:00:00")
    rows = {r.n_name: (r.numcust, r.totacctbal) for r in out.collect()}
    assert rows == {"N0": (1, 300.0)}


def test_market_share_numerator_subset(spark):
    region = spark.createDataFrame([Row(r_regionkey=0, r_name="R")])
    nation = spark.createDataFrame([
        Row(n_nationkey=0, n_name="TGT", n_regionkey=0),
        Row(n_nationkey=1, n_name="OTH", n_regionkey=0)])
    supplier = spark.createDataFrame([
        Row(s_suppkey=10, s_name="s10", s_nationkey=0, s_acctbal=0.0),
        Row(s_suppkey=11, s_name="s11", s_nationkey=1, s_acctbal=0.0)])
    customer = spark.createDataFrame([
        Row(c_custkey=1, c_name="c1", c_nationkey=1, c_acctbal=0.0,
            c_mktsegment="m")])
    part = spark.createDataFrame([
        Row(p_partkey=1, p_name="p", p_brand="B", p_type="T",
            p_size=1, p_retailprice=1.0)])
    orders = spark.createDataFrame([
        Row(o_orderkey=1, o_custkey=1, o_orderstatus="O", o_totalprice=0.0,
            o_orderdate=_ts(1996, 1, 1), o_orderpriority="x")])
    lineitem = spark.createDataFrame([
        Row(l_orderkey=1, l_partkey=1, l_suppkey=10,
            l_extendedprice=30.0, l_discount=0.0),
        Row(l_orderkey=1, l_partkey=1, l_suppkey=11,
            l_extendedprice=70.0, l_discount=0.0)])
    out = relational.market_share(
        customer, orders, lineitem, supplier, nation, region, part,
        target_nation="TGT", region_name="R", part_type="T").collect()
    assert len(out) == 1
    assert out[0].o_year == 1996
    assert abs(out[0].mkt_share - 0.3) < 1e-12


def test_substring_dedup_span_merge(spark):
    from pyspark.sql import Row
    from birli_spark.operators import corpus_clean
    # doc 1 and doc 2 share the exact 6-token run "a b c d e f"; with
    # window=3 the duplicated windows at pos 0..3 merge into ONE span of
    # 6 tokens. doc 3 shares nothing.
    shared = "a b c d e f"
    docs = spark.createDataFrame([
        Row(doc_id=1, text=shared + " x1 y1 z1", lang="en", source="s",
            n_chars=0),
        Row(doc_id=2, text="p2 q2 " + shared, lang="en", source="s",
            n_chars=0),
        Row(doc_id=3, text="u3 v3 w3 r3 s3 t3 m3 n3 o3", lang="en",
            source="s", n_chars=0)])
    out = {r.doc_id: r for r in
           corpus_clean.substring_dedup(docs, window=3).collect()}
    assert out[1].n_spans == 1
    assert out[1].dup_tokens == 6
    assert out[1].max_span == 6
    assert out[1].n_dup_windows == 4          # pos 0,1,2,3
    assert out[2].n_spans == 1 and out[2].dup_tokens == 6
    assert out[3].n_spans == 0 and out[3].dup_tokens == 0
    assert out[3].dup_frac == 0.0


def test_substring_dedup_disjoint_spans(spark):
    from pyspark.sql import Row
    from birli_spark.operators import corpus_clean
    # two separated duplicated runs in one doc -> two islands
    docs = spark.createDataFrame([
        Row(doc_id=1, text="a b c G1 G2 G3 G4 a b c", lang="en",
            source="s", n_chars=0),
        Row(doc_id=2, text="a b c Z9 Z8", lang="en", source="s",
            n_chars=0)])
    out = {r.doc_id: r for r in
           corpus_clean.substring_dedup(docs, window=3).collect()}
    # doc 1: "a b c" at pos 0 and pos 7 duplicated (appears 3x corpus-
    # wide); gap > window so two spans of 3 tokens each
    assert out[1].n_spans == 2
    assert out[1].dup_tokens == 6
    assert out[1].max_span == 3


def test_referential_integrity_counts(spark):
    from birli_spark.operators import profile
    customer = spark.createDataFrame(
        [Row(c_custkey=1), Row(c_custkey=2)])
    orders = spark.createDataFrame([
        Row(o_orderkey=10, o_custkey=1),     # ok, has lineitem
        Row(o_orderkey=11, o_custkey=99),    # orphan custkey, no lineitem
    ])
    lineitem = spark.createDataFrame([
        Row(l_orderkey=10), Row(l_orderkey=77)])  # 77 orphan
    out = {r.constraint: r for r in profile.referential_integrity(
        customer, orders, lineitem).collect()}
    li = out["lineitem.orderkey -> orders"]
    assert (li.n_total, li.n_violations, li.violation_ppm) == (2, 1, 500000)
    oc = out["orders.custkey -> customer"]
    assert (oc.n_total, oc.n_violations) == (2, 1)
    ol = out["orders without lineitems"]
    assert (ol.n_total, ol.n_violations) == (2, 1)


def test_bigram_lm_uniform_doc(spark):
    import math

    from birli_spark.operators import text as textops
    # one doc "a b a b": bigrams {a b:2, b a:1}; V=2; c1(a)=2, c1(b)=1
    # P(a b) = (2+1)/(2+2) = 3/4; P(b a) = (1+1)/(1+2) = 2/3
    docs = spark.createDataFrame([
        Row(doc_id=1, text="a b a b", lang="en", source="s", n_chars=0),
        Row(doc_id=2, text="x", lang="en", source="s", n_chars=0)])
    # doc 2 contributes token x to vocab -> V=3, shifting c1 denominators:
    # P(a b) = 3/5, P(b a) = 2/4
    out = {r.doc_id: r for r in textops.bigram_lm_bits(docs).collect()}
    assert out[2].n_bigrams == 0 and out[2].bits_per_bigram == 0.0
    got = out[1]
    assert got.n_bigrams == 3
    want = -(2 * math.log2(3 / 5) + math.log2(2 / 4)) / 3
    assert abs(got.bits_per_bigram - want) < 1e-5   # fixed-point vs libm


def test_min_cost_supplier_ties_and_min(spark):
    region = spark.createDataFrame([Row(r_regionkey=0, r_name="R")])
    nation = spark.createDataFrame([
        Row(n_nationkey=0, n_name="N0", n_regionkey=0),
        Row(n_nationkey=1, n_name="N1", n_regionkey=1)])  # out of region
    supplier = spark.createDataFrame([
        Row(s_suppkey=10, s_name="s10", s_nationkey=0, s_acctbal=0.0),
        Row(s_suppkey=11, s_name="s11", s_nationkey=0, s_acctbal=0.0),
        Row(s_suppkey=12, s_name="s12", s_nationkey=1, s_acctbal=0.0)])
    part = spark.createDataFrame([
        Row(p_partkey=1, p_name="p1", p_brand="B", p_type="T", p_size=5,
            p_retailprice=1.0)])
    lineitem = spark.createDataFrame([
        # s10 quotes 2.00 then 1.50 -> min 1.50
        Row(l_orderkey=1, l_partkey=1, l_suppkey=10, l_quantity=2.0,
            l_extendedprice=4.0),
        Row(l_orderkey=2, l_partkey=1, l_suppkey=10, l_quantity=2.0,
            l_extendedprice=3.0),
        # s11 quotes 1.50 -> ties with s10 at the minimum
        Row(l_orderkey=3, l_partkey=1, l_suppkey=11, l_quantity=4.0,
            l_extendedprice=6.0),
        # s12 cheapest of all but out of region -> never seen
        Row(l_orderkey=4, l_partkey=1, l_suppkey=12, l_quantity=10.0,
            l_extendedprice=1.0)])
    out = relational.min_cost_supplier(
        lineitem, supplier, nation, region, part,
        region_name="R", part_size=5).collect()
    got = {(r.s_name, r.unit_price) for r in out}
    assert got == {("s10", 1.5), ("s11", 1.5)}


def test_priority_lateness_two_way_counts(spark):
    orders = spark.createDataFrame([
        Row(o_orderkey=1, o_orderdate=_ts(1996, 1, 1),
            o_orderpriority="1-URGENT"),
        Row(o_orderkey=2, o_orderdate=_ts(1996, 1, 1),
            o_orderpriority="5-LOW")])
    lineitem = spark.createDataFrame([
        Row(l_orderkey=1, l_shipdate=_ts(1996, 6, 1)),   # late, high
        Row(l_orderkey=1, l_shipdate=_ts(1996, 1, 10)),  # ontime, high
        Row(l_orderkey=2, l_shipdate=_ts(1996, 7, 1)),   # late, low
        Row(l_orderkey=2, l_shipdate=_ts(1999, 1, 1))])  # outside window
    out = {r.lateness: (r.high_line_count, r.low_line_count)
           for r in relational.priority_lateness(orders, lineitem).collect()}
    assert out == {"LATE": (1, 1), "ONTIME": (1, 0)}
