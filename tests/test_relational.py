"""Constructed-case semantics for the general relational shapes (H1
big-big join rollup, H2 anti-join nation rollup)."""

from __future__ import annotations

from pyspark.sql import Row

from birli_spark.operators import relational


def test_order_revenue_semantics(spark):
    orders = spark.createDataFrame([
        Row(o_orderkey=1, o_custkey=1, o_orderstatus="O",
            o_totalprice=0.0, o_orderpriority="1-URGENT"),
        Row(o_orderkey=2, o_custkey=1, o_orderstatus="F",
            o_totalprice=0.0, o_orderpriority="1-URGENT"),
        Row(o_orderkey=3, o_custkey=2, o_orderstatus="O",
            o_totalprice=0.0, o_orderpriority="2-HIGH"),
    ])
    li = spark.createDataFrame([
        Row(l_orderkey=1, l_quantity=2.0, l_extendedprice=100.0,
            l_discount=0.10),
        Row(l_orderkey=1, l_quantity=1.0, l_extendedprice=50.0,
            l_discount=0.00),
        Row(l_orderkey=2, l_quantity=9.0, l_extendedprice=999.0,
            l_discount=0.50),                     # status F -> excluded
        Row(l_orderkey=3, l_quantity=3.0, l_extendedprice=10.0,
            l_discount=0.25),
    ])
    out = {r.o_orderpriority: r
           for r in relational.order_revenue(orders, li).collect()}
    u = out["1-URGENT"]
    assert u.n_items == 2 and u.n_orders == 1
    assert u.revenue == 140.0 and u.total_qty == 3      # 90 + 50
    h = out["2-HIGH"]
    assert h.n_items == 1 and h.revenue == 7.5


def test_idle_customers_semantics(spark):
    customer = spark.createDataFrame([
        Row(c_custkey=1, c_name="a", c_nationkey=0, c_acctbal=10.50,
            c_mktsegment="m"),
        Row(c_custkey=2, c_name="b", c_nationkey=0, c_acctbal=1.25,
            c_mktsegment="m"),
        Row(c_custkey=3, c_name="c", c_nationkey=1, c_acctbal=-5.00,
            c_mktsegment="m"),
    ])
    orders = spark.createDataFrame([
        Row(o_orderkey=1, o_custkey=1, o_orderstatus="P",
            o_totalprice=0.0, o_orderpriority="x"),   # cust 1 has pending
        Row(o_orderkey=2, o_custkey=2, o_orderstatus="F",
            o_totalprice=0.0, o_orderpriority="x"),   # cust 2: none pending
    ])
    nation = spark.createDataFrame([
        Row(n_nationkey=0, n_name="A"), Row(n_nationkey=1, n_name="B")])
    out = {r.n_name: r for r in relational.idle_customers_by_nation(
        customer, orders, nation).collect()}
    assert out["A"].n_idle == 1 and out["A"].idle_balance == 1.25
    assert out["B"].n_idle == 1 and out["B"].idle_balance == -5.00


def test_pricing_summary_python_recompute(spark, sf_dir):
    from birli_spark.operators import relational
    import pandas as pd
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = (relational.pricing_summary(li)
           .orderBy("l_returnflag", "l_linestatus").toPandas())
    pdf = li.toPandas()
    pdf = pdf[pdf.l_shipdate <= pd.Timestamp("1998-09-01")]
    for _, r in got.iterrows():
        sub = pdf[(pdf.l_returnflag == r.l_returnflag)
                  & (pdf.l_linestatus == r.l_linestatus)]
        assert r.count_order == len(sub)
        assert r.sum_qty == int(sub.l_quantity.sum())
        assert abs(r.sum_base_price - sub.l_extendedprice.sum()) < 1e-4
        disc = (sub.l_extendedprice * (1 - sub.l_discount)).sum()
        assert abs(r.sum_disc_price - disc) < 1e-3
        assert abs(r.avg_qty - sub.l_quantity.mean()) < 1e-9


def test_shipping_priority_topk(spark, sf_dir):
    from birli_spark.operators import relational
    got = relational.shipping_priority(
        spark.read.parquet(f"{sf_dir}/customer.parquet"),
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"), k=5).toPandas()
    assert len(got) <= 5
    # descending revenue, deterministic tie-break
    revs = list(got.revenue)
    assert revs == sorted(revs, reverse=True)
    assert got.o_orderkey.is_unique


def test_small_quantity_revenue_python_recompute(spark, sf_dir):
    from birli_spark.operators import relational
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").toPandas()
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    brand_keys = set(r.p_partkey for r in pt.filter(
        "p_brand = 'Brand#4'").collect())
    sub = li[li.l_partkey.isin(brand_keys)]
    stats = sub.groupby("l_partkey").l_quantity.agg(["sum", "count"])
    n_small, price, parts = 0, 0.0, set()
    for r in sub.itertuples():
        s, c = stats.loc[r.l_partkey]
        if 5 * r.l_quantity * c < s:
            n_small += 1
            price += r.l_extendedprice
            parts.add(r.l_partkey)
    got = relational.small_quantity_revenue(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"), pt).collect()[0]
    assert got.n_small_lots == n_small
    assert abs(got.total_price - price) < 1e-4
    assert got.n_parts == len(parts)


def test_fuzzy_name_pairs_match_python(spark, sf_dir):
    from birli_spark.operators import relational
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    got = {(r.name_a, r.name_b): r.dist
           for r in relational.fuzzy_name_pairs(pt).collect()}

    def lev(a, b):
        import functools
        @functools.lru_cache(maxsize=None)
        def d(i, j):
            if i == 0:
                return j
            if j == 0:
                return i
            return min(d(i - 1, j) + 1, d(i, j - 1) + 1,
                       d(i - 1, j - 1) + (a[i - 1] != b[j - 1]))
        return d(len(a), len(b))

    names = [r.p_name for r in pt.select("p_name").distinct().collect()]
    exp = {}
    for i, a in enumerate(sorted(names)):
        for b in sorted(names)[i + 1:]:
            if a.split(" ")[-1] != b.split(" ")[-1]:
                continue
            dd = lev(a, b)
            if dd <= relational.FUZZY_MAX_DIST:
                exp[(a, b)] = dd
    assert got == exp
