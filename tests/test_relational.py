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


def test_late_order_priority_semantics(spark):
    import datetime as dt
    d = dt.datetime(1996, 8, 1)
    orders = spark.createDataFrame([
        # in-quarter, one late line -> counted
        Row(o_orderkey=1, o_custkey=1, o_orderstatus="O", o_totalprice=0.0,
            o_orderdate=d, o_orderpriority="1-URGENT"),
        # in-quarter, only prompt lines -> not counted
        Row(o_orderkey=2, o_custkey=1, o_orderstatus="O", o_totalprice=0.0,
            o_orderdate=d, o_orderpriority="1-URGENT"),
        # out-of-quarter, late -> not counted
        Row(o_orderkey=3, o_custkey=1, o_orderstatus="O", o_totalprice=0.0,
            o_orderdate=dt.datetime(1995, 1, 1), o_orderpriority="2-HIGH"),
    ])
    li = spark.createDataFrame([
        Row(l_orderkey=1, l_shipdate=d + dt.timedelta(days=45)),
        Row(l_orderkey=1, l_shipdate=d + dt.timedelta(days=60)),  # 1 order
        Row(l_orderkey=2, l_shipdate=d + dt.timedelta(days=5)),
        Row(l_orderkey=3, l_shipdate=dt.datetime(1995, 6, 1)),
    ])
    out = {r.o_orderpriority: r.order_count
           for r in relational.late_order_priority(orders, li).collect()}
    assert out == {"1-URGENT": 1}   # semi join: no double count for order 1


def test_large_orders_threshold(spark):
    import datetime as dt
    customer = spark.createDataFrame(
        [Row(c_custkey=1, c_name="a", c_nationkey=0, c_acctbal=0.0,
             c_mktsegment="m")])
    orders = spark.createDataFrame([
        Row(o_orderkey=1, o_custkey=1, o_orderstatus="O",
            o_totalprice=123.456, o_orderdate=dt.datetime(1996, 1, 1),
            o_orderpriority="x"),
        Row(o_orderkey=2, o_custkey=1, o_orderstatus="O",
            o_totalprice=1.0, o_orderdate=dt.datetime(1996, 1, 2),
            o_orderpriority="x"),
    ])
    li = spark.createDataFrame([
        Row(l_orderkey=1, l_quantity=3.0),
        Row(l_orderkey=1, l_quantity=4.0),
        Row(l_orderkey=2, l_quantity=5.0),
    ])
    out = relational.large_orders(customer, orders, li, min_qty=6).collect()
    assert len(out) == 1
    r = out[0]
    assert r.o_orderkey == 1 and r.sum_qty == 7
    assert r.o_totalprice == 123.46   # exact-cent rounding


def test_promo_share_basis_points(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    r = relational.promo_revenue_share(li, part).collect()[0]
    assert 0 <= r.promo_share_bp <= 10000
    assert r.promo_revenue <= r.total_revenue
    # integer-bp definition: floor(10000 * promo / total)
    assert r.promo_share_bp == int(
        10000 * round(r.promo_revenue * 10000)
        // round(r.total_revenue * 10000))


def test_customer_order_distribution_counts_zeroes(spark):
    customer = spark.createDataFrame([
        Row(c_custkey=i, c_name=str(i), c_nationkey=0, c_acctbal=0.0,
            c_mktsegment="m") for i in (1, 2, 3)])
    orders = spark.createDataFrame([
        Row(o_orderkey=1, o_custkey=1, o_orderstatus="O", o_totalprice=0.0,
            o_orderpriority="1-URGENT"),
        Row(o_orderkey=2, o_custkey=1, o_orderstatus="O", o_totalprice=0.0,
            o_orderpriority="1-URGENT"),
        # excluded priority: contributes nothing
        Row(o_orderkey=3, o_custkey=2, o_orderstatus="O", o_totalprice=0.0,
            o_orderpriority="4-NOT SPECIFIED"),
    ])
    out = {r.c_count: r.custdist
           for r in relational.customer_order_distribution(
               customer, orders).collect()}
    assert out == {2: 1, 0: 2}   # cust 2 and 3 both land in the 0 bucket


def test_returned_losses_topk_deterministic(spark, sf_dir):
    args = (spark.read.parquet(f"{sf_dir}/customer.parquet"),
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
            spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
            spark.read.parquet(f"{sf_dir}/nation.parquet"))
    out = relational.returned_item_losses(*args, k=5).collect()
    assert len(out) <= 5
    revs = [r.revenue for r in out]
    assert revs == sorted(revs, reverse=True)
    # rerun is bit-identical (deterministic tie-break)
    again = relational.returned_item_losses(*args, k=5).collect()
    assert out == again
