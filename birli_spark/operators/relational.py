"""General relational shapes over the TPC-H-ish tables — the two join
classes the engine's other queries don't exercise: a **big-big
co-keyed fact join** (orders ⋈ lineitem) and a **broadcast-dim anti
join** (customers with no orders, rolled up by nation).

Scale notes:

- H1 joins two fact tables on the same key (`orderkey`). At 100 TB both
  sides shuffle on the key unless the tables are **bucketed/co-located**
  on it at write time (see tests/test_bucketing.py for the bucketed-write
  demonstration); AQE handles residual skew by splitting oversized
  partitions. The aggregate keys on the join key's table side, so the
  rollup to `o_orderpriority` only shuffles the tiny priority table.
- H2's anti join ships only the distinct custkey set of orders against
  the customer table; the nation rollup joins a ≤ 25-row broadcast dim.
- Money columns are fixed-decimal: sums run over exact integer
  (hundredths / ten-thousandths) so they are accumulation-order-proof —
  the round-1 lesson that float SUM + f32 demotion can still flap a
  hash at fact-table row counts. One exact division restores the
  decimal scale at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: revenue per row has 4 decimal places (price 2 x discount 2)
_REV_TICKS = ("CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 10000.0)"
              " AS BIGINT)")


def order_revenue(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """H1 — revenue & volume per order priority for open orders:
    big-big equi-join on orderkey, then partial-aggregated rollup."""
    return (orders.filter(F.col("o_orderstatus") == "O")
            .join(lineitem,
                  orders["o_orderkey"] == lineitem["l_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_items"),
                 F.countDistinct("o_orderkey").alias("n_orders"),
                 (F.sum(F.expr(_REV_TICKS)) / F.lit(10000.0))
                 .alias("revenue"),
                 F.sum(F.expr("CAST(l_quantity AS BIGINT)"))
                 .alias("total_qty")))


def order_revenue_oracle_sql() -> str:
    return f"""
SELECT o_orderpriority, COUNT(*) AS n_items,
  COUNT(DISTINCT o_orderkey) AS n_orders,
  SUM({_REV_TICKS}) / 10000.0 AS revenue,
  SUM(CAST(l_quantity AS BIGINT)) AS total_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority"""


def idle_customers_by_nation(customer: DataFrame, orders: DataFrame,
                             nation: DataFrame,
                             status: str = "P") -> DataFrame:
    """H2 — customers with no order in the given status (default: no
    pending order), per nation: anti join against the filtered order
    custkey set, broadcast nation dim, exact cent sums. The status
    filter pushes into the orders scan before the anti join builds."""
    idle = customer.join(
        orders.filter(F.col("o_orderstatus") == status),
        customer["c_custkey"] == orders["o_custkey"], "left_anti")
    return (idle.join(F.broadcast(nation),
                      idle["c_nationkey"] == nation["n_nationkey"])
            .groupBy("n_name")
            .agg(F.count("*").alias("n_idle"),
                 (F.sum(F.expr("CAST(ROUND(c_acctbal * 100.0) AS BIGINT)"))
                  / F.lit(100.0)).alias("idle_balance")))


def idle_customers_oracle_sql(status: str = "P") -> str:
    return f"""
SELECT n_name, COUNT(*) AS n_idle,
  SUM(CAST(ROUND(c_acctbal * 100.0) AS BIGINT)) / 100.0 AS idle_balance
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_custkey NOT IN
  (SELECT o_custkey FROM orders WHERE o_orderstatus = '{status}')
GROUP BY n_name"""


def region_top_suppliers(lineitem: DataFrame, supplier: DataFrame,
                         nation: DataFrame, region: DataFrame,
                         k: int = 3) -> DataFrame:
    """H3 — top-k suppliers by revenue within each region: the classic
    **star-schema join chain + per-group ranking**. The supplier→nation→
    region dimension chain is collapsed FIRST (three broadcast-sized
    tables joined driver-free), then the single fact scan broadcast-joins
    that one composite dim — at 100 TB the plan is one fact pass with one
    broadcast hash join, a partial-aggregated groupBy(suppkey), and a
    window ranking over the tiny aggregate (suppliers, not line items).

    Revenue sums run over exact ticks (see module header); ranking ties
    break on suppkey so row_number is deterministic."""
    from pyspark.sql import Window

    dim = (supplier
           .join(F.broadcast(nation),
                 supplier["s_nationkey"] == nation["n_nationkey"])
           .join(F.broadcast(region),
                 nation["n_regionkey"] == region["r_regionkey"])
           .select("s_suppkey", "s_name", "n_name", "r_name"))
    per_supp = (lineitem
                .join(F.broadcast(dim),
                      lineitem["l_suppkey"] == dim["s_suppkey"])
                .groupBy("r_name", "n_name", "s_suppkey", "s_name")
                .agg(F.count("*").alias("n_items"),
                     F.sum(F.expr(_REV_TICKS)).alias("rev_ticks")))
    w = Window.partitionBy("r_name").orderBy(
        F.desc("rev_ticks"), F.asc("s_suppkey"))
    return (per_supp
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("r_name", "n_name", "s_suppkey", "s_name", "rank",
                    "n_items",
                    (F.col("rev_ticks") / F.lit(10000.0)).alias("revenue")))


def region_top_suppliers_oracle_sql(k: int = 3) -> str:
    return f"""
WITH per_supp AS (
  SELECT r_name, n_name, s_suppkey, s_name,
    COUNT(*) AS n_items, SUM({_REV_TICKS}) AS rev_ticks
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2, 3, 4)
SELECT r_name, n_name, s_suppkey, s_name,
  ROW_NUMBER() OVER (PARTITION BY r_name
                     ORDER BY rev_ticks DESC, s_suppkey ASC) AS rank,
  n_items, rev_ticks / 10000.0 AS revenue
FROM per_supp
QUALIFY rank <= {k}"""


_Q1_CUTOFF = "1998-09-01 00:00:00"
#: charge has 6 decimal places (price 2 x disc 2 x tax 2)
_CHARGE_TICKS = ("CAST(ROUND(l_extendedprice * (1.0 - l_discount) "
                 "* (1.0 + l_tax) * 1000000.0) AS BIGINT)")
_PRICE_TICKS = "CAST(ROUND(l_extendedprice * 100.0) AS BIGINT)"
_DISC_TICKS = "CAST(ROUND(l_discount * 100.0) AS BIGINT)"


def pricing_summary(lineitem: DataFrame,
                    cutoff: str = _Q1_CUTOFF) -> DataFrame:
    """H4 — the TPC-H Q1 shape: scan-heavy single aggregate over the
    biggest fact table, grouped by two low-cardinality flags. The one
    shuffle carries ≤ 6 groups × partials (map-side combine does all the
    work); every money sum runs in exact integer ticks so the rollup is
    accumulation-order-proof, with one exact division at the end."""
    f = lineitem.filter(F.expr(f"l_shipdate <= TIMESTAMP '{cutoff}'"))
    return (f.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.expr("CAST(l_quantity AS BIGINT)"))
                 .alias("sum_qty"),
                 (F.sum(F.expr(_PRICE_TICKS)) / F.lit(100.0))
                 .alias("sum_base_price"),
                 (F.sum(F.expr(_REV_TICKS)) / F.lit(10000.0))
                 .alias("sum_disc_price"),
                 (F.sum(F.expr(_CHARGE_TICKS)) / F.lit(1000000.0))
                 .alias("sum_charge"),
                 (F.sum(F.expr("CAST(l_quantity AS BIGINT)"))
                  / F.count("*").cast("double")).alias("avg_qty"),
                 (F.sum(F.expr(_PRICE_TICKS))
                  / (F.count("*") * F.lit(100.0))).alias("avg_price"),
                 (F.sum(F.expr(_DISC_TICKS))
                  / (F.count("*") * F.lit(100.0))).alias("avg_disc"),
                 F.count("*").alias("count_order")))


def pricing_summary_oracle_sql(cutoff: str = _Q1_CUTOFF) -> str:
    return f"""
SELECT l_returnflag, l_linestatus,
  SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
  SUM({_PRICE_TICKS}) / 100.0 AS sum_base_price,
  SUM({_REV_TICKS}) / 10000.0 AS sum_disc_price,
  SUM({_CHARGE_TICKS}) / 1000000.0 AS sum_charge,
  SUM(CAST(l_quantity AS BIGINT)) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
  SUM({_PRICE_TICKS}) / (COUNT(*) * 100.0) AS avg_price,
  SUM({_DISC_TICKS}) / (COUNT(*) * 100.0) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{cutoff}'
GROUP BY l_returnflag, l_linestatus"""


def small_quantity_revenue(lineitem: DataFrame, part: DataFrame,
                           brand: str = "Brand#4") -> DataFrame:
    """H6 — the TPC-H Q17 shape: **per-group aggregate joined back to
    the fact** (a decorrelated correlated subquery). For each part of
    one brand, compute its average order quantity, then sum the revenue
    of line items below 20% of that average — the "small-lot" revenue.

    Scale notes: the brand filter broadcasts the pruned part-key set
    into the fact scan FIRST, so the per-part average aggregates only
    the brand's rows; the join-back is keyed on the same partkey the
    aggregate produced (AQE broadcasts the aggregate — ≤ brand-part
    cardinality rows). The 0.2·avg threshold compares exact tick ratios:
    ``50 · qty·cnt < 10 · sum_qty`` rearranged to integers, so no float
    division crosses the predicate."""
    pk = part.filter(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(F.broadcast(pk),
                       lineitem["l_partkey"] == pk["p_partkey"])
    per_part = (li.groupBy(F.col("l_partkey").alias("pk"))
                .agg(F.sum(F.expr("CAST(l_quantity AS BIGINT)"))
                     .alias("sum_qty"),
                     F.count("*").alias("cnt")))
    j = li.join(per_part, li["l_partkey"] == per_part["pk"])
    # l_quantity < 0.2 * (sum_qty / cnt)  <=>  5 * qty * cnt < sum_qty
    small = j.filter(F.expr(
        "5 * CAST(l_quantity AS BIGINT) * cnt < sum_qty"))
    return small.agg(
        F.count("*").alias("n_small_lots"),
        (F.sum(F.expr(_PRICE_TICKS)) / F.lit(100.0)).alias("total_price"),
        F.countDistinct("l_partkey").alias("n_parts"))


def small_quantity_revenue_oracle_sql(brand: str = "Brand#4") -> str:
    return f"""
WITH li AS (
  SELECT l.* FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand = '{brand}'),
per_part AS (
  SELECT l_partkey AS pk, SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
    COUNT(*) AS cnt
  FROM li GROUP BY l_partkey)
SELECT COUNT(*) AS n_small_lots,
  SUM({_PRICE_TICKS}) / 100.0 AS total_price,
  COUNT(DISTINCT l_partkey) AS n_parts
FROM li JOIN per_part ON li.l_partkey = per_part.pk
WHERE 5 * CAST(l_quantity AS BIGINT) * cnt < sum_qty"""


_Q3_DATE = "1996-03-15 00:00:00"


def shipping_priority(customer: DataFrame, orders: DataFrame,
                      lineitem: DataFrame, segment: str = "BUILDING",
                      date: str = _Q3_DATE, k: int = 10) -> DataFrame:
    """H5 — the TPC-H Q3 shape: selective dim filter (market segment)
    broadcast-semi-joined into orders, date predicates pushed to both
    fact scans, revenue rollup keyed on the join key's own table side
    (order grain), global top-k.

    Scale notes: the segment-filtered customer key set broadcasts; the
    orders⋈lineitem join is the big-big co-keyed join (bucketed layout
    co-locates it at 100 TB); the top-k is a driver-sized limit over the
    aggregated order grain, not a full sort of lineitem."""
    cust = customer.filter(F.col("c_mktsegment") == segment) \
                   .select("c_custkey")
    o = (orders.filter(F.expr(f"o_orderdate < TIMESTAMP '{date}'"))
         .join(F.broadcast(cust),
               orders["o_custkey"] == cust["c_custkey"]))
    li = lineitem.filter(F.expr(f"l_shipdate > TIMESTAMP '{date}'"))
    return (o.join(li, o["o_orderkey"] == li["l_orderkey"])
            .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.sum(F.expr(_REV_TICKS)).alias("rev_ticks"))
            .orderBy(F.desc("rev_ticks"), F.asc("o_orderkey"))
            .limit(k)
            .select("o_orderkey",
                    (F.col("rev_ticks") / F.lit(10000.0)).alias("revenue"),
                    "o_orderdate", "o_orderpriority"))


def shipping_priority_oracle_sql(segment: str = "BUILDING",
                                 date: str = _Q3_DATE,
                                 k: int = 10) -> str:
    return f"""
SELECT o_orderkey,
  SUM({_REV_TICKS}) / 10000.0 AS revenue,
  o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{segment}'
  AND o_orderdate < TIMESTAMP '{date}'
  AND l_shipdate > TIMESTAMP '{date}'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY SUM({_REV_TICKS}) DESC, o_orderkey ASC
LIMIT {k}"""


FUZZY_MAX_DIST = 3


def fuzzy_name_pairs(part: DataFrame,
                     max_dist: int = FUZZY_MAX_DIST) -> DataFrame:
    """H7 — fuzzy string-match join: distinct part names that are
    near-misses of each other (edit distance ≤ ``max_dist``), the
    entity-resolution shape (catalog dedup, vendor-name matching).

    Scale shape: never the N² name product — candidates block on the
    name's last token (the noun), an equi-join, so comparisons are
    Σ|block|²; the levenshtein verify runs only inside blocks. Edit
    distance is integer and identical across engines, so the oracle
    checks distances exactly. The distinct-name table is vocab-sized
    (map-side-combined groupBy), not row-count-sized."""
    names = (part.groupBy("p_name")
             .agg(F.count("*").alias("n_parts"))
             .withColumn("block", F.expr(
                 "element_at(split(p_name, ' '), -1)")))
    a, b = names.alias("a"), names.alias("b")
    return (a.join(b, F.expr("a.block = b.block AND a.p_name < b.p_name"))
            .withColumn("dist", F.expr("levenshtein(a.p_name, b.p_name)"))
            .filter(F.col("dist") <= max_dist)
            .select(F.expr("a.p_name").alias("name_a"),
                    F.expr("b.p_name").alias("name_b"),
                    "dist",
                    F.expr("a.n_parts").alias("n_parts_a"),
                    F.expr("b.n_parts").alias("n_parts_b")))


def fuzzy_name_pairs_oracle_sql(max_dist: int = FUZZY_MAX_DIST) -> str:
    return f"""
WITH names AS (
  SELECT p_name, COUNT(*) AS n_parts,
    string_split(p_name, ' ')[-1] AS block
  FROM part GROUP BY p_name)
SELECT a.p_name AS name_a, b.p_name AS name_b,
  levenshtein(a.p_name, b.p_name) AS dist,
  a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
FROM names a JOIN names b
  ON a.block = b.block AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {max_dist}"""
