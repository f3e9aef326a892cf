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
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
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
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
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


_Q4_START = "1996-07-01 00:00:00"
_Q4_END = "1996-10-01 00:00:00"


def late_order_priority(orders: DataFrame, lineitem: DataFrame,
                        start: str = _Q4_START,
                        end: str = _Q4_END) -> DataFrame:
    """H8 — the TPC-H Q4 shape: **EXISTS decorrelated to a left-semi
    join**. Count one quarter's orders, per priority, that had at least
    one line item ship more than 30 days after the order date (this
    schema's stand-in for Q4's commit<receipt lateness predicate).

    Scale notes: the quarter filter prunes the orders scan before the
    join (partition pruning on a date-partitioned layout); the semi join
    carries only (orderkey, orderdate) against lineitem keys and
    short-circuits on the first match per order — no fact×fact row
    multiplication, no DISTINCT. The final rollup is ≤ 5 groups."""
    o = orders.filter(F.expr(
        f"o_orderdate >= TIMESTAMP '{start}' "
        f"AND o_orderdate < TIMESTAMP '{end}'"))
    late = o.join(
        lineitem,
        F.expr("l_orderkey = o_orderkey "
               "AND l_shipdate > o_orderdate + INTERVAL 30 DAY"),
        "left_semi")
    return (late.groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count")))


def late_order_priority_oracle_sql(start: str = _Q4_START,
                                   end: str = _Q4_END) -> str:
    return f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{start}'
  AND o_orderdate < TIMESTAMP '{end}'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority"""


LARGE_ORDER_QTY = 250


def large_orders(customer: DataFrame, orders: DataFrame,
                 lineitem: DataFrame,
                 min_qty: int = LARGE_ORDER_QTY) -> DataFrame:
    """H9 — the TPC-H Q18 shape: **HAVING over a fact aggregate, joined
    back through the dim chain**. Find orders whose total quantity
    exceeds ``min_qty`` and attach the customer.

    Scale notes: the aggregate runs on lineitem alone, keyed by its own
    join key (orderkey) — map-side combine collapses ~4 lines/order
    before the shuffle; the HAVING prunes to a tiny key set that then
    drives semi-join-sized probes into orders and customer (AQE
    broadcasts it). Quantity sums are integer ticks — exact."""
    big = (lineitem.groupBy("l_orderkey")
           .agg(F.sum(F.expr("CAST(l_quantity AS BIGINT)")).alias("sum_qty"))
           .filter(F.col("sum_qty") > min_qty))
    return (orders.join(big, orders["o_orderkey"] == big["l_orderkey"])
            .join(customer, orders["o_custkey"] == customer["c_custkey"])
            .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                    (F.expr("CAST(ROUND(o_totalprice * 100.0) AS BIGINT)")
                     / F.lit(100.0)).alias("o_totalprice"),
                    "sum_qty"))


def large_orders_oracle_sql(min_qty: int = LARGE_ORDER_QTY) -> str:
    return f"""
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS BIGINT)) > {min_qty})
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
  CAST(ROUND(o_totalprice * 100.0) AS BIGINT) / 100.0 AS o_totalprice,
  sum_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey"""


_Q14_START = "1996-01-01 00:00:00"
_Q14_END = "1996-04-01 00:00:00"


def promo_revenue_share(lineitem: DataFrame, part: DataFrame,
                        promo_type: str = "PROMO",
                        start: str = _Q14_START,
                        end: str = _Q14_END) -> DataFrame:
    """H10 — the TPC-H Q14 shape: **conditional aggregation over a
    broadcast dim join** (promo revenue share for one quarter). One fact
    pass; the part table broadcasts; promo/total split is a CASE inside
    the same aggregate, not two scans.

    The share itself is reported in exact integer basis points
    (``10000·promo div total``) — integer division floors identically
    in both engines, so the ratio is hash-stable without any float."""
    li = lineitem.filter(F.expr(
        f"l_shipdate >= TIMESTAMP '{start}' "
        f"AND l_shipdate < TIMESTAMP '{end}'"))
    j = li.join(F.broadcast(part.select("p_partkey", "p_type")),
                li["l_partkey"] == part["p_partkey"])
    agg = j.agg(
        F.sum(F.expr(f"CASE WHEN p_type = '{promo_type}' "
                     f"THEN {_REV_TICKS} ELSE 0 END")).alias("promo_ticks"),
        F.sum(F.expr(_REV_TICKS)).alias("total_ticks"))
    return agg.select(
        (F.col("promo_ticks") / F.lit(10000.0)).alias("promo_revenue"),
        (F.col("total_ticks") / F.lit(10000.0)).alias("total_revenue"),
        F.expr("(10000 * promo_ticks) div total_ticks")
        .alias("promo_share_bp"))


def promo_revenue_share_oracle_sql(promo_type: str = "PROMO",
                                   start: str = _Q14_START,
                                   end: str = _Q14_END) -> str:
    return f"""
WITH agg AS (
  SELECT
    SUM(CASE WHEN p_type = '{promo_type}' THEN {_REV_TICKS} ELSE 0 END)
      AS promo_ticks,
    SUM({_REV_TICKS}) AS total_ticks
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{start}'
    AND l_shipdate < TIMESTAMP '{end}')
SELECT promo_ticks / 10000.0 AS promo_revenue,
  total_ticks / 10000.0 AS total_revenue,
  CAST((10000 * promo_ticks) // total_ticks AS BIGINT) AS promo_share_bp
FROM agg"""


def customer_order_distribution(customer: DataFrame, orders: DataFrame,
                                excl_priority: str = "4-NOT SPECIFIED",
                                ) -> DataFrame:
    """H11 — the TPC-H Q13 shape: **left outer fact join + double
    aggregate** (the distribution of orders-per-customer, zeroes
    included). The excluded-priority predicate plays Q13's
    comment-pattern filter.

    Scale notes: aggregate #1 keys on custkey (the join key — one
    shuffle shared by join and groupBy); aggregate #2's input is one row
    per customer and its output is the tiny histogram. The left outer
    join keeps never-ordered customers: their NULL order rows count 0
    (COUNT(o_custkey) skips nulls — the exact Q13 trick)."""
    o = orders.filter(F.col("o_orderpriority") != excl_priority)
    per_cust = (customer.join(
        o, customer["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_custkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count("*").alias("custdist")))


def customer_order_distribution_oracle_sql(
        excl_priority: str = "4-NOT SPECIFIED") -> str:
    return f"""
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_custkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '{excl_priority}'
  GROUP BY c_custkey)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust GROUP BY c_count"""


_Q10_START = "1997-01-01 00:00:00"
_Q10_END = "1997-04-01 00:00:00"


def returned_item_losses(customer: DataFrame, orders: DataFrame,
                         lineitem: DataFrame, nation: DataFrame,
                         start: str = _Q10_START, end: str = _Q10_END,
                         k: int = 20) -> DataFrame:
    """H12 — the TPC-H Q10 shape: revenue lost to returned items per
    customer for one quarter, top-k offenders. Both date predicates push
    into the scans; the returnflag filter prunes lineitem to ~1/3 before
    the big-big join; customer and nation broadcast into the aggregated
    order grain. Deterministic top-k: ties break on custkey."""
    o = orders.filter(F.expr(
        f"o_orderdate >= TIMESTAMP '{start}' "
        f"AND o_orderdate < TIMESTAMP '{end}'"))
    li = lineitem.filter(F.col("l_returnflag") == "R")
    per_cust = (o.join(li, o["o_orderkey"] == li["l_orderkey"])
                .groupBy("o_custkey")
                .agg(F.sum(F.expr(_REV_TICKS)).alias("rev_ticks")))
    j = (per_cust
         .join(customer, per_cust["o_custkey"] == customer["c_custkey"])
         .join(F.broadcast(nation),
               customer["c_nationkey"] == nation["n_nationkey"]))
    return (j.orderBy(F.desc("rev_ticks"), F.asc("c_custkey"))
            .limit(k)
            .select("c_custkey", "c_name", "n_name",
                    (F.col("rev_ticks") / F.lit(10000.0)).alias("revenue"),
                    (F.expr("CAST(ROUND(c_acctbal * 100.0) AS BIGINT)")
                     / F.lit(100.0)).alias("c_acctbal")))


def returned_item_losses_oracle_sql(start: str = _Q10_START,
                                    end: str = _Q10_END,
                                    k: int = 20) -> str:
    return f"""
WITH per_cust AS (
  SELECT o_custkey, SUM({_REV_TICKS}) AS rev_ticks
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_orderdate >= TIMESTAMP '{start}'
    AND o_orderdate < TIMESTAMP '{end}'
    AND l_returnflag = 'R'
  GROUP BY o_custkey)
SELECT c_custkey, c_name, n_name,
  rev_ticks / 10000.0 AS revenue,
  CAST(ROUND(c_acctbal * 100.0) AS BIGINT) / 100.0 AS c_acctbal
FROM per_cust
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY rev_ticks DESC, c_custkey ASC
LIMIT {k}"""


_Q5_START = "1996-01-01 00:00:00"
_Q5_END = "1997-01-01 00:00:00"


def local_supplier_volume(customer: DataFrame, orders: DataFrame,
                          lineitem: DataFrame, supplier: DataFrame,
                          nation: DataFrame, region: DataFrame,
                          region_name: str = "ASIA",
                          start: str = _Q5_START,
                          end: str = _Q5_END) -> DataFrame:
    """H13 — the TPC-H Q5 shape: revenue per nation from orders where the
    customer and the line-item supplier share a nation, one region, one
    year. The one headline query that needs THREE fact-side joins.

    Scale shape: the supplier→nation→region dim chain collapses first and
    prunes to one region *before* touching facts; the customer table
    broadcast-reduces to (custkey, nationkey) of that region. Facts join
    big-big on orderkey (co-bucketable), then lineitem's suppkey
    broadcast-joins the pruned supplier dim; the ``c_nationkey =
    s_nationkey`` colocation predicate runs as a cheap post-join filter,
    never as a join explosion. Final rollup keys on ≤ 25 nations."""
    sdim = (supplier
            .join(F.broadcast(nation),
                  supplier["s_nationkey"] == nation["n_nationkey"])
            .join(F.broadcast(region.filter(F.col("r_name") == region_name)),
                  nation["n_regionkey"] == region["r_regionkey"])
            .select("s_suppkey", F.col("s_nationkey").alias("supp_nk"),
                    "n_name"))
    cust = customer.select("c_custkey", F.col("c_nationkey").alias("cust_nk"))
    o = orders.filter(F.expr(
        f"o_orderdate >= TIMESTAMP '{start}' "
        f"AND o_orderdate < TIMESTAMP '{end}'"))
    return (o.join(lineitem, o["o_orderkey"] == lineitem["l_orderkey"])
            .join(F.broadcast(sdim),
                  lineitem["l_suppkey"] == sdim["s_suppkey"])
            .join(F.broadcast(cust), o["o_custkey"] == cust["c_custkey"])
            .filter(F.col("cust_nk") == F.col("supp_nk"))
            .groupBy("n_name")
            .agg(F.count("*").alias("n_items"),
                 (F.sum(F.expr(_REV_TICKS)) / F.lit(10000.0))
                 .alias("revenue")))


def local_supplier_volume_oracle_sql(region_name: str = "ASIA",
                                     start: str = _Q5_START,
                                     end: str = _Q5_END) -> str:
    return f"""
SELECT n_name, COUNT(*) AS n_items, SUM({_REV_TICKS}) / 10000.0 AS revenue
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN customer ON o_custkey = c_custkey
WHERE r_name = '{region_name}'
  AND o_orderdate >= TIMESTAMP '{start}'
  AND o_orderdate < TIMESTAMP '{end}'
  AND c_nationkey = s_nationkey
GROUP BY n_name"""


def part_supplier_counts(part: DataFrame, lineitem: DataFrame,
                         supplier: DataFrame,
                         excluded_brand: str = "Brand#1",
                         max_size: int = 25) -> DataFrame:
    """H14 — the TPC-H Q16 shape: how many distinct suppliers can deliver
    each (brand, type, size) part class, excluding one brand and
    suppliers on a denylist (here: negative account balance — the
    analogue of Q16's complaint suppliers).

    Scale shape: part prunes by brand/size *at the scan*; the
    (partkey, suppkey) pair set comes from lineitem via a
    distinct-projection (two narrow columns of the fact, partial-
    aggregated before the shuffle); the denylist is a broadcast **anti**
    join; the final COUNT(DISTINCT suppkey) groups on the small part-
    class table. A 100 TB lineitem contributes only its pruned distinct
    pair set to the shuffle."""
    pairs = (lineitem.select("l_partkey", "l_suppkey").distinct())
    p = part.filter((F.col("p_brand") != excluded_brand)
                    & (F.col("p_size") <= max_size))
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (pairs
            .join(F.broadcast(bad),
                  pairs["l_suppkey"] == bad["s_suppkey"], "left_anti")
            .join(F.broadcast(p.select("p_partkey", "p_brand", "p_type",
                                       "p_size")),
                  pairs["l_partkey"] == p["p_partkey"])
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


def part_supplier_counts_oracle_sql(excluded_brand: str = "Brand#1",
                                    max_size: int = 25) -> str:
    return f"""
SELECT p_brand, p_type, p_size,
  COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{excluded_brand}' AND p_size <= {max_size}
  AND l_suppkey NOT IN
    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size"""


# ---------------------------------------------------------------- Q7 (H15) ---

_Q7_NATION_A = "NATION_3"
_Q7_NATION_B = "NATION_7"


def volume_shipping(customer: DataFrame, orders: DataFrame,
                    lineitem: DataFrame, supplier: DataFrame,
                    nation: DataFrame,
                    nation_a: str = _Q7_NATION_A,
                    nation_b: str = _Q7_NATION_B) -> DataFrame:
    """H15 — the TPC-H Q7 shape: bilateral trade volume between two
    nations by ship year — supplier nation on the lineitem side,
    customer nation through the orders side, both directions kept.

    Scale shape: the two-nation filter collapses supplier and customer
    to broadcast-sized key sets BEFORE either touches a fact table, so
    the only big-big work is the co-keyed orders ⋈ lineitem join; the
    cross-nation predicate (supp ≠ cust nation) is a post-join filter on
    two broadcast-delivered columns. Group keys: 2 nations × years."""
    nsel = nation.filter(F.col("n_name").isin(nation_a, nation_b))
    sdim = (supplier.join(F.broadcast(nsel),
                          supplier["s_nationkey"] == nsel["n_nationkey"])
            .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    cdim = (customer.join(F.broadcast(nsel),
                          customer["c_nationkey"] == nsel["n_nationkey"])
            .select("c_custkey", F.col("n_name").alias("cust_nation")))
    return (lineitem
            .join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
            .join(F.broadcast(sdim),
                  lineitem["l_suppkey"] == sdim["s_suppkey"])
            .join(F.broadcast(cdim),
                  orders["o_custkey"] == cdim["c_custkey"])
            .filter(F.col("supp_nation") != F.col("cust_nation"))
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").alias("l_year"))
            .agg(F.count("*").alias("n_items"),
                 (F.sum(F.expr(_REV_TICKS)) / F.lit(10000.0))
                 .alias("volume")))


def volume_shipping_oracle_sql(nation_a: str = _Q7_NATION_A,
                               nation_b: str = _Q7_NATION_B) -> str:
    return f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
  COUNT(*) AS n_items, SUM({_REV_TICKS}) / 10000.0 AS volume
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('{nation_a}', '{nation_b}')
  AND n2.n_name IN ('{nation_a}', '{nation_b}')
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3"""


# ---------------------------------------------------------------- Q8 (H16) ---


def market_share(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                 supplier: DataFrame, nation: DataFrame, region: DataFrame,
                 part: DataFrame, target_nation: str = "NATION_5",
                 region_name: str = "ASIA",
                 part_type: str = "ECONOMY") -> DataFrame:
    """H16 — the TPC-H Q8 shape: one supplier nation's share of a
    region's market for one part type, per order year — the
    conditional-numerator / unconditional-denominator single-pass
    aggregate over a many-way star join.

    Scale shape: part prunes by type at the scan and broadcast-joins
    lineitem (the fact never shuffles for a dim); the customer side
    prunes to one region's custkeys (broadcast); supplier contributes
    only a (suppkey, is_target) boolean column. The share division runs
    on two exact BIGINT tick sums per year — identical IEEE doubles on
    both engines."""
    r = region.filter(F.col("r_name") == region_name)
    rn = (nation.join(F.broadcast(r),
                      nation["n_regionkey"] == r["r_regionkey"])
          .select("n_nationkey"))
    cdim = (customer.join(F.broadcast(rn),
                          customer["c_nationkey"] == rn["n_nationkey"])
            .select("c_custkey"))
    tgt = nation.filter(F.col("n_name") == target_nation)
    sdim = (supplier.join(F.broadcast(tgt),
                          supplier["s_nationkey"] == tgt["n_nationkey"],
                          "left_semi")
            .select("s_suppkey"))
    pdim = part.filter(F.col("p_type") == part_type).select("p_partkey")
    joined = (lineitem
              .join(F.broadcast(pdim),
                    lineitem["l_partkey"] == pdim["p_partkey"], "left_semi")
              .join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
              .join(F.broadcast(cdim),
                    orders["o_custkey"] == cdim["c_custkey"], "left_semi")
              .join(F.broadcast(sdim.withColumn("is_target", F.lit(1))),
                    lineitem["l_suppkey"] == sdim["s_suppkey"], "left")
              .select(F.year("o_orderdate").alias("o_year"),
                      F.expr(_REV_TICKS).alias("rev"),
                      F.coalesce("is_target", F.lit(0)).alias("is_target")))
    return (joined.groupBy("o_year")
            .agg((F.sum(F.expr("CASE WHEN is_target = 1 THEN rev"
                               " ELSE CAST(0 AS BIGINT) END"))
                  .cast("double")
                  / F.sum("rev").cast("double")).alias("mkt_share"),
                 F.sum("rev").alias("total_ticks")))


def market_share_oracle_sql(target_nation: str = "NATION_5",
                            region_name: str = "ASIA",
                            part_type: str = "ECONOMY") -> str:
    return f"""
WITH joined AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
    {_REV_TICKS} AS rev,
    CASE WHEN n1.n_name = '{target_nation}' THEN 1 ELSE 0 END AS is_target
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region ON n2.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  WHERE p_type = '{part_type}' AND r_name = '{region_name}')
SELECT o_year,
  CAST(SUM(CASE WHEN is_target = 1 THEN rev ELSE CAST(0 AS BIGINT) END)
       AS DOUBLE) / CAST(SUM(rev) AS DOUBLE) AS mkt_share,
  CAST(SUM(rev) AS BIGINT) AS total_ticks
FROM joined GROUP BY o_year"""


# ---------------------------------------------------------------- Q9 (H17) ---


def product_profit(orders: DataFrame, lineitem: DataFrame,
                   supplier: DataFrame, nation: DataFrame, part: DataFrame,
                   name_like: str = "red") -> DataFrame:
    """H17 — the TPC-H Q9 shape: profit per (supplier nation, order
    year) over one part family. This schema has no partsupp, so unit
    cost is the part's retail price (exact cents) — the join topology
    (two fact-side joins + part-name scan prune + supplier→nation dim
    chain) is what Q9 exercises.

    profit = Σ (extprice·(1−discount) − retailprice·quantity), summed in
    1e-4 ticks so accumulation order can't flap the hash."""
    pdim = (part.filter(F.col("p_name").contains(name_like))
            .select("p_partkey",
                    F.expr("CAST(ROUND(p_retailprice * 100.0) AS BIGINT)")
                    .alias("cost_cents")))
    sdim = (supplier.join(F.broadcast(nation),
                          supplier["s_nationkey"] == nation["n_nationkey"])
            .select("s_suppkey", "n_name"))
    profit_ticks = (
        f"({_REV_TICKS}) - cost_cents * CAST(l_quantity AS BIGINT) * 100")
    return (lineitem
            .join(F.broadcast(pdim),
                  lineitem["l_partkey"] == pdim["p_partkey"])
            .join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
            .join(F.broadcast(sdim),
                  lineitem["l_suppkey"] == sdim["s_suppkey"])
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").alias("o_year"))
            .agg(F.count("*").alias("n_items"),
                 (F.sum(F.expr(profit_ticks)) / F.lit(10000.0))
                 .alias("profit")))


def product_profit_oracle_sql(name_like: str = "red") -> str:
    return f"""
SELECT n_name AS nation,
  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
  COUNT(*) AS n_items,
  SUM(({_REV_TICKS}) - CAST(ROUND(p_retailprice * 100.0) AS BIGINT)
      * CAST(l_quantity AS BIGINT) * 100) / 10000.0 AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%{name_like}%'
GROUP BY 1, 2"""


# --------------------------------------------------------------- Q11 (H18) ---

IMPORTANT_PART_PPM = 1500   # threshold: > total/1500


def important_parts(lineitem: DataFrame, part: DataFrame,
                    ppm: int = IMPORTANT_PART_PPM) -> DataFrame:
    """H18 — the TPC-H Q11 shape: parts whose traded value exceeds a
    fraction of the global total — a **scalar-aggregate subquery**
    against a grouped aggregate (HAVING vs a global sum).

    Scale shape: one partial-aggregated groupBy(partkey) pass produces
    both the per-part sums and (re-aggregated) the global total — the
    total re-derives from the ~|parts| aggregate, not a second fact
    scan. The threshold compare is all-BIGINT (value·ppm > total), so
    no float boundary can flap membership. The 1-row total broadcasts."""
    per = (lineitem.groupBy(F.col("l_partkey").alias("p_key"))
           .agg(F.sum(F.expr(_REV_TICKS)).alias("value_ticks")))
    total = per.agg(F.sum("value_ticks").alias("total_ticks"))
    return (per.crossJoin(F.broadcast(total))
            .filter(F.col("value_ticks") * ppm > F.col("total_ticks"))
            .join(F.broadcast(part.select("p_partkey", "p_name")),
                  F.col("p_key") == F.col("p_partkey"))
            .select("p_partkey", "p_name",
                    (F.col("value_ticks") / F.lit(10000.0)).alias("value")))


def important_parts_oracle_sql(ppm: int = IMPORTANT_PART_PPM) -> str:
    return f"""
WITH per AS (
  SELECT l_partkey, SUM({_REV_TICKS}) AS value_ticks
  FROM lineitem GROUP BY l_partkey),
total AS (SELECT SUM(value_ticks) AS total_ticks FROM per)
SELECT p_partkey, p_name, value_ticks / 10000.0 AS value
FROM per, total
JOIN part ON l_partkey = p_partkey
WHERE value_ticks * {ppm} > total_ticks"""


# --------------------------------------------------------------- Q15 (H20) ---

_Q15_START = "1996-01-01 00:00:00"
_Q15_END = "1996-04-01 00:00:00"


def top_supplier(lineitem: DataFrame, supplier: DataFrame,
                 start: str = _Q15_START, end: str = _Q15_END) -> DataFrame:
    """H20 — the TPC-H Q15 shape: the supplier(s) with the maximum
    quarterly revenue — an aggregate, its own MAX as a scalar subquery,
    and an equality join back (ties all surface, as in the spec).

    Scale shape: the date filter prunes the fact scan; revenue
    aggregates per suppkey with map-side combine; MAX runs over the
    supplier-sized aggregate; the equality compare is exact BIGINT
    ticks, so cross-engine tie sets are identical."""
    rev = (lineitem.filter(F.expr(
        f"l_shipdate >= TIMESTAMP '{start}' "
        f"AND l_shipdate < TIMESTAMP '{end}'"))
        .groupBy(F.col("l_suppkey").alias("sk"))
        .agg(F.sum(F.expr(_REV_TICKS)).alias("rev_ticks")))
    mx = rev.agg(F.max("rev_ticks").alias("max_ticks"))
    return (rev.crossJoin(F.broadcast(mx))
            .filter(F.col("rev_ticks") == F.col("max_ticks"))
            .join(F.broadcast(supplier),
                  F.col("sk") == supplier["s_suppkey"])
            .select("s_suppkey", "s_name",
                    (F.col("rev_ticks") / F.lit(10000.0))
                    .alias("total_revenue")))


def top_supplier_oracle_sql(start: str = _Q15_START,
                            end: str = _Q15_END) -> str:
    return f"""
WITH rev AS (
  SELECT l_suppkey, SUM({_REV_TICKS}) AS rev_ticks
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{start}'
    AND l_shipdate < TIMESTAMP '{end}'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, rev_ticks / 10000.0 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_ticks = (SELECT MAX(rev_ticks) FROM rev)"""


# --------------------------------------------------------------- Q19 (H21) ---


def disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """H21 — the TPC-H Q19 shape: revenue under an OR-of-ANDs predicate
    spanning both join sides (brand/size from part, quantity from
    lineitem) — the disjunction Catalyst must evaluate post-join while
    still pushing the per-side prunes (size ≤ 15, qty ≤ 30, brand set)
    into the scans.

    Scale shape: part collapses to a broadcast (partkey, brand, size)
    map pre-pruned to the union of branch ranges; lineitem prunes on
    quantity at the scan. One row out."""
    pdim = (part.filter(F.col("p_size").between(1, 15)
                        & F.col("p_brand").isin("Brand#1", "Brand#2",
                                                "Brand#3"))
            .select("p_partkey", "p_brand", "p_size"))
    qty = "CAST(ROUND(l_quantity) AS BIGINT)"
    branch = (f"(p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 "
              f"  AND {qty} BETWEEN 1 AND 10) OR "
              f"(p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 "
              f"  AND {qty} BETWEEN 10 AND 20) OR "
              f"(p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 "
              f"  AND {qty} BETWEEN 20 AND 30)")
    return (lineitem.filter(F.expr(f"{qty} <= 30"))
            .join(F.broadcast(pdim),
                  lineitem["l_partkey"] == pdim["p_partkey"])
            .filter(F.expr(branch))
            .agg(F.count("*").alias("n_items"),
                 (F.coalesce(F.sum(F.expr(_REV_TICKS)),
                             F.lit(0).cast("bigint"))
                  / F.lit(10000.0)).alias("revenue")))


def disjunctive_revenue_oracle_sql() -> str:
    qty = "CAST(ROUND(l_quantity) AS BIGINT)"
    return f"""
SELECT COUNT(*) AS n_items,
  COALESCE(SUM({_REV_TICKS}), 0) / 10000.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND {qty} BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND {qty} BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND {qty} BETWEEN 20 AND 30)"""


# --------------------------------------------------------------- Q20 (H22) ---

EXCESS_QTY = 100


def excess_suppliers(lineitem: DataFrame, supplier: DataFrame,
                     nation: DataFrame, part: DataFrame,
                     name_like: str = "blue", year: int = 1997,
                     min_qty: int = EXCESS_QTY,
                     nation_prefix_max: int = 12) -> DataFrame:
    """H22 — the TPC-H Q20 shape: suppliers who moved more than a
    threshold quantity of one part family in one year — a nested
    aggregate subquery whose surviving key set **semi-joins** the
    supplier dim, further pruned by nation.

    Scale shape: the part-family prune broadcasts into the fact scan as
    a semi join; the year filter prunes at the scan; the per-supplier
    quantity aggregate is integer and partial-combined; only the
    over-threshold suppkeys (tiny) probe supplier."""
    pdim = part.filter(F.col("p_name").contains(name_like)) \
               .select("p_partkey")
    shipped = (lineitem.filter(F.year("l_shipdate") == year)
               .join(F.broadcast(pdim),
                     lineitem["l_partkey"] == pdim["p_partkey"],
                     "left_semi")
               .groupBy(F.col("l_suppkey").alias("sk"))
               .agg(F.sum(F.expr("CAST(l_quantity AS BIGINT)"))
                    .alias("qty"))
               .filter(F.col("qty") > min_qty))
    nsel = nation.filter(F.col("n_nationkey") <= nation_prefix_max)
    return (supplier
            .join(F.broadcast(nsel),
                  supplier["s_nationkey"] == nsel["n_nationkey"],
                  "left_semi")
            .join(shipped, supplier["s_suppkey"] == shipped["sk"])
            .select("s_suppkey", "s_name", "qty"))


def excess_suppliers_oracle_sql(name_like: str = "blue", year: int = 1997,
                                min_qty: int = EXCESS_QTY,
                                nation_prefix_max: int = 12) -> str:
    return f"""
WITH shipped AS (
  SELECT l_suppkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem
  WHERE EXTRACT(year FROM l_shipdate) = {year}
    AND l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_name LIKE '%{name_like}%')
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS BIGINT)) > {min_qty})
SELECT s_suppkey, s_name, qty
FROM supplier JOIN shipped ON s_suppkey = l_suppkey
WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                      WHERE n_nationkey <= {nation_prefix_max})"""


# --------------------------------------------------------------- Q21 (H23) ---

_LATE_DAYS = 60


def blame_suppliers(orders: DataFrame, lineitem: DataFrame,
                    supplier: DataFrame,
                    late_days: int = _LATE_DAYS) -> DataFrame:
    """H23 — the TPC-H Q21 shape: for multi-supplier orders where
    exactly ONE supplier shipped late, count the orders pinned on each
    such supplier. Q21's double-EXISTS correlation decorrelates into a
    single per-order aggregate: distinct suppliers, distinct late
    suppliers, and (when unique) the late one.

    Scale shape: one big-big co-keyed join (orders ⋈ lineitem on
    orderkey) feeds a groupBy(orderkey) whose state is three small
    aggregates — no row multiplication, no correlated re-scans; the
    blame rollup keys on ~|suppliers|."""
    late = (f"CASE WHEN l_shipdate > o_orderdate + INTERVAL {late_days} DAY"
            f" THEN l_suppkey END")
    per_order = (lineitem
                 .join(orders.select("o_orderkey", "o_orderdate"),
                       lineitem["l_orderkey"] == orders["o_orderkey"])
                 .groupBy("l_orderkey")
                 .agg(F.countDistinct("l_suppkey").alias("n_supp"),
                      F.countDistinct(F.expr(late)).alias("n_late"),
                      F.max(F.expr(late)).alias("late_sk")))
    blamed = per_order.filter((F.col("n_supp") >= 2)
                              & (F.col("n_late") == 1))
    return (blamed.join(F.broadcast(supplier),
                        blamed["late_sk"] == supplier["s_suppkey"])
            .groupBy("s_suppkey", "s_name")
            .agg(F.count("*").alias("numwait")))


def blame_suppliers_oracle_sql(late_days: int = _LATE_DAYS) -> str:
    return f"""
WITH per_order AS (
  SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp,
    COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate
                         + INTERVAL {late_days} DAY
                   THEN l_suppkey END) AS n_late,
    MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL {late_days} DAY
        THEN l_suppkey END) AS late_sk
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_orderkey)
SELECT s_suppkey, s_name, COUNT(*) AS numwait
FROM per_order JOIN supplier ON late_sk = s_suppkey
WHERE n_supp >= 2 AND n_late = 1
GROUP BY s_suppkey, s_name"""


# --------------------------------------------------------------- Q22 (H24) ---


_Q22_CUTOFF = "1999-01-01 00:00:00"


def idle_rich_customers(customer: DataFrame, orders: DataFrame,
                        nation: DataFrame,
                        cutoff: str = _Q22_CUTOFF) -> DataFrame:
    """H24 — the TPC-H Q22 shape: customers richer than the positive
    global average balance with no recent order, rolled up by nation (the
    schema's stand-in for Q22's phone-prefix country code) — a scalar
    AVG subquery plus an **anti join** against the fact key set.

    Scale shape: the average is one broadcast row; the
    above-average compare is exact (cents·count > sum — all BIGINT, no
    float boundary); the anti join ships only orders' distinct custkeys;
    the nation rollup is a ≤25-key broadcast join."""
    cents = "CAST(ROUND(c_acctbal * 100.0) AS BIGINT)"
    stats = (customer.filter(F.col("c_acctbal") > 0)
             .agg(F.sum(F.expr(cents)).alias("sum_cents"),
                  F.count("*").alias("n_pos")))
    rich = (customer.withColumn("cents", F.expr(cents))
            .crossJoin(F.broadcast(stats))
            .filter(F.col("cents") * F.col("n_pos") > F.col("sum_cents")))
    recent = orders.filter(
        F.expr(f"o_orderdate >= TIMESTAMP '{cutoff}'")).select("o_custkey")
    idle = rich.join(recent,
                     rich["c_custkey"] == recent["o_custkey"], "left_anti")
    return (idle.join(F.broadcast(nation),
                      idle["c_nationkey"] == nation["n_nationkey"])
            .groupBy("n_name")
            .agg(F.count("*").alias("numcust"),
                 (F.sum("cents") / F.lit(100.0)).alias("totacctbal")))


def idle_rich_customers_oracle_sql(cutoff: str = _Q22_CUTOFF) -> str:
    cents = "CAST(ROUND(c_acctbal * 100.0) AS BIGINT)"
    return f"""
WITH stats AS (
  SELECT CAST(SUM({cents}) AS BIGINT) AS sum_cents, COUNT(*) AS n_pos
  FROM customer WHERE c_acctbal > 0),
rich AS (
  SELECT c_custkey, c_nationkey, {cents} AS cents
  FROM customer, stats
  WHERE {cents} * n_pos > sum_cents)
SELECT n_name, COUNT(*) AS numcust,
  CAST(SUM(cents) AS BIGINT) / 100.0 AS totacctbal
FROM rich
JOIN nation ON c_nationkey = n_nationkey
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderdate >= TIMESTAMP '{cutoff}')
GROUP BY n_name"""


# ---------------------------------------------------------------- Q6 (H25) ---

_Q6_START = "1996-01-01 00:00:00"
_Q6_END = "1997-01-01 00:00:00"


def forecast_revenue(lineitem: DataFrame, start: str = _Q6_START,
                     end: str = _Q6_END, disc_lo: int = 5, disc_hi: int = 7,
                     max_qty: int = 24) -> DataFrame:
    """H25 — the TPC-H Q6 shape: pure scan → filter → one-row aggregate,
    no joins. The query exists to prove the predicates reach the scan
    (`PushedFilters` on shipdate/quantity) and everything stays in one
    WholeStageCodegen span. Discount matching uses exact percent ticks,
    not a float BETWEEN."""
    disc = "CAST(ROUND(l_discount * 100.0) AS BIGINT)"
    amt = ("CAST(ROUND(l_extendedprice * l_discount * 10000.0) AS BIGINT)")
    return (lineitem.filter(F.expr(
        f"l_shipdate >= TIMESTAMP '{start}' "
        f"AND l_shipdate < TIMESTAMP '{end}' "
        f"AND l_quantity < {max_qty} "
        f"AND {disc} BETWEEN {disc_lo} AND {disc_hi}"))
        .agg(F.count("*").alias("n_items"),
             (F.coalesce(F.sum(F.expr(amt)), F.lit(0).cast("bigint"))
              / F.lit(10000.0)).alias("revenue")))


def forecast_revenue_oracle_sql(start: str = _Q6_START, end: str = _Q6_END,
                                disc_lo: int = 5, disc_hi: int = 7,
                                max_qty: int = 24) -> str:
    return f"""
SELECT COUNT(*) AS n_items,
  COALESCE(SUM(CAST(ROUND(l_extendedprice * l_discount * 10000.0)
                    AS BIGINT)), 0) / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{start}'
  AND l_shipdate < TIMESTAMP '{end}'
  AND l_quantity < {max_qty}
  AND CAST(ROUND(l_discount * 100.0) AS BIGINT)
      BETWEEN {disc_lo} AND {disc_hi}"""


# ---------------------------------------------------------------- Q2 (H19) ---


def min_cost_supplier(lineitem: DataFrame, supplier: DataFrame,
                      nation: DataFrame, region: DataFrame, part: DataFrame,
                      region_name: str = "ASIA", part_size: int = 10
                      ) -> DataFrame:
    """H19 — the TPC-H Q2 shape: for each part of one size class, the
    region's supplier(s) offering the minimum observed unit price — the
    classic **correlated-min subquery decorrelated** into a per-part
    aggregate plus an equality join-back (ties all surface). Unit price
    stands in for the absent partsupp supplycost: the minimum
    ``round(extendedprice·100/quantity)`` cents each supplier ever
    quoted for the part.

    Scale shape: part prunes by size at the scan (broadcast); the
    region's supplier set collapses via the dim chain BEFORE touching
    lineitem; the per-(part, supplier) and per-part minima are
    partial-aggregated integer cents, so the equality join-back is
    exact. Output keys on the pruned part class."""
    pdim = part.filter(F.col("p_size") == part_size) \
               .select("p_partkey", "p_name")
    sdim = (supplier
            .join(F.broadcast(nation),
                  supplier["s_nationkey"] == nation["n_nationkey"])
            .join(F.broadcast(region.filter(F.col("r_name") == region_name)),
                  nation["n_regionkey"] == region["r_regionkey"])
            .select("s_suppkey", "s_name", "n_name"))
    cents = ("CAST(ROUND(l_extendedprice * 100.0 / l_quantity) AS BIGINT)")
    quotes = (lineitem
              .join(F.broadcast(pdim),
                    lineitem["l_partkey"] == pdim["p_partkey"])
              .join(F.broadcast(sdim),
                    lineitem["l_suppkey"] == sdim["s_suppkey"])
              .groupBy("p_partkey", "p_name", "s_suppkey", "s_name",
                       "n_name")
              .agg(F.min(F.expr(cents)).alias("unit_cents")))
    best = (quotes.groupBy(F.col("p_partkey").alias("pk"))
            .agg(F.min("unit_cents").alias("best_cents")))
    return (quotes.join(F.broadcast(best),
                        (quotes["p_partkey"] == best["pk"])
                        & (quotes["unit_cents"] == best["best_cents"]))
            .select("p_partkey", "p_name", "s_suppkey", "s_name", "n_name",
                    (F.col("unit_cents") / F.lit(100.0)).alias("unit_price")))


def min_cost_supplier_oracle_sql(region_name: str = "ASIA",
                                 part_size: int = 10) -> str:
    cents = "CAST(ROUND(l_extendedprice * 100.0 / l_quantity) AS BIGINT)"
    return f"""
WITH quotes AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, n_name,
    MIN({cents}) AS unit_cents
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_size = {part_size} AND r_name = '{region_name}'
  GROUP BY 1, 2, 3, 4, 5)
SELECT p_partkey, p_name, s_suppkey, s_name, n_name,
  unit_cents / 100.0 AS unit_price
FROM quotes q
WHERE unit_cents = (SELECT MIN(unit_cents) FROM quotes q2
                    WHERE q2.p_partkey = q.p_partkey)"""


# --------------------------------------------------------------- Q12 (H26) ---

_Q12_START = "1996-01-01 00:00:00"
_Q12_END = "1997-01-01 00:00:00"


def priority_lateness(orders: DataFrame, lineitem: DataFrame,
                      start: str = _Q12_START, end: str = _Q12_END,
                      late_days: int = 60) -> DataFrame:
    """H26 — the TPC-H Q12 shape: per lateness class (this schema's
    stand-in for Q12's ship mode), how many line items belong to
    high- vs low-priority orders — the **two-way conditional count over
    one big-big join**, both CASE sums computed in the same aggregate
    pass.

    Scale shape: the ship-year filter prunes the lineitem scan; the
    co-keyed orders join carries only (orderkey, orderdate, priority);
    the rollup keys on 2 lateness classes."""
    late = (f"CASE WHEN l_shipdate > o_orderdate + INTERVAL {late_days} DAY"
            f" THEN 'LATE' ELSE 'ONTIME' END")
    high = ("CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
            "THEN 1 ELSE 0 END")
    li = lineitem.filter(F.expr(
        f"l_shipdate >= TIMESTAMP '{start}' "
        f"AND l_shipdate < TIMESTAMP '{end}'"))
    return (li.join(orders.select("o_orderkey", "o_orderdate",
                                  "o_orderpriority"),
                    li["l_orderkey"] == F.col("o_orderkey"))
            .groupBy(F.expr(late).alias("lateness"))
            .agg(F.sum(F.expr(high)).alias("high_line_count"),
                 F.sum(F.expr(f"1 - ({high})")).alias("low_line_count")))


def priority_lateness_oracle_sql(start: str = _Q12_START,
                                 end: str = _Q12_END,
                                 late_days: int = 60) -> str:
    high = ("CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
            "THEN 1 ELSE 0 END")
    return f"""
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL {late_days} DAY
       THEN 'LATE' ELSE 'ONTIME' END AS lateness,
  CAST(SUM({high}) AS BIGINT) AS high_line_count,
  CAST(SUM(1 - ({high})) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{start}'
  AND l_shipdate < TIMESTAMP '{end}'
GROUP BY 1"""
