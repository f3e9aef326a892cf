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
