"""Data-quality operators over the fact tables — the profiling /
constraint-checking pass (the Deequ/Great-Expectations shape) every
large-scale ingest runs before training-data jobs trust a new drop,
plus a k-anonymity privacy risk check over quasi-identifier columns.

Scale shapes:

- **Q1 column profile**: ONE pass over the fact computes every
  column's non-null count, exact distinct count, and numeric min/max as
  a single wide aggregate row (Catalyst plans all aggregates into one
  partial+final hash aggregate — no per-column re-scan), then a tiny
  driver-free unpivot (stack) turns the 1×(4·ncols) row into the long
  profile table. COUNT(DISTINCT) over multiple columns expands via
  Spark's `expand` operator — ncols× row multiplication on the map
  side, still one shuffle of partial distinct sets.
- **Q2 k-anonymity**: groupBy the quasi-identifier tuple (map-side
  partials; group cardinality crosses the shuffle, not rows), then a
  one-row summary aggregate. The risky-group share is exact integer
  arithmetic, so the oracle hashes bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (column, is_numeric) — the lineitem profile contract
LINEITEM_PROFILE_COLS: tuple[tuple[str, bool], ...] = (
    ("l_orderkey", True), ("l_partkey", True), ("l_suppkey", True),
    ("l_linenumber", True), ("l_quantity", True), ("l_extendedprice", True),
    ("l_discount", True), ("l_tax", True), ("l_returnflag", False),
    ("l_linestatus", False),
)


def column_profile(df: DataFrame,
                   cols: tuple[tuple[str, bool], ...] = LINEITEM_PROFILE_COLS,
                   ) -> DataFrame:
    """Q1 — per-column profile: (col_name, n_nonnull, n_distinct,
    vmin, vmax, completeness_ppm). Numeric min/max are doubles; string
    columns profile min/max lexicographically into separate columns so
    no cross-engine float→string formatting is involved."""
    aggs = [F.count("*").alias("__n")]
    for c, _num in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
        ]
    for c, num in cols:
        if num:
            aggs += [F.min(F.col(c)).cast("double").alias(f"__mn_{c}"),
                     F.max(F.col(c)).cast("double").alias(f"__mx_{c}")]
        else:
            aggs += [F.min(F.col(c)).alias(f"__smn_{c}"),
                     F.max(F.col(c)).alias(f"__smx_{c}")]
    wide = df.agg(*aggs)
    rows = []
    for c, num in cols:
        mn = f"__mn_{c}" if num else "CAST(NULL AS DOUBLE)"
        mx = f"__mx_{c}" if num else "CAST(NULL AS DOUBLE)"
        smn = f"__smn_{c}" if not num else "CAST(NULL AS STRING)"
        smx = f"__smx_{c}" if not num else "CAST(NULL AS STRING)"
        rows.append(
            f"named_struct('col_name', '{c}', 'n_nonnull', __nn_{c}, "
            f"'n_distinct', __nd_{c}, 'vmin', {mn}, 'vmax', {mx}, "
            f"'svmin', {smn}, 'svmax', {smx}, 'completeness_ppm', "
            f"CAST(__nn_{c} * 1000000 AS BIGINT) DIV __n)")
    return (wide
            .select(F.explode(F.expr(
                "array(" + ", ".join(rows) + ")")).alias("p"))
            .select("p.col_name", "p.n_nonnull", "p.n_distinct", "p.vmin",
                    "p.vmax", "p.svmin", "p.svmax", "p.completeness_ppm"))


def column_profile_oracle_sql(
        table: str = "lineitem",
        cols: tuple[tuple[str, bool], ...] = LINEITEM_PROFILE_COLS) -> str:
    parts = []
    for c, num in cols:
        mn = f"CAST(MIN({c}) AS DOUBLE)" if num else "CAST(NULL AS DOUBLE)"
        mx = f"CAST(MAX({c}) AS DOUBLE)" if num else "CAST(NULL AS DOUBLE)"
        smn = f"MIN({c})" if not num else "CAST(NULL AS VARCHAR)"
        smx = f"MAX({c})" if not num else "CAST(NULL AS VARCHAR)"
        parts.append(f"""
SELECT '{c}' AS col_name,
  CAST(COUNT({c}) AS BIGINT) AS n_nonnull,
  CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
  {mn} AS vmin, {mx} AS vmax, {smn} AS svmin, {smx} AS svmax,
  CAST(COUNT({c}) * 1000000 // COUNT(*) AS BIGINT) AS completeness_ppm
FROM {table}""")
    return "\nUNION ALL\n".join(parts)


K_ANON_DEFAULT = 5


def k_anonymity(customer: DataFrame, k: int = K_ANON_DEFAULT) -> DataFrame:
    """Q2 — k-anonymity risk summary over the (nationkey, mktsegment)
    quasi-identifier: one row (k_threshold, n_groups, min_group_size,
    n_risky_groups, n_risky_rows, risky_row_ppm) — a release is
    k-anonymous iff ``n_risky_groups == 0``."""
    g = (customer.groupBy("c_nationkey", "c_mktsegment")
         .agg(F.count("*").alias("gsz")))
    return (g.agg(
        F.lit(k).alias("k_threshold"),
        F.count("*").alias("n_groups"),
        F.min("gsz").alias("min_group_size"),
        F.sum(F.expr(f"CAST(gsz < {k} AS BIGINT)")).alias("n_risky_groups"),
        F.sum(F.expr(f"IF(gsz < {k}, gsz, CAST(0 AS BIGINT))"))
        .alias("n_risky_rows"),
        F.expr(f"CAST(SUM(IF(gsz < {k}, gsz, CAST(0 AS BIGINT))) "
               f"* 1000000 AS BIGINT) DIV SUM(gsz)").alias("risky_row_ppm")))


def k_anonymity_oracle_sql(k: int = K_ANON_DEFAULT) -> str:
    return f"""
WITH g AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS gsz
  FROM customer GROUP BY 1, 2)
SELECT {k} AS k_threshold,
  CAST(COUNT(*) AS BIGINT) AS n_groups,
  CAST(MIN(gsz) AS BIGINT) AS min_group_size,
  CAST(SUM(CAST(gsz < {k} AS BIGINT)) AS BIGINT) AS n_risky_groups,
  CAST(SUM(CASE WHEN gsz < {k} THEN gsz ELSE 0 END) AS BIGINT)
    AS n_risky_rows,
  CAST(SUM(CASE WHEN gsz < {k} THEN gsz ELSE 0 END) * 1000000
       // SUM(gsz) AS BIGINT) AS risky_row_ppm
FROM g"""


# --------------------------- Q3: referential-integrity audit (Deequ-ish) ---


def referential_integrity(customer: DataFrame, orders: DataFrame,
                          lineitem: DataFrame) -> DataFrame:
    """Q3 — cross-table referential-integrity audit (the Deequ
    ``isContainedIn`` / constraint-suite shape): orphan counts along the
    fact chain — lineitems whose order is missing, orders whose customer
    is missing — plus childless parents (orders with no lineitem), in
    one unpivoted constraint report → (constraint, n_total, n_violations,
    violation_ppm).

    Scale shape: each check is an **anti join that ships only the
    parent's distinct key set** (AQE broadcasts when it fits); counts
    are map-side partial aggregates; the final report is 3 rows unioned.
    violation_ppm is an exact integer (violations·1e6 div total) so the
    report hashes identically cross-engine."""
    def check(name, child, key_col, parent_keys):
        viol = child.join(parent_keys, child[key_col] == parent_keys[
            parent_keys.columns[0]], "left_anti")
        return (child.agg(F.count("*").alias("n_total"))
                .crossJoin(viol.agg(F.count("*").alias("n_violations")))
                .select(F.lit(name).alias("constraint"), "n_total",
                        "n_violations",
                        F.expr("CAST(n_violations * 1000000 DIV n_total "
                               "AS BIGINT)").alias("violation_ppm")))
    checks = [
        check("lineitem.orderkey -> orders",
              lineitem.select("l_orderkey"), "l_orderkey",
              orders.select("o_orderkey")),
        check("orders.custkey -> customer",
              orders.select("o_custkey"), "o_custkey",
              customer.select("c_custkey")),
        check("orders without lineitems",
              orders.select("o_orderkey"), "o_orderkey",
              lineitem.select("l_orderkey")),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def referential_integrity_oracle_sql() -> str:
    return """
SELECT 'lineitem.orderkey -> orders' AS constraint,
  (SELECT COUNT(*) FROM lineitem) AS n_total,
  (SELECT COUNT(*) FROM lineitem
   WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
    AS n_violations,
  CAST((SELECT COUNT(*) FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
       * 1000000 // (SELECT COUNT(*) FROM lineitem) AS BIGINT)
    AS violation_ppm
UNION ALL
SELECT 'orders.custkey -> customer',
  (SELECT COUNT(*) FROM orders),
  (SELECT COUNT(*) FROM orders
   WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
  CAST((SELECT COUNT(*) FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
       * 1000000 // (SELECT COUNT(*) FROM orders) AS BIGINT)
UNION ALL
SELECT 'orders without lineitems',
  (SELECT COUNT(*) FROM orders),
  (SELECT COUNT(*) FROM orders
   WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)),
  CAST((SELECT COUNT(*) FROM orders
        WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem))
       * 1000000 // (SELECT COUNT(*) FROM orders) AS BIGINT)"""


# ---------------------------------------------------------------- Q4 ---

#: fixed-width drift histogram over events.value (literal range;
#: out-of-range values clamp into the edge buckets)
DRIFT_LO, DRIFT_HI, DRIFT_NBINS = 0.0, 500.0, 20


def _drift_core_sql(ts_us_expr: str, events: str = "events") -> str:
    """Q4 — distribution-drift detection between the time-halves of the
    events stream (the new-data-drop QA every training pipeline runs:
    has the feature distribution moved since the reference window?).

    The split point is the exact integer epoch midpoint (ts_us * 2
    compared against min+max — no division), the histogram is a
    fixed-width literal-range bucketing, and the drift statistic is the
    TOTAL-VARIATION distance computed entirely in BIGINT cross products
    (|a_i*B - b_i*A| summed, divided once at the end): exact in any
    association, so both engines hash identically. TV is used instead
    of PSI/KL deliberately — log() is libm-dependent across engines,
    |.| is not.

    Scale shape: one pass builds the per-(half, bucket) counts
    (map-side partials; only 2*nbins groups cross the shuffle), the
    totals and the TV fold over the nbins-row count relation (windows
    over a dim-sized relation), and the 1-row bounds aggregate
    broadcast-crosses the scan — the canonical decorrelated-scalar
    pattern. Fact rows are read once.
    """
    from birli_spark.functions.complex import f32

    width = (DRIFT_HI - DRIFT_LO) / DRIFT_NBINS
    bucket = (f"CAST(LEAST(GREATEST(FLOOR((value - {DRIFT_LO!r})"
              f" / {width!r}), 0), {DRIFT_NBINS - 1}) AS INT)")
    tv = f32(f"CAST(SUM(cross_abs) OVER () AS DOUBLE)"
             f" / (2.0 * CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE))")
    return f"""
WITH ev AS (SELECT value, {ts_us_expr} AS ts_us FROM {events}),
bounds AS (SELECT MIN(ts_us) AS mn, MAX(ts_us) AS mx FROM ev),
counts AS (
  SELECT {bucket} AS bucket,
         CAST(SUM(CASE WHEN ts_us * 2 < mn + mx THEN 1 ELSE 0 END)
              AS BIGINT) AS ref_cnt,
         CAST(SUM(CASE WHEN ts_us * 2 < mn + mx THEN 0 ELSE 1 END)
              AS BIGINT) AS cur_cnt
  FROM ev CROSS JOIN bounds GROUP BY 1),
tot AS (SELECT CAST(SUM(ref_cnt) AS BIGINT) AS ta,
               CAST(SUM(cur_cnt) AS BIGINT) AS tb FROM counts),
crossed AS (
  SELECT bucket, ref_cnt, cur_cnt, ta, tb,
         ABS(ref_cnt * tb - cur_cnt * ta) AS cross_abs
  FROM counts CROSS JOIN tot)
SELECT bucket, ref_cnt, cur_cnt, cross_abs,
       CASE WHEN ta > 0 AND tb > 0 THEN {tv}
            ELSE CAST(0.0 AS DOUBLE) END AS tv_distance
FROM crossed
"""


def distribution_drift(events: DataFrame) -> DataFrame:
    """Q4 on Spark: same text as the oracle with the Spark µs-epoch
    spelling (events carries int64-nano ``ts``)."""
    from birli_spark.operators.events import TS_US_SPARK
    events.createOrReplaceTempView("q4_events")
    return events.sparkSession.sql(
        _drift_core_sql(TS_US_SPARK, "q4_events"))


def distribution_drift_oracle_sql() -> str:
    from birli_spark.operators.events import TS_US_DUCK
    return _drift_core_sql(TS_US_DUCK, "events")
