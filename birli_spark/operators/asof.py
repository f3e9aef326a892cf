"""As-of (point-in-time) join — the canonical event-attribution
operator Spark lacks natively (the reference has none either,
SURVEY.md §2.8; this is a north-star custom operator: "as-of join …
as a composition of existing DataFrame ops").

Semantics: for each left row, attach the **latest** right row of the
same key with ``right.ts <= left.ts`` (inclusive). Demo instance:
attribute each ``click`` event to the most recent preceding ``view`` by
the same user.

Two implementations with identical results:

- :func:`asof_join` — the **single-pass union trick**: tag both sides,
  union, and per key carry the last non-null right payload forward with
  an ordered window (`last(..., ignorenulls=True)` over rows unbounded
  preceding). One shuffle+sort on the key — the same plan shape as
  sessionization, no row explosion, scales to arbitrarily dense right
  sides (a bucketized equi-join would need a fallback probe for sparse
  buckets; the union trick has no such edge).
- :func:`asof_join_pandas` — grouped ``applyInPandas`` with
  ``pd.merge_asof`` per key (the UDF-island fallback shape for
  semantics the window form cannot express, e.g. nearest-in-time or
  tolerance bounds).

Right rows are pre-aggregated to one per (key, ts) (max event id), so
ties are deterministic and the DuckDB ``ASOF LEFT JOIN`` oracle matches
exactly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from birli_spark.operators.events import TS_US_DUCK, TS_US_SPARK


def _sides(events: DataFrame, left_type: str, right_type: str):
    base = events.withColumn("ts_us", F.expr(TS_US_SPARK))
    left = (base.filter(F.col("event_type") == left_type)
            .select("user_id", "event_id", "ts_us", "value"))
    right = (base.filter(F.col("event_type") == right_type)
             .groupBy("user_id", "ts_us")
             .agg(F.max("event_id").alias("r_event_id")))
    return left, right


def asof_join(events: DataFrame, left_type: str = "click",
              right_type: str = "view") -> DataFrame:
    """Union-trick as-of join (single shuffle on user_id)."""
    left, right = _sides(events, left_type, right_type)
    l_tag = left.select(
        "user_id", "ts_us", "event_id", "value",
        F.lit(None).cast("long").alias("r_event_id"),
        F.lit(None).cast("long").alias("r_ts_us"),
        F.lit(1).alias("is_left"))
    r_tag = right.select(
        "user_id", "ts_us",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
        "r_event_id",
        F.col("ts_us").alias("r_ts_us"),
        F.lit(0).alias("is_left"))
    # right rows sort before left at equal ts (is_left ASC) -> inclusive <=
    w = (Window.partitionBy("user_id")
         .orderBy("ts_us", "is_left", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    u = l_tag.unionByName(r_tag)
    carried = (u
               .withColumn("view_event_id",
                           F.last("r_event_id", ignorenulls=True).over(w))
               .withColumn("view_ts_us",
                           F.last("r_ts_us", ignorenulls=True).over(w)))
    return (carried.filter(F.col("is_left") == 1)
            .select("user_id", "event_id", "ts_us", "value",
                    "view_event_id", "view_ts_us"))


def asof_join_pandas(events: DataFrame, left_type: str = "click",
                     right_type: str = "view") -> DataFrame:
    """merge_asof grouped variant — same results, UDF-island shape."""
    left, right = _sides(events, left_type, right_type)
    joined_schema = ("user_id long, event_id long, ts_us long, value double, "
                     "view_event_id long, view_ts_us long")
    l_tag = left.withColumn("side", F.lit("l"))
    r_tag = right.select(
        "user_id", "ts_us", "r_event_id").withColumn("side", F.lit("r"))
    both = l_tag.unionByName(r_tag, allowMissingColumns=True)

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        l = (pdf[pdf["side"] == "l"]
             [["user_id", "event_id", "ts_us", "value"]]
             .sort_values(["ts_us", "event_id"]))
        r = (pdf[pdf["side"] == "r"][["ts_us", "r_event_id"]]
             .sort_values("ts_us")
             .rename(columns={"ts_us": "view_ts_us",
                              "r_event_id": "view_event_id"}))
        if not len(l):
            return pd.DataFrame(
                columns=["user_id", "event_id", "ts_us", "value",
                         "view_event_id", "view_ts_us"])
        out = pd.merge_asof(l, r, left_on="ts_us", right_on="view_ts_us",
                            direction="backward", allow_exact_matches=True)
        return out[["user_id", "event_id", "ts_us", "value",
                    "view_event_id", "view_ts_us"]]

    return both.groupBy("user_id").applyInPandas(per_user, joined_schema)


def asof_oracle_sql(left_type: str = "click",
                    right_type: str = "view") -> str:
    """DuckDB's native ASOF LEFT JOIN — an independent implementation of
    the same semantics (inclusive backward match)."""
    return f"""
WITH l AS (
  SELECT user_id, event_id, {TS_US_DUCK} AS ts_us, value
  FROM events WHERE event_type = '{left_type}'),
r AS (
  SELECT user_id, {TS_US_DUCK} AS ts_us, MAX(event_id) AS view_event_id
  FROM events WHERE event_type = '{right_type}' GROUP BY 1, 2)
SELECT l.user_id, l.event_id, l.ts_us, l.value,
  r.view_event_id, r.ts_us AS view_ts_us
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_us >= r.ts_us"""