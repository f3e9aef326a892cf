"""Event-stream analytics over the ``events`` table: tumbling-window
aggregation and gap-based sessionization.

The batch forms here are the oracle-checked surface; the same windowed
aggregation runs incrementally under Structured Streaming in
:mod:`birli_spark.streaming.windows` (watermark + tumbling window), which
the reference — a finite batch pipeline — has no analogue of
(SURVEY.md §2.8 "Streaming: none").

Time axis: the source ``ts`` is BIGINT nanoseconds (corpus.load_events),
but the oracle's DuckDB TIMESTAMP carries only microseconds — so all
operators truncate to **integer microseconds** first (``ts div 1000``
== DuckDB ``epoch_us``) and every comparison/bucket stays exact integer
math on both engines. Group SUMs of doubles go through f32 demotion
(the order of a distributed SUM is unspecified in both engines).

Scale: both operators are single-shuffle — windowed agg hash-partitions
on (event_type, hour) with map-side partial aggregation; sessionization
hash-partitions on user_id and sorts within partitions (Spark's window
exec), the classic gaps-and-islands plan. Skewed users would need salting
only for pathological single-user streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from birli_spark.functions.complex import f32

US_PER_HOUR = 3_600_000_000
SESSION_GAP_US = 1_800_000_000  # 30 min

#: exact micro-epoch: Spark source is int64 nanos, DuckDB is a µs
#: timestamp — identical integers after truncation.
TS_US_SPARK = "(ts div 1000)"
TS_US_DUCK = "epoch_us(ts)"


def windowed_agg(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window per event_type: count, f32 sum and mean of
    ``value``. The flagship streaming-shaped groupBy."""
    return (events
            .groupBy(
                "event_type",
                F.expr(f"CAST(FLOOR({TS_US_SPARK} / {US_PER_HOUR}) * 3600"
                       f" AS BIGINT)").alias("hour_epoch"))
            .agg(F.count("*").alias("n_events"),
                 F.expr(f32("SUM(value)")).alias("sum_value"),
                 F.expr(f32("SUM(value) / COUNT(*)")).alias("avg_value")))


def windowed_agg_oracle_sql() -> str:
    return f"""
SELECT event_type,
  CAST(FLOOR({TS_US_DUCK} / {US_PER_HOUR}) * 3600 AS BIGINT) AS hour_epoch,
  COUNT(*) AS n_events,
  {f32('SUM(value)')} AS sum_value,
  {f32('SUM(value) / COUNT(*)')} AS avg_value
FROM events
GROUP BY 1, 2"""


def sessionize(events: DataFrame,
               gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Gap-based sessions per user (new session when > 30 min idle): the
    gaps-and-islands pattern — lag → boundary flag → running sum →
    per-session aggregate. Order ties broken by event_id so the island
    assignment is deterministic."""
    base = events.withColumn("ts_us", F.expr(TS_US_SPARK))
    w_user = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = (base
               .withColumn("prev_us", F.lag("ts_us").over(w_user))
               .withColumn(
                   "is_new",
                   F.expr(f"CAST(prev_us IS NULL OR ts_us - prev_us > {gap_us}"
                          f" AS INT)"))
               .withColumn("session_seq",
                           F.sum("is_new").over(
                               w_user.rowsBetween(Window.unboundedPreceding, 0))))
    return (flagged
            .groupBy("user_id", "session_seq")
            .agg(F.count("*").alias("n_events"),
                 F.min("ts_us").alias("start_us"),
                 F.max("ts_us").alias("end_us"),
                 F.expr(f32("SUM(value)")).alias("sum_value")))


def sessionize_native(events: DataFrame,
                      gap_us: int = SESSION_GAP_US) -> DataFrame:
    """E2b — the same gap sessions via Spark's **native**
    ``session_window`` operator (the built-in merging-window aggregate;
    on a stream it runs incrementally with watermark-evicted state,
    where the islands form of :func:`sessionize` cannot).

    Boundary alignment (verified empirically, tested below): Spark
    merges an event into the open session when its idle gap is
    ``<= gap`` and splits on ``> gap`` — exactly the islands-form
    boundary, so both share one oracle verbatim. Session numbering is
    restored with a per-user ``row_number`` over session start — a
    window over the (tiny) session table, not the events."""
    base = (events
            .withColumn("ts_us", F.expr(TS_US_SPARK))
            .withColumn("tt", F.expr("timestamp_micros(ts_us)")))
    per_session = (base
                   .groupBy("user_id",
                            F.session_window("tt", f"{gap_us} microseconds")
                            .alias("win"))
                   .agg(F.count("*").alias("n_events"),
                        F.min("ts_us").alias("start_us"),
                        F.max("ts_us").alias("end_us"),
                        F.expr(f32("SUM(value)")).alias("sum_value")))
    w = Window.partitionBy("user_id").orderBy("start_us")
    return (per_session
            .withColumn("session_seq",
                        F.row_number().over(w).cast("long"))
            .select("user_id", "session_seq", "n_events",
                    "start_us", "end_us", "sum_value"))


def top_users_salted(events: DataFrame, k: int = 10,
                     salt_n: int = 8) -> DataFrame:
    """Top-k users by event count/value via a **salted two-stage
    aggregation** — the skew pattern: stage 1 groups on (user, salt) so a
    pathological hot user spreads over ``salt_n`` reducers; stage 2
    merges the partials on user alone (tiny input). Results are
    identical to a direct groupBy — the salt only reshapes the shuffle.

    Salt must be deterministic for the oracle: ``event_id % salt_n``
    (production would use ``rand()``; any uniform assignment works since
    stage 2 re-merges)."""
    stage1 = (events
              .withColumn("salt", F.expr(f"event_id % {salt_n}"))
              .groupBy("user_id", "salt")
              .agg(F.count("*").alias("pn"),
                   F.sum("value").alias("pv")))
    merged = (stage1.groupBy("user_id")
              .agg(F.sum("pn").alias("n_events"),
                   F.expr(f32("SUM(pv)")).alias("sum_value")))
    w = Window.orderBy(F.desc("n_events"), F.asc("user_id"))
    return (merged.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("user_id", "n_events", "sum_value",
                    F.col("rank").cast("int").alias("rank")))


def top_users_oracle_sql(k: int = 10) -> str:
    """The direct (unsalted) form — identical results by construction
    (the salt only changes the physical shuffle, and the f32-demoted sum
    absorbs partial-order differences)."""
    return f"""
WITH agg AS (
  SELECT user_id, COUNT(*) AS n_events, {f32('SUM(value)')} AS sum_value
  FROM events GROUP BY user_id),
ranked AS (
  SELECT user_id, n_events, sum_value,
    ROW_NUMBER() OVER (ORDER BY n_events DESC, user_id ASC) AS rank
  FROM agg)
SELECT user_id, n_events, sum_value, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}"""


def sessionize_oracle_sql(gap_us: int = SESSION_GAP_US) -> str:
    return f"""
WITH flagged AS (
  SELECT user_id, event_id, value, {TS_US_DUCK} AS ts_us,
    CASE WHEN LAG({TS_US_DUCK}) OVER w IS NULL
           OR {TS_US_DUCK} - LAG({TS_US_DUCK}) OVER w > {gap_us}
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY {TS_US_DUCK}, event_id)),
islands AS (
  SELECT user_id, value, ts_us,
    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged)
SELECT user_id, session_seq, COUNT(*) AS n_events,
  MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
  {f32('SUM(value)')} AS sum_value
FROM islands
GROUP BY 1, 2"""


US_PER_DAY = 86_400_000_000


def event_rollup(events: DataFrame) -> DataFrame:
    """Hierarchical rollup — the OLAP reporting shape: per-(type, day)
    leaves, per-type subtotals, and the grand total from ONE pass.

    ``ROLLUP`` expands to grouping sets inside a single
    partial-aggregating shuffle (each map task emits partials for every
    level), so the three levels cost one aggregation, not three.
    Grouping columns are coalesced to sentinels and the ``grouping_id``
    bitmask is emitted, keeping the output NULL-free and the cross-engine
    hash deterministic."""
    day = F.expr(f"CAST(FLOOR({TS_US_SPARK} / {US_PER_DAY}) * 86400"
                 " AS BIGINT)")
    return (events.withColumn("day_epoch", day)
            .rollup("event_type", "day_epoch")
            .agg(F.count("*").alias("n_events"),
                 F.expr(f32("SUM(value)")).alias("sum_value"),
                 F.grouping_id().alias("gid"))
            .select(F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
                    F.coalesce("day_epoch", F.lit(-1)).alias("day_epoch"),
                    F.col("gid").cast("int").alias("gid"),
                    "n_events", "sum_value"))


def event_rollup_oracle_sql() -> str:
    return f"""
WITH base AS (
  SELECT event_type,
    CAST(FLOOR({TS_US_DUCK} / {US_PER_DAY}) * 86400 AS BIGINT) AS day_epoch,
    value
  FROM events)
SELECT COALESCE(event_type, 'ALL') AS event_type,
  COALESCE(day_epoch, -1) AS day_epoch,
  CAST(GROUPING(event_type, day_epoch) AS INT) AS gid,
  COUNT(*) AS n_events,
  {f32('SUM(value)')} AS sum_value
FROM base
GROUP BY ROLLUP(event_type, day_epoch)"""


BURST_WINDOW_US = 600_000_000  # ±10 min


def burst_counts(events: DataFrame,
                 window_us: int = BURST_WINDOW_US) -> DataFrame:
    """Per-event count of *other* events by the same user within
    ``±window_us`` — a **banded (range) self-join**, the burst/fraud
    detection shape the reference has no analogue of (SURVEY.md §2.8:
    "No theta/range/as-of joins exist in the reference").

    A naive inequality self-join is a per-user cross product (quadratic
    in the hottest user). Instead the band is bucketized: each probe row
    explodes into its bucket and the two adjacent buckets
    (``window_us``-wide), the join is a plain **equi-join** on
    (user_id, bucket) — hash-shuffled, AQE-splittable — and the exact
    ``|Δt| <= window_us`` predicate filters the candidates. Candidate
    fan-in per row is bounded by the user's events in a 3-bucket band,
    never the user's whole history. A final left join restores
    zero-neighbor events (absent from the candidate aggregate).
    """
    e = events.select("event_id", "user_id",
                      F.expr(TS_US_SPARK).alias("tu"))
    build = (e.select("event_id", "user_id", "tu")
             .withColumn("bkt", F.expr(f"tu div {window_us}")))
    probe = (e.select(F.col("event_id").alias("p_id"),
                      F.col("user_id").alias("p_user"),
                      F.col("tu").alias("p_tu"))
             .withColumn(
                 "bkt",
                 F.explode(F.expr(
                     f"array(p_tu div {window_us} - 1,"
                     f" p_tu div {window_us},"
                     f" p_tu div {window_us} + 1)"))))
    matched = (probe.join(
                   build,
                   (F.col("p_user") == F.col("user_id"))
                   & (probe.bkt == build.bkt),
                   "inner")
               .filter((F.col("p_id") != F.col("event_id"))
                       & (F.abs(F.col("p_tu") - F.col("tu"))
                          <= F.lit(window_us)))
               .groupBy("p_id")
               .agg(F.count("*").alias("nb")))
    return (e.join(matched, e.event_id == matched.p_id, "left")
            .select(e.event_id.alias("event_id"),
                    F.coalesce("nb", F.lit(0)).alias("n_burst")))


def burst_counts_oracle_sql(window_us: int = BURST_WINDOW_US) -> str:
    """Direct inequality self-join — correct at oracle scale; the engine
    side replaces it with the bucketed equi-join above."""
    return f"""
WITH e AS (SELECT event_id, user_id, {TS_US_DUCK} AS tu FROM events)
SELECT a.event_id AS event_id, COUNT(b.event_id) AS n_burst
FROM e a LEFT JOIN e b
  ON a.user_id = b.user_id AND a.event_id <> b.event_id
  AND abs(a.tu - b.tu) <= {window_us}
GROUP BY a.event_id"""


#: fixed pivot domain — a production pipeline pins this list (schema
#: stability); unbounded pivots need a distinct-scan first
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def daily_type_pivot(events: DataFrame,
                     types: tuple[str, ...] = EVENT_TYPES) -> DataFrame:
    """E12 — per-day event counts pivoted to one column per event type
    (the wide-format export shape for BI/feature tables).

    ``groupBy().pivot(values=...)`` with explicit values compiles to a
    single partial-aggregated hash aggregate of conditional counts — one
    fact shuffle, no second pass to discover the column domain. The
    oracle spells the same conditional aggregation (engine-agnostic
    PIVOT form)."""
    day = F.expr(f"CAST(FLOOR({TS_US_SPARK} / {US_PER_DAY}) * 86400"
                 " AS BIGINT)")
    return (events.withColumn("day_epoch", day)
            .groupBy("day_epoch")
            .pivot("event_type", list(types))
            .agg(F.count(F.lit(1)))
            .na.fill(0, list(types)))


def daily_type_pivot_oracle_sql(
        types: tuple[str, ...] = EVENT_TYPES) -> str:
    cols = ",\n  ".join(
        f"COUNT(*) FILTER (WHERE event_type = '{t}') AS \"{t}\""
        for t in types)
    return f"""
SELECT CAST(FLOOR({TS_US_DUCK} / {US_PER_DAY}) * 86400 AS BIGINT)
    AS day_epoch,
  {cols}
FROM events GROUP BY 1"""


def daily_type_unpivot(events: DataFrame,
                       types: tuple[str, ...] = EVENT_TYPES) -> DataFrame:
    """E13 — melt the wide pivot back to long form (day, type, count)
    via the native ``unpivot`` operator — the round-trip of E12,
    densified: zero-count (day, type) combinations are explicit rows,
    which the plain long-format aggregate never produces. Unpivot is a
    per-row expand (no shuffle beyond E12's aggregate)."""
    wide = daily_type_pivot(events, types)
    return wide.unpivot(
        ids=["day_epoch"], values=list(types),
        variableColumnName="event_type", valueColumnName="n_events")


def daily_type_unpivot_oracle_sql(
        types: tuple[str, ...] = EVENT_TYPES) -> str:
    cols = ", ".join(f'"{t}"' for t in types)
    return f"""
WITH wide AS ({daily_type_pivot_oracle_sql(types)})
SELECT day_epoch, event_type, n_events
FROM wide UNPIVOT INCLUDE NULLS (n_events FOR event_type IN ({cols}))"""


ATTR_WINDOW_US = US_PER_HOUR


def attribution_pairs(events: DataFrame,
                      window_us: int = ATTR_WINDOW_US) -> DataFrame:
    """E11 — bounded-interval attribution: every (click, view) pair by
    the same user with the view at most ``window_us`` before the click
    (inclusive). The *bounded* counterpart of the as-of join (E4): E4
    keeps the single latest view over an unbounded past, this keeps all
    views in a trailing window — the shape Structured Streaming's
    stream-stream join can execute incrementally (state is bounded by
    the window + watermark; see streaming/joins.py for the twin).

    Batch plan: same bucketized band equi-join as burst_counts — clicks
    probe their own and the previous ``window_us`` bucket, so the exact
    interval predicate only filters a 2-bucket candidate set, never a
    per-user cross product."""
    base = events.withColumn("tu", F.expr(TS_US_SPARK))
    clicks = (base.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("tu").alias("click_tu")))
    views = (base.filter(F.col("event_type") == "view")
             .select(F.col("user_id").alias("v_user"),
                     F.col("event_id").alias("view_id"),
                     F.col("tu").alias("view_tu"))
             .withColumn("bkt", F.expr(f"view_tu div {window_us}")))
    probe = clicks.withColumn(
        "bkt", F.explode(F.expr(
            f"array(click_tu div {window_us} - 1,"
            f" click_tu div {window_us})")))
    return (probe.join(views, (F.col("c_user") == F.col("v_user"))
                       & (probe.bkt == views.bkt))
            .filter((F.col("view_tu") >= F.col("click_tu") - window_us)
                    & (F.col("view_tu") <= F.col("click_tu")))
            .select(F.col("c_user").alias("user_id"),
                    "click_id", "click_tu", "view_id", "view_tu"))


def attribution_pairs_oracle_sql(window_us: int = ATTR_WINDOW_US) -> str:
    """Direct interval join — correct at oracle scale; the engine
    replaces it with the bucketed equi-join above."""
    return f"""
WITH e AS (
  SELECT event_id, user_id, event_type, {TS_US_DUCK} AS tu FROM events)
SELECT c.user_id, c.event_id AS click_id, c.tu AS click_tu,
  v.event_id AS view_id, v.tu AS view_tu
FROM e c JOIN e v
  ON c.event_type = 'click' AND v.event_type = 'view'
  AND c.user_id = v.user_id
  AND v.tu BETWEEN c.tu - {window_us} AND c.tu"""


def json_extract_stats(events: DataFrame) -> DataFrame:
    """Semi-structured extraction: pull ``$.k`` out of the JSON ``props``
    column and aggregate it per event type — the schema-on-read shape of
    real event pipelines (properties bags are never pre-parsed).

    ``get_json_object`` is a JVM-side expression (no UDF), so the parse
    fuses into the scan projection; the aggregate is one
    partial-aggregating shuffle on event_type. Integer sums keep the
    cross-engine hash exact; the mean goes through f32 demotion.
    """
    k = F.expr("CAST(get_json_object(props, '$.k') AS BIGINT)")
    return (events.withColumn("k", k)
            .groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum("k").alias("sum_k"),
                 F.min("k").alias("min_k"),
                 F.max("k").alias("max_k"),
                 F.expr(f32("CAST(SUM(CAST(get_json_object(props, '$.k')"
                            " AS BIGINT)) AS DOUBLE) / COUNT(*)"))
                  .alias("avg_k")))


def json_extract_stats_oracle_sql() -> str:
    return f"""
WITH e AS (
  SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events)
SELECT event_type, COUNT(*) AS n_events, CAST(SUM(k) AS BIGINT) AS sum_k,
  MIN(k) AS min_k, MAX(k) AS max_k,
  {f32('CAST(SUM(k) AS DOUBLE) / COUNT(*)')} AS avg_k
FROM e GROUP BY event_type"""


def trailing_burst_counts(events: DataFrame,
                          window_us: int = BURST_WINDOW_US) -> DataFrame:
    """Causal variant of :func:`burst_counts`: per event, the count of
    *preceding* same-user events within ``(t - window_us, t]`` — the
    form a streaming detector can compute incrementally
    (:mod:`birli_spark.streaming.burst` is the stateful twin).

    One window pass with a **RANGE frame** on the integer micro-epoch:
    partition by user, order by time, frame = ``window_us PRECEDING ..
    CURRENT ROW``. RANGE frames include timestamp peers symmetrically in
    both engines, so the count is frame-determined (no tie-order
    sensitivity); subtracting 1 removes the row itself.
    """
    return (events
            .select("event_id", "user_id", F.expr(TS_US_SPARK).alias("tu"))
            .withColumn(
                "n_trailing",
                F.count("*").over(
                    Window.partitionBy("user_id").orderBy("tu")
                    .rangeBetween(-window_us, 0)) - F.lit(1))
            .select("event_id", "n_trailing"))


def trailing_burst_oracle_sql(window_us: int = BURST_WINDOW_US) -> str:
    return f"""
WITH e AS (SELECT event_id, user_id, {TS_US_DUCK} AS tu FROM events)
SELECT event_id,
  COUNT(*) OVER (PARTITION BY user_id ORDER BY tu
                 RANGE BETWEEN {window_us} PRECEDING AND CURRENT ROW) - 1
    AS n_trailing
FROM e"""


#: ordered-funnel stages over event_type; a user "reaches" stage k when the
#: first occurrences of stages 1..k are monotonically non-decreasing in time
FUNNEL_STAGES = ("signup", "view", "click", "purchase")


def retention_cohorts(events: DataFrame) -> DataFrame:
    """E9 — classic cohort retention: cohort = each user's first active
    UTC day; count distinct users still active at each day offset.

    Plan: one shuffle on user_id collapsing the fact table to a per-user
    sorted day set (collect_set partial-aggregates map-side and is bounded
    by the calendar — days, not events), then explode + the final small
    aggregate (second shuffle). Each user contributes at most one row per
    (cohort, offset), so a plain COUNT(*) is the distinct-user count — no
    count-distinct expansion needed. Two shuffles total vs. the naive
    distinct → window → count-distinct chain's three.
    """
    day = f"CAST(FLOOR({TS_US_SPARK} / {US_PER_DAY}) AS BIGINT)"
    per_user = (events
                .select("user_id", F.expr(day).alias("day"))
                .groupBy("user_id")
                .agg(F.sort_array(F.collect_set("day")).alias("days")))
    return (per_user
            .select(F.col("days")[0].alias("cohort_day"),
                    F.explode("days").alias("day"))
            .groupBy("cohort_day",
                     F.expr("day - cohort_day").alias("day_offset"))
            .agg(F.count("*").alias("n_users")))


def retention_oracle_sql() -> str:
    return f"""
WITH days AS (
  SELECT DISTINCT user_id,
    CAST(FLOOR({TS_US_DUCK} / {US_PER_DAY}) AS BIGINT) AS day
  FROM events),
cohorted AS (
  SELECT user_id, day,
    MIN(day) OVER (PARTITION BY user_id) AS cohort_day
  FROM days)
SELECT cohort_day, day - cohort_day AS day_offset,
  COUNT(DISTINCT user_id) AS n_users
FROM cohorted GROUP BY 1, 2"""


def funnel(events: DataFrame) -> DataFrame:
    """E10 — ordered conversion funnel over ``FUNNEL_STAGES``: one
    conditional-min aggregate per user (single shuffle on user_id with
    map-side partials), then a driver-sized stack of per-stage counts.
    """
    mins = [F.min(F.when(F.col("event_type") == s,
                         F.expr(TS_US_SPARK))).alias(f"t{i}")
            for i, s in enumerate(FUNNEL_STAGES)]
    per_user = events.groupBy("user_id").agg(*mins)
    conds = []
    for i in range(len(FUNNEL_STAGES)):
        c = F.col("t0").isNotNull()
        for j in range(1, i + 1):
            c = c & (F.col(f"t{j}") >= F.col(f"t{j - 1}"))
        conds.append(c)
    counts = per_user.agg(*[
        F.sum(c.cast("long")).alias(f"n{i}") for i, c in enumerate(conds)])
    stack_args = ", ".join(
        f"{i + 1}, '{s}', n{i}" for i, s in enumerate(FUNNEL_STAGES))
    return counts.selectExpr(
        f"stack({len(FUNNEL_STAGES)}, {stack_args}) "
        f"AS (stage_idx, stage, n_users)")


def funnel_oracle_sql() -> str:
    mins = ",\n    ".join(
        f"MIN(CASE WHEN event_type = '{s}' THEN {TS_US_DUCK} END) AS t{i}"
        for i, s in enumerate(FUNNEL_STAGES))
    conds = []
    for i in range(len(FUNNEL_STAGES)):
        parts = ["t0 IS NOT NULL"] + [
            f"t{j} >= t{j - 1}" for j in range(1, i + 1)]
        conds.append(" AND ".join(parts))
    sums = ",\n    ".join(
        f"CAST(SUM(CASE WHEN {c} THEN 1 ELSE 0 END) AS BIGINT) AS n{i}"
        for i, c in enumerate(conds))
    rows = "\nUNION ALL\n".join(
        f"SELECT {i + 1} AS stage_idx, '{s}' AS stage, n{i} AS n_users "
        f"FROM counts" for i, s in enumerate(FUNNEL_STAGES))
    return f"""
WITH per_user AS (
  SELECT user_id,
    {mins}
  FROM events GROUP BY user_id),
counts AS (
  SELECT
    {sums}
  FROM per_user)
{rows}"""


# ------------------------------- grouping sets (E14, beyond ROLLUP/CUBE) ---

def type_dow_grouping_sets(events: DataFrame) -> DataFrame:
    """E14 — multi-level report via **explicit GROUPING SETS**:
    ``((event_type, dow), (event_type), (dow))`` — per-cell leaves plus
    BOTH one-dimension margins but no grand total, a set list neither
    ROLLUP (no (dow) margin) nor CUBE (adds the unwanted ()) expresses.
    Uses the native ``DataFrame.groupingSets`` API (Spark 4).

    Like E5 this is ONE partial-aggregating shuffle — each map task emits
    partials for every set — versus three separate aggregations + union.
    ``dow`` is integer epoch-day mod 7 (engine-agnostic; no locale-
    dependent dayofweek). Sentinel-coalesced keys + grouping_id keep the
    output NULL-free for deterministic cross-engine hashing."""
    dow = F.expr(f"CAST(FLOOR({TS_US_SPARK} / {US_PER_DAY}) % 7 AS INT)")
    base = events.withColumn("dow", dow)
    return (base
            .groupingSets([["event_type", "dow"], ["event_type"], ["dow"]],
                          "event_type", "dow")
            .agg(F.count("*").alias("n_events"),
                 F.expr(f32("SUM(value)")).alias("sum_value"),
                 F.grouping_id().alias("gid"))
            .select(F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
                    F.coalesce("dow", F.lit(-1)).alias("dow"),
                    F.col("gid").cast("int").alias("gid"),
                    "n_events", "sum_value"))


def type_dow_grouping_sets_oracle_sql() -> str:
    return f"""
WITH base AS (
  SELECT event_type,
    CAST(FLOOR({TS_US_DUCK} / {US_PER_DAY}) % 7 AS INT) AS dow,
    value
  FROM events)
SELECT COALESCE(event_type, 'ALL') AS event_type,
  COALESCE(dow, -1) AS dow,
  CAST(GROUPING(event_type, dow) AS INT) AS gid,
  COUNT(*) AS n_events,
  {f32('SUM(value)')} AS sum_value
FROM base
GROUP BY GROUPING SETS ((event_type, dow), (event_type), (dow))"""


def type_transitions(events: DataFrame) -> DataFrame:
    """E15 — user-journey Markov transitions: for each user's
    time-ordered event sequence, count (from_type → to_type) edges and
    attach the per-source-state total so downstream can normalize to
    transition probabilities (kept as exact integers here; one division
    client-side yields P(to|from)).

    Plan shape: one window (lag) partitioned by user — the only shuffle
    of event-grain rows — then a low-cardinality (type×type) aggregate
    that map-side combines to ≤ |types|² rows. The transition matrix of
    a 100 TB event log is KBs."""
    w = Window.partitionBy("user_id").orderBy(
        F.expr(TS_US_SPARK), F.col("event_id"))
    edges = (events
             .withColumn("from_type", F.lag("event_type").over(w))
             .filter(F.col("from_type").isNotNull())
             .groupBy("from_type", F.col("event_type").alias("to_type"))
             .agg(F.count("*").alias("n_edges")))
    totals = (edges.groupBy("from_type")
              .agg(F.sum("n_edges").alias("n_from")))
    return edges.join(F.broadcast(totals), "from_type")


def type_transitions_oracle_sql() -> str:
    return f"""
WITH seq AS (
  SELECT user_id, event_type,
    LAG(event_type) OVER (PARTITION BY user_id
                          ORDER BY {TS_US_DUCK}, event_id) AS from_type
  FROM events),
edges AS (
  SELECT from_type, event_type AS to_type, COUNT(*) AS n_edges
  FROM seq WHERE from_type IS NOT NULL
  GROUP BY from_type, event_type),
totals AS (
  SELECT from_type, CAST(SUM(n_edges) AS BIGINT) AS n_from
  FROM edges GROUP BY from_type)
SELECT e.from_type, e.to_type, e.n_edges, t.n_from
FROM edges e JOIN totals t USING (from_type)"""


EWMA_ALPHA = "0.125"  # 1/8 — exactly representable


def user_ewma(events: DataFrame) -> DataFrame:
    """E16 — per-user exponentially weighted moving average of event
    values, in event-time order: ``ewma ← α·v + (1−α)·ewma`` seeded with
    the first value.

    A recurrence can't be a window aggregate (each step needs the
    previous *result*), but it IS a sequential fold — so the per-user
    event list is assembled with one ``collect_list`` + ``array_sort``
    (struct order = (ts, event_id) = deterministic) and folded in one
    ``aggregate`` expression. Same fold, same IEEE ops in DuckDB's
    ``list_reduce`` ⇒ bit-identical, no f32 hedging needed.

    Scale: one shuffle on user_id; per-user state is that user's events
    (the same bound as any per-user window); the fold is JVM-side
    codegen, not a UDF. For unbounded per-user history you'd switch to
    the streaming twin shape (carry the EWMA as O(1) state)."""
    a = EWMA_ALPHA
    lst = ("array_sort(collect_list(struct(ts_us, event_id, "
           "CAST(value AS DOUBLE) AS v)))")
    fold = (f"aggregate(slice(evs, 2, size(evs) - 1), evs[0].v, "
            f"(acc, e) -> {a} * e.v + (1.0 - {a}) * acc)")
    return (events
            .selectExpr("user_id", "event_id", f"{TS_US_SPARK} AS ts_us",
                        "value")
            .groupBy("user_id")
            .agg(F.expr(lst).alias("evs"))
            .select("user_id",
                    F.expr("size(evs)").alias("n_events"),
                    F.expr("evs[0].v").alias("first_value"),
                    F.expr(f"CASE WHEN size(evs) = 1 THEN evs[0].v "
                           f"ELSE {fold} END").alias("ewma")))


def user_ewma_oracle_sql() -> str:
    a = EWMA_ALPHA
    return f"""
WITH ev AS (
  SELECT user_id, {TS_US_DUCK} AS ts_us, event_id,
    CAST(value AS DOUBLE) AS v
  FROM events),
grouped AS (
  SELECT user_id,
    list(v ORDER BY ts_us, event_id) AS vs
  FROM ev GROUP BY user_id)
SELECT user_id, CAST(len(vs) AS INT) AS n_events,
  vs[1] AS first_value,
  CASE WHEN len(vs) = 1 THEN vs[1]
       ELSE list_reduce(vs, (acc, v) -> {a} * v + (1.0 - {a}) * acc)
  END AS ewma
FROM grouped"""


US_PER_DAY = 86_400_000_000
ZSCORE_K = 3


def anomaly_days(events: DataFrame, k: int = ZSCORE_K) -> DataFrame:
    """E17 — per-user daily-volume anomaly detection: flag the days
    where a user's event count exceeds their own mean by more than
    ``k`` population standard deviations (the ops-dashboard "unusual
    activity" query, and the abuse-detection gate of an ingest
    pipeline).

    The z-score test runs entirely in integers: ``x > μ + kσ`` over
    per-day counts rearranges to ``(x·n − s) > 0 AND (x·n − s)² >
    k²·(n·s₂ − s²)`` with s = Σx, s₂ = Σx² — no float ever crosses the
    predicate, so the flag is hash-exact.

    Scale shape: groupBy(user, day) partial-aggregates the raw stream
    down to user-days; the stats window partitions by user over that
    already-reduced table (≤ days rows per user). One shuffle on
    user_id shared by both steps."""
    per_day = (events
               .selectExpr("user_id",
                           f"{TS_US_SPARK} div {US_PER_DAY} AS day")
               .groupBy("user_id", "day")
               .agg(F.count("*").alias("cnt")))
    w = Window.partitionBy("user_id")
    stats = (per_day
             .withColumn("n_days", F.count("*").over(w))
             .withColumn("s", F.sum("cnt").over(w))
             .withColumn("s2", F.sum(F.expr("cnt * cnt")).over(w)))
    return (stats
            .filter(F.expr(
                f"(cnt * n_days - s) > 0 AND "
                f"(cnt * n_days - s) * (cnt * n_days - s) > "
                f"{k * k} * (n_days * s2 - s * s)"))
            .select("user_id", "day", "cnt", "n_days", "s"))


def anomaly_days_oracle_sql(k: int = ZSCORE_K) -> str:
    return f"""
WITH per_day AS (
  SELECT user_id, {TS_US_DUCK} // {US_PER_DAY} AS day, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2),
stats AS (
  SELECT user_id, day, cnt,
    COUNT(*) OVER (PARTITION BY user_id) AS n_days,
    SUM(cnt) OVER (PARTITION BY user_id) AS s,
    SUM(cnt * cnt) OVER (PARTITION BY user_id) AS s2
  FROM per_day)
SELECT user_id, day, cnt, n_days, CAST(s AS BIGINT) AS s
FROM stats
WHERE (cnt * n_days - s) > 0
  AND (cnt * n_days - s) * (cnt * n_days - s) > {k * k} * (n_days * s2 - s * s)"""
