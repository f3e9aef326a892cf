"""CDC / table-maintenance shapes — MERGE-style upsert and an SCD2
(slowly-changing-dimension) history build, expressed as plain
DataFrame plans (the rewrite Delta/Iceberg's MERGE INTO lowers to; this
engine targets vanilla parquet, so the rewrite IS the operator).

Scale notes:

- :func:`upsert_documents` — MERGE = one **full outer co-keyed join**
  of base vs updates; at 100 TB both sides shuffle on the key unless
  the base is bucketed on it (the same co-location argument as H1), and
  engines like Delta prune untouched files first — here the updates
  side is derived, so the join is the honest cost. Row-level action
  tags (update/insert/keep) make the result auditable.
- :func:`scd2_user_type` — SCD2 = sessionized history: consecutive
  same-value runs collapse via the gaps-and-islands window, each run
  becoming one versioned row with ``valid_from/valid_to`` (open runs
  get NULL valid_to). One shuffle on the entity key; windows never see
  more than one entity's rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from birli_spark.operators.events import TS_US_DUCK, TS_US_SPARK

#: deterministic synthetic CDC batch: every 7th doc changes, every 13th
#: spawns a brand-new doc id above the base range
UPD_MOD = 7
INS_MOD = 13
INS_OFFSET = 100_000


def _updates(docs: DataFrame) -> DataFrame:
    changed = (docs.filter(F.expr(f"doc_id % {UPD_MOD} = 0"))
               .select("doc_id", F.expr("upper(text)").alias("text"),
                       "lang", "source"))
    inserted = (docs.filter(F.expr(f"doc_id % {INS_MOD} = 0"))
                .select((F.col("doc_id") + INS_OFFSET).alias("doc_id"),
                        F.expr("concat('new ', text)").alias("text"),
                        "lang", "source"))
    return changed.union(inserted)


def upsert_documents(docs: DataFrame) -> DataFrame:
    """M1 — MERGE INTO as a full outer join: update matched rows,
    insert unmatched update rows, keep the rest; every output row tags
    its action. Text rides as md5 so the audit table stays narrow."""
    base = docs.select("doc_id", "text", "lang", "source")
    upd = _updates(docs)
    b, u = base.alias("b"), upd.alias("u")
    j = b.join(u, F.expr("b.doc_id = u.doc_id"), "full_outer")
    return (j.select(
        F.expr("COALESCE(u.doc_id, b.doc_id)").alias("doc_id"),
        F.expr("CASE WHEN u.doc_id IS NULL THEN 'keep' "
               "WHEN b.doc_id IS NULL THEN 'insert' "
               "ELSE 'update' END").alias("action"),
        F.expr("md5(COALESCE(u.text, b.text))").alias("text_md5"),
        F.expr("length(COALESCE(u.text, b.text))").alias("n_chars"),
        F.expr("COALESCE(u.source, b.source)").alias("source")))


def upsert_documents_oracle_sql() -> str:
    return f"""
WITH upd AS (
  SELECT doc_id, upper(text) AS text, lang, source FROM documents
  WHERE doc_id % {UPD_MOD} = 0
  UNION ALL
  SELECT doc_id + {INS_OFFSET} AS doc_id, 'new ' || text AS text,
    lang, source
  FROM documents WHERE doc_id % {INS_MOD} = 0)
SELECT COALESCE(u.doc_id, b.doc_id) AS doc_id,
  CASE WHEN u.doc_id IS NULL THEN 'keep'
       WHEN b.doc_id IS NULL THEN 'insert'
       ELSE 'update' END AS action,
  md5(COALESCE(u.text, b.text)) AS text_md5,
  length(COALESCE(u.text, b.text)) AS n_chars,
  COALESCE(u.source, b.source) AS source
FROM documents b FULL OUTER JOIN upd u ON b.doc_id = u.doc_id"""


def scd2_user_type(events: DataFrame) -> DataFrame:
    """M2 — SCD2 history of each user's event type: consecutive
    same-type events collapse into one versioned validity interval
    (gaps-and-islands); the latest interval stays open (NULL
    valid_to)."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    base = (events
            .selectExpr("user_id", "event_id", "event_type",
                        f"{TS_US_SPARK} AS ts_us")
            .withColumn("prev_type", F.lag("event_type").over(w))
            .withColumn("is_new", F.expr(
                "CAST(prev_type IS NULL "
                "OR prev_type <> event_type AS INT)"))
            .withColumn("version", F.sum("is_new").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    runs = (base.groupBy("user_id", "version")
            .agg(F.min_by("event_type", "ts_us").alias("event_type"),
                 F.min("ts_us").alias("valid_from"),
                 F.count("*").alias("n_events")))
    w2 = Window.partitionBy("user_id").orderBy("version")
    return (runs
            .withColumn("valid_to", F.lead("valid_from").over(w2))
            .select("user_id", F.col("version").cast("int").alias("version"),
                    "event_type", "valid_from", "valid_to", "n_events"))


def scd2_user_type_oracle_sql() -> str:
    return f"""
WITH base AS (
  SELECT user_id, event_id, event_type, {TS_US_DUCK} AS ts_us,
    LAG(event_type) OVER w AS prev_type,
    CAST(LAG(event_type) OVER w IS NULL
         OR LAG(event_type) OVER w <> event_type AS INT) AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY {TS_US_DUCK}, event_id)),
vers AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id
                              ORDER BY ts_us, event_id) AS version
  FROM base),
runs AS (
  SELECT user_id, version,
    MIN_BY(event_type, ts_us) AS event_type,
    MIN(ts_us) AS valid_from, COUNT(*) AS n_events
  FROM vers GROUP BY user_id, version)
SELECT user_id, CAST(version AS INT) AS version, event_type,
  valid_from,
  LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version)
    AS valid_to,
  n_events
FROM runs"""


# ------------------------------------------------- snapshot diff (M3) ---

#: deterministic "later snapshot": every 11th doc deleted, every 7th
#: doc's text rewritten, every 13th doc spawning a new id above the base
DEL_MOD = 11


def _snapshot_b(docs: DataFrame) -> DataFrame:
    kept = docs.filter(F.expr(f"doc_id % {DEL_MOD} <> 0"))
    mutated = kept.select(
        "doc_id",
        F.expr(f"CASE WHEN doc_id % {UPD_MOD} = 0 THEN upper(text) "
               f"ELSE text END").alias("text"),
        "lang", "source")
    inserted = (docs.filter(F.expr(f"doc_id % {INS_MOD} = 0"))
                .select((F.col("doc_id") + INS_OFFSET).alias("doc_id"),
                        F.expr("concat('new ', text)").alias("text"),
                        "lang", "source"))
    return mutated.union(inserted)


def _snapshot_b_sql() -> str:
    return f"""
  SELECT doc_id,
    CASE WHEN doc_id % {UPD_MOD} = 0 THEN upper(text) ELSE text END AS text,
    lang, source
  FROM documents WHERE doc_id % {DEL_MOD} <> 0
  UNION ALL
  SELECT doc_id + {INS_OFFSET} AS doc_id, 'new ' || text AS text,
    lang, source
  FROM documents WHERE doc_id % {INS_MOD} = 0"""


def snapshot_diff(docs: DataFrame) -> DataFrame:
    """M3 — snapshot reconciliation: diff two table states by key +
    content hash and roll the row-level actions (added / removed /
    changed / unchanged) up to a per-source audit summary with exact
    char-count deltas — the "what changed between yesterday's and
    today's crawl" report.

    Scale shape: one full outer co-keyed join (bucket the snapshots on
    doc_id to co-locate it); only (doc_id, md5, n_chars, source) cross
    the shuffle — text never moves. The rollup output is
    |sources|×|actions| rows."""
    a = docs.select("doc_id", F.md5("text").alias("h_a"),
                    F.expr("length(text)").alias("c_a"), "source")
    b = _snapshot_b(docs).select(
        "doc_id", F.md5("text").alias("h_b"),
        F.expr("length(text)").alias("c_b"),
        F.col("source").alias("source_b"))
    j = a.join(b, "doc_id", "full_outer")
    tagged = j.select(
        F.expr("COALESCE(source, source_b)").alias("source"),
        F.expr("CASE WHEN h_a IS NULL THEN 'added' "
               "WHEN h_b IS NULL THEN 'removed' "
               "WHEN h_a <> h_b THEN 'changed' "
               "ELSE 'unchanged' END").alias("action"),
        F.expr("COALESCE(c_b, 0) - COALESCE(c_a, 0)").alias("chars_delta"))
    return (tagged.groupBy("source", "action")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("chars_delta").alias("chars_delta")))


def snapshot_diff_oracle_sql() -> str:
    return f"""
WITH b AS ({_snapshot_b_sql()}),
tagged AS (
  SELECT COALESCE(a.source, b.source) AS source,
    CASE WHEN a.doc_id IS NULL THEN 'added'
         WHEN b.doc_id IS NULL THEN 'removed'
         WHEN md5(a.text) <> md5(b.text) THEN 'changed'
         ELSE 'unchanged' END AS action,
    COALESCE(length(b.text), 0) - COALESCE(length(a.text), 0)
      AS chars_delta
  FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
SELECT source, action, COUNT(*) AS n_docs,
  CAST(SUM(chars_delta) AS BIGINT) AS chars_delta
FROM tagged GROUP BY source, action"""


#: events at/after this instant form the "delta" batch of M4
#: (2024-01-25 00:00:00 UTC as exact epoch microseconds — the repo's
#: integer event-time convention, operators/events.py)
INCR_CUTOFF_US = 1_706_140_800_000_000


def incremental_daily_agg(events: DataFrame,
                          cutoff_us: int = INCR_CUTOFF_US) -> DataFrame:
    """M4 — incremental materialized-view maintenance: the per-(day,
    event_type) aggregate table is kept up to date by merging a **delta
    batch** (events at/after ``cutoff``) into the previously
    materialized base aggregate, instead of recomputing from all
    history. → (day, event_type, n_events, sum_value_cents, refreshed)
    where ``refreshed`` marks groups the delta touched.

    Scale shape: the base aggregate is group-cardinality-sized (days ×
    types — tiny next to the event log); the delta aggregate scans ONLY
    the delta partition (the cutoff predicate prunes the scan); the
    merge is a full outer join on the group key between two
    aggregate-sized tables. At 100 TB this is the difference between
    re-reading years of history per refresh and touching one day's
    partition. Counts/sums are **additive**, so the merge is the
    mergeable-aggregate shape — union the two partial-aggregate tables
    and re-aggregate — which needs NO join at all (a full-outer join of
    the partials would force a sort-merge plan, since Spark cannot
    broadcast full-outer sides); exact cent ticks and integer day
    epochs keep it order-proof."""
    from birli_spark.operators.events import TS_US_SPARK, US_PER_DAY
    day = (f"CAST(FLOOR(({TS_US_SPARK}) / {US_PER_DAY}) * 86400"
           " AS BIGINT)")
    cents = "CAST(ROUND(value * 100.0) AS BIGINT)"

    def agg(df, is_delta):
        return (df.groupBy(F.expr(day).alias("day_epoch"), "event_type")
                .agg(F.count("*").alias("n"),
                     F.sum(F.expr(cents)).alias("cents"))
                .withColumn("is_delta", F.lit(is_delta)))

    us = TS_US_SPARK
    base = agg(events.filter(F.expr(f"({us}) < {cutoff_us}")), False)
    delta = agg(events.filter(F.expr(f"({us}) >= {cutoff_us}")), True)
    return (base.unionByName(delta)
            .groupBy("day_epoch", "event_type")
            .agg(F.sum("n").alias("n_events"),
                 F.sum("cents").alias("sum_value_cents"),
                 F.max("is_delta").alias("refreshed")))


def incremental_daily_agg_oracle_sql(cutoff_us: int = INCR_CUTOFF_US) -> str:
    from birli_spark.operators.events import TS_US_DUCK, US_PER_DAY
    day = (f"CAST(FLOOR(({TS_US_DUCK}) / {US_PER_DAY}) * 86400"
           " AS BIGINT)")
    cents = "CAST(ROUND(value * 100.0) AS BIGINT)"
    return f"""
WITH full_agg AS (
  SELECT {day} AS day_epoch, event_type,
    CAST(COUNT(*) AS BIGINT) AS n_events,
    CAST(SUM({cents}) AS BIGINT) AS sum_value_cents
  FROM events GROUP BY 1, 2),
dirty AS (
  SELECT DISTINCT {day} AS day_epoch, event_type
  FROM events WHERE {TS_US_DUCK} >= {cutoff_us})
SELECT f.day_epoch, f.event_type, f.n_events, f.sum_value_cents,
  d.day_epoch IS NOT NULL AS refreshed
FROM full_agg f LEFT JOIN dirty d
  ON f.day_epoch = d.day_epoch AND f.event_type = d.event_type"""


# ------------------------------------- M5: small-file compaction plan ---

COMPACT_TARGET_ROWS = 400


def compaction_plan(events: DataFrame,
                    target_rows: int = COMPACT_TARGET_ROWS) -> DataFrame:
    """M5 — small-file compaction planning (the OPTIMIZE/rewrite step
    every lakehouse table needs at 100 TB): treat each event day as one
    data file of its month partition, and assign files to compaction
    bins of ~``target_rows`` rows by running-total bucketing in day
    order — the distributed first-fit approximation (exact bin packing
    is inherently sequential; cumsum-div is the standard scalable
    relaxation, same recurrence as sequence packing t24).
    → (month as yyyymm, bin, n_files, n_rows, first_day,
    last_day); day is the
    epoch-day index (the repo's cross-engine timestamp convention).

    Scale shape: the file manifest aggregate is one partial-combined
    groupBy(day) over the scan — manifest cardinality (files, not rows)
    crosses the shuffle; the cumsum window partitions by **month**, so
    no global ordering exists anywhere; the bin rollup keys on the tiny
    manifest. A real deployment feeds the same plan from the table's
    file metadata instead of a scan."""
    from pyspark.sql import Window

    # month from the epoch-day through DATE arithmetic — DATE has no
    # timezone, so the bucketing is identical whatever the session tz
    # (the oracle runs in a separate engine and the driver's session
    # timezone is not ours to control)
    day_us = "CAST(FLOOR((ts div 1000) / 86400000000) AS BIGINT)"
    dt = f"date_add(DATE '1970-01-01', CAST({day_us} AS INT))"
    manifest = (events
                .groupBy(
                    F.expr(f"CAST(year({dt}) * 100 + month({dt}) AS INT)")
                    .alias("month"),
                    F.expr(day_us).alias("day"))
                .agg(F.count("*").alias("n_rows")))
    w = (Window.partitionBy("month").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    binned = manifest.withColumn(
        "bin", F.expr(f"CAST(floor((SUM(n_rows) OVER (PARTITION BY month "
                      f"ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND "
                      f"CURRENT ROW) - 1) / {target_rows}) AS INT)"))
    _ = w  # documented window shape; SQL window above is the same frame
    return (binned.groupBy("month", "bin")
            .agg(F.count("*").alias("n_files"),
                 F.sum("n_rows").alias("n_rows"),
                 F.min("day").alias("first_day"),
                 F.max("day").alias("last_day")))


def compaction_plan_oracle_sql(
        target_rows: int = COMPACT_TARGET_ROWS) -> str:
    return f"""
WITH manifest AS (
  SELECT CAST(year(DATE '1970-01-01'
             + CAST(CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT)
                    AS INT)) * 100 +
           month(DATE '1970-01-01'
             + CAST(CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT)
                    AS INT)) AS INT) AS month,
    CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
    COUNT(*) AS n_rows
  FROM events GROUP BY 1, 2),
binned AS (
  SELECT month, day, n_rows,
    CAST(floor((SUM(n_rows) OVER (PARTITION BY month ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
               / {target_rows}) AS INT) AS bin
  FROM manifest)
SELECT month, bin, COUNT(*) AS n_files,
  CAST(SUM(n_rows) AS BIGINT) AS n_rows,
  MIN(day) AS first_day, MAX(day) AS last_day
FROM binned GROUP BY month, bin"""
