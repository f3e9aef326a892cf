"""Time-series similarity search over per-user activity profiles — the
distributed-similarity-search family the retrieved OLAP literature
centers on (REPOSE ICDE'21, distributed data-series search VLDB'23),
re-expressed in this engine's banded-signature idiom.

Each user's event history collapses to a 24-dim hour-of-day profile
(integer value ticks). Shape similarity is compared on the **sign
pattern of scaled deviations** ``24·vₕ − total`` (an integer-exact
mean-centering: no division), giving a 24-bit signature; near-identical
usage shapes differ in ≤ ``max_ham`` bits, and with 6 bands of 4 bits
the pigeonhole guarantees every such pair shares a whole band — so
candidates come from a **band equi-join**, never a user×user product
(the same completeness bargain as the SimHash and pHash dedups).

Scale shape: profile build = one groupBy(user) with map-side partials
(24 integers of state per user); signatures are a projection; the band
join shuffles 6 small rows per user; verify is integer popcount.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SERIES_BITS = 24
SERIES_BANDS = 6
SERIES_BAND_BITS = 4
#: completeness bound: hamming < bands guarantees a shared 4-bit band
SERIES_MAX_HAM = 5
MIN_EVENTS = 5
_US_PER_HOUR = 3_600_000_000


def _profiles(events: DataFrame, min_events: int) -> DataFrame:
    """(user_id, n_events, sig, b0..b5): the 24-bit deviation-sign
    signature split into 6×4-bit bands, built from exact integer
    ticks."""
    hourly = (events
              .selectExpr("user_id",
                          f"CAST((ts div 1000) div {_US_PER_HOUR} % 24 "
                          f"AS INT) AS hod",
                          "CAST(ROUND(value * 100.0) AS BIGINT) AS ticks")
              .groupBy("user_id", "hod")
              .agg(F.sum("ticks").alias("v"), F.count("*").alias("n")))
    # dense 24-slot vector: hours with no events contribute 0 ticks
    dense = (hourly.groupBy("user_id")
             .agg(*[F.sum(F.expr(
                 f"CASE WHEN hod = {h} THEN v ELSE CAST(0 AS BIGINT) END"))
                 .alias(f"v{h}") for h in range(24)],
                 F.sum("n").alias("n_events"))
             .filter(F.col("n_events") >= min_events))
    tot = " + ".join(f"v{h}" for h in range(24))
    dense = dense.withColumn("tot", F.expr(tot))
    bits = [f"CAST(24 * v{h} - tot > 0 AS BIGINT)" for h in range(24)]
    sig = " + ".join(f"({b}) * {1 << h}" for h, b in enumerate(bits))
    dense = dense.withColumn("sig", F.expr(f"CAST({sig} AS BIGINT)"))
    for j in range(SERIES_BANDS):
        dense = dense.withColumn(
            f"b{j}", F.expr(
                f"CAST((sig DIV {1 << (SERIES_BAND_BITS * j)}) "
                f"% {1 << SERIES_BAND_BITS} AS INT)"))
    return dense.select("user_id", "n_events", "sig",
                        *[f"b{j}" for j in range(SERIES_BANDS)])


def series_neardup(events: DataFrame, max_ham: int = SERIES_MAX_HAM,
                   min_events: int = MIN_EVENTS) -> DataFrame:
    """TS1 — users with near-identical hour-of-day usage shapes:
    banded candidate equi-join over the deviation-sign signatures, then
    exact 24-bit Hamming verify."""
    from pyspark.storagelevel import StorageLevel
    sigs = _profiles(events, min_events).persist(
        StorageLevel.MEMORY_AND_DISK)
    bands = sigs.select(
        "user_id", "sig",
        F.posexplode(F.expr(
            f"array({', '.join(f'b{j}' for j in range(SERIES_BANDS))})"))
        .alias("j", "band"))
    return (bands.alias("a")
            .join(bands.alias("b"),
                  F.expr("a.j = b.j AND a.band = b.band "
                         "AND a.user_id < b.user_id"))
            .select(F.expr("a.user_id").alias("user_a"),
                    F.expr("b.user_id").alias("user_b"),
                    F.expr("CAST(bit_count(a.sig ^ b.sig) AS INT)")
                    .alias("hamming"))
            .filter(F.col("hamming") <= max_ham)
            .groupBy("user_a", "user_b")
            .agg(F.min("hamming").alias("hamming")))


def series_neardup_oracle_sql(max_ham: int = SERIES_MAX_HAM,
                              min_events: int = MIN_EVENTS) -> str:
    vcols = ", ".join(
        f"SUM(CASE WHEN hod = {h} THEN v ELSE CAST(0 AS BIGINT) END) AS v{h}"
        for h in range(24))
    tot = " + ".join(f"v{h}" for h in range(24))
    sig = " + ".join(
        f"CAST(24 * v{h} - tot > 0 AS BIGINT) * {1 << h}"
        for h in range(24))
    band_union = " UNION ALL ".join(
        f"SELECT user_id, {j} AS j, "
        f"CAST((sig // {1 << (SERIES_BAND_BITS * j)}) "
        f"% {1 << SERIES_BAND_BITS} AS INT) AS band, sig "
        f"FROM sigs" for j in range(SERIES_BANDS))
    return f"""
WITH hourly AS (
  SELECT user_id,
    CAST((epoch_us(ts) // {_US_PER_HOUR}) % 24 AS INT) AS hod,
    SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS v, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
dense AS (
  SELECT user_id, {vcols}, SUM(n) AS n_events
  FROM hourly GROUP BY user_id),
filt AS (SELECT * FROM dense WHERE n_events >= {min_events}),
witht AS (SELECT *, {tot} AS tot FROM filt),
sigs AS (SELECT user_id, CAST({sig} AS BIGINT) AS sig FROM witht),
bands AS ({band_union}),
cand AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b,
    CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
  FROM bands a JOIN bands b
    ON a.j = b.j AND a.band = b.band AND a.user_id < b.user_id)
SELECT user_a, user_b, MIN(hamming) AS hamming
FROM cand WHERE hamming <= {max_ham}
GROUP BY user_a, user_b"""


# ----------------------------------------------- TS2: banded DTW verify ---

DTW_BAND = 3
DTW_N = 24
_DTW_INF = 1 << 50


def _vectors(events: DataFrame, min_events: int) -> DataFrame:
    """(user_id, vec ARRAY<BIGINT>[24]): the dense hour-of-day tick
    profile the signatures are derived from."""
    hourly = (events
              .selectExpr("user_id",
                          f"CAST((ts div 1000) div {_US_PER_HOUR} % 24 "
                          f"AS INT) AS hod",
                          "CAST(ROUND(value * 100.0) AS BIGINT) AS ticks")
              .groupBy("user_id", "hod")
              .agg(F.sum("ticks").alias("v"), F.count("*").alias("n")))
    vcols = [F.sum(F.expr(
        f"CASE WHEN hod = {h} THEN v ELSE CAST(0 AS BIGINT) END"))
        .alias(f"v{h}") for h in range(DTW_N)]
    dense = (hourly.groupBy("user_id")
             .agg(*vcols, F.sum("n").alias("n_events"))
             .filter(F.col("n_events") >= min_events))
    arr = "array(" + ", ".join(f"v{h}" for h in range(DTW_N)) + ")"
    return dense.select("user_id", F.expr(arr).alias("vec"))


def _dtw_sql_spark(a: str, b: str, n: int = DTW_N,
                   r: int = DTW_BAND, inf: int = _DTW_INF) -> str:
    """Sakoe-Chiba-banded DTW as a pure Spark SQL expression: the outer
    fold iterates rows i = 1..n carrying the previous DP row (an
    ARRAY<BIGINT> of n+1 slots, slot 1 = the j=0 boundary); the inner
    fold appends D(i, j) left-to-right. Sequential DP entirely inside
    whole-stage codegen — no UDF, exact integers."""
    row0 = ("CAST(array(0" + f", {inf}" * n + ") AS ARRAY<BIGINT>)")
    cost = f"abs(element_at({a}, i) - element_at({b}, j))"
    cell = (f"CASE WHEN abs(i - j) > {r} THEN CAST({inf} AS BIGINT) "
            f"ELSE LEAST(CAST({inf} AS BIGINT), "
            f"  LEAST(element_at(prev, j + 1), element_at(prev, j), "
            f"        element_at(cur, j)) + {cost}) END")
    inner = (f"aggregate(sequence(1, {n}), "
             f"CAST(array({inf}) AS ARRAY<BIGINT>), "
             f"(cur, j) -> concat(cur, array({cell})))")
    outer = (f"aggregate(sequence(1, {n}), {row0}, "
             f"(prev, i) -> {inner})")
    return f"element_at({outer}, {n + 1})"


def dtw_pairs(events: DataFrame, max_ham: int = SERIES_MAX_HAM,
              min_events: int = MIN_EVENTS) -> DataFrame:
    """TS2 — exact banded Dynamic Time Warping over the TS1 candidate
    pairs: the signature band-join proposes near-shape users, DTW
    verifies with the real alignment distance (band ±3 hours — the
    shift tolerance the sign-signature can't measure). DTW is a
    sequential dynamic program Spark has no operator for; here it is a
    **nested higher-order fold** (SQL ``aggregate`` carrying the DP row
    as an array accumulator) — JVM-side codegen, no Python, and exact
    integer ticks so the recursive-CTE oracle matches bit-for-bit.

    Scale shape: vectors are one groupBy(user) (24 ints/user);
    candidates come from TS1's band equi-join (never user×user); the
    DP expression is O(n·band) per pair row. → (user_a, user_b,
    hamming, dtw_ticks, dtw)."""
    cand = series_neardup(events, max_ham, min_events)
    vecs = _vectors(events, min_events)
    va = vecs.select(F.col("user_id").alias("user_a"),
                     F.col("vec").alias("vec_a"))
    vb = vecs.select(F.col("user_id").alias("user_b"),
                     F.col("vec").alias("vec_b"))
    joined = cand.join(va, "user_a").join(vb, "user_b")
    return (joined
            .withColumn("dtw_ticks",
                        F.expr(_dtw_sql_spark("vec_a", "vec_b")))
            .select("user_a", "user_b", "hamming", "dtw_ticks",
                    (F.col("dtw_ticks") / F.lit(100.0)).alias("dtw")))


def dtw_pairs_oracle_sql(max_ham: int = SERIES_MAX_HAM,
                         min_events: int = MIN_EVENTS,
                         n: int = DTW_N, r: int = DTW_BAND,
                         inf: int = _DTW_INF) -> str:
    """Wavefront (anti-diagonal) DTW as a recursive CTE: every cell on
    wavefront k = i+j depends only on wavefronts k−1 and k−2, so the
    recursion carries two LIST-valued fronts per pair and advances with
    one list_transform — no intra-iteration dependence."""
    vcols = ", ".join(
        f"SUM(CASE WHEN hod = {h} THEN v ELSE CAST(0 AS BIGINT) END) AS v{h}"
        for h in range(n))
    arr = "[" + ", ".join(f"v{h}" for h in range(n)) + "]"
    ham_cte = series_neardup_oracle_sql(max_ham, min_events)
    # valid cell on wavefront k+1 at column j: i = k+1-j in [1, n], |i-j|<=r
    new_cell = (
        f"CASE WHEN (k + 1 - j) BETWEEN 1 AND {n} "
        f"     AND abs(k + 1 - 2 * j) <= {r} THEN "
        f"  LEAST(CAST({inf} AS BIGINT), "
        f"    LEAST(front[j], "
        f"          CASE WHEN j > 1 THEN front[j - 1] "
        f"               ELSE CAST({inf} AS BIGINT) END, "
        f"          CASE WHEN j > 1 THEN prev[j - 1] "
        f"               ELSE CAST({inf} AS BIGINT) END) "
        f"    + abs(a[k + 1 - j] - b[j])) "
        f"ELSE CAST({inf} AS BIGINT) END")
    front2 = (f"list_transform(range(1, {n + 1}), j -> "
              f"CASE WHEN j = 1 THEN CAST(abs(a[1] - b[1]) AS BIGINT) "
              f"ELSE CAST({inf} AS BIGINT) END)")
    inf_list = f"list_transform(range(1, {n + 1}), j -> CAST({inf} AS BIGINT))"
    return f"""
WITH RECURSIVE ham AS ({ham_cte}),
hourly2 AS (
  SELECT user_id,
    CAST((epoch_us(ts) // {_US_PER_HOUR}) % 24 AS INT) AS hod,
    SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS v, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
dense2 AS (
  SELECT user_id, {vcols}, SUM(n) AS n_events
  FROM hourly2 GROUP BY user_id),
vecs AS (SELECT user_id, {arr} AS vec FROM dense2
         WHERE n_events >= {min_events}),
pairs AS (
  SELECT h.user_a, h.user_b, h.hamming, va.vec AS a, vb.vec AS b
  FROM ham h
  JOIN vecs va ON h.user_a = va.user_id
  JOIN vecs vb ON h.user_b = vb.user_id),
dp(user_a, user_b, hamming, a, b, k, front, prev) AS (
  SELECT user_a, user_b, hamming, a, b, 2, {front2}, {inf_list}
  FROM pairs
  UNION ALL
  SELECT user_a, user_b, hamming, a, b, k + 1,
    list_transform(range(1, {n + 1}), j -> {new_cell}), front
  FROM dp WHERE k < {2 * n}),
final AS (SELECT * FROM dp WHERE k = {2 * n})
SELECT user_a, user_b, hamming,
  CAST(front[{n}] AS BIGINT) AS dtw_ticks,
  CAST(front[{n}] AS BIGINT) / 100.0 AS dtw
FROM final"""
