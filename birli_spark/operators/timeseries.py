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
