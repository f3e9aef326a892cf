"""IM3 (beyond-reference) — per-baseline delay spectrum, the standard
frequency->delay analysis transform downstream of the reference's
output (EoR-style delay power spectra, Parsons et al. 2012, ApJ 756
165: the Fourier transform of each baseline's spectrum over the fine
channels; RFI and chromatic structure appear at characteristic
delays).

For each (t, baseline) the discrete transform over N fine channels is
``D(k) = sum_chan V(chan) * exp(-2*pi*i * k * chan / N)`` and the
reported quantity is the delay power ``|D(k)|^2`` per parallel-hand
polarization. Flagged channels contribute zero (the standard masked
transform).

Cross-engine exactness (the house integer-tick pattern, cf.
operators/rfi_sql.py): visibilities are quantized half-up to
``VT``-per-unit BIGINT ticks and the DFT coefficients to ``CT``-scaled
BIGINT literals in a (chan, k) VALUES dimension, so the transform's
accumulation is exact integer arithmetic in any association; the final
power is two deterministic float squarings + one division + the f32
demotion.

Spark shape: ONE broadcast join against the N^2-row coefficient
dimension (N = fine channels, dim-sized) followed by one partial+final
hash aggregation on (t, bl, k) — the join fans each row out N ways,
which is the transform's intrinsic cost; the map-side combine collapses
it back to (t x bl x N) output rows before the exchange. The
:func:`delay_spectrum_udf` island computes the identical integer
transform as one numpy int64 matmul per baseline group (the
O(N log N) FFT slot at 100 TB) and hash-matches the relational plan
EXACTLY — both share one DuckDB oracle.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from birli_spark.functions.complex import f32

#: visibility ticks per unit (half-up); |v| clamps at CLAMP_V first
VT = 1 << 10
#: coefficient ticks (cos/sin in [-1, 1] scale to +-CT)
CT = 1 << 11
#: clamp on |v| before quantization — keeps every windowed BIGINT sum
#: far below 2^63 even at N = 1024 channels
CLAMP_V = float(1 << 20)

#: the parallel-hand polarizations delay spectra are formed from
DELAY_POLS = ("xx", "yy")


def delay_coeffs(n_chan: int) -> list[tuple[int, int, int, int]]:
    """(chan, k, cre, cim) integer rows of the quantized DFT matrix —
    identical literals in the Spark dim and the DuckDB oracle."""
    out = []
    for k in range(n_chan):
        for chan in range(n_chan):
            ang = -2.0 * math.pi * k * chan / n_chan
            # half-up like every tick quantizer in the repo (and the
            # in-engine FLOOR(x + 0.5) spelling of delay_coeff_df)
            out.append((chan, k,
                        int(math.floor(CT * math.cos(ang) + 0.5)),
                        int(math.floor(CT * math.sin(ang) + 0.5))))
    return out


def delay_coeff_values_sql(n_chan: int) -> str:
    rows = ", ".join(f"({c}, {k}, {cre}, {cim})"
                     for c, k, cre, cim in delay_coeffs(n_chan))
    return (f"SELECT CAST(chan AS INT) AS chan, CAST(k AS INT) AS k,"
            f" CAST(cre AS BIGINT) AS cre, CAST(cim AS BIGINT) AS cim"
            f" FROM (VALUES {rows}) AS dft(chan, k, cre, cim)")


def _vq(col: str) -> str:
    """Half-up BIGINT tick quantization of a (flag-masked, clamped)
    visibility component."""
    clamped = (f"GREATEST(LEAST({col}, CAST({CLAMP_V!r} AS DOUBLE)),"
               f" CAST({-CLAMP_V!r} AS DOUBLE))")
    return (f"CASE WHEN flag THEN CAST(0 AS BIGINT) ELSE"
            f" CAST(FLOOR({clamped} * {VT} + 0.5) AS BIGINT) END")


def delay_fragments() -> dict[str, str]:
    """Aggregate fragments over the vis x coeff join (per (t, bl, k)).

    D_re = sum(vq_re*cre - vq_im*cim); D_im = sum(vq_re*cim + vq_im*cre)
    — exact BIGINT; power demotes once at the end.
    """
    scale = float(VT * VT) * float(CT * CT)
    aggs: dict[str, str] = {}
    for p in DELAY_POLS:
        dre = (f"SUM({_vq(f'{p}_re')} * cre - {_vq(f'{p}_im')} * cim)")
        dim = (f"SUM({_vq(f'{p}_re')} * cim + {_vq(f'{p}_im')} * cre)")
        aggs[f"{p}_pow"] = f32(
            f"(CAST({dre} AS DOUBLE) * CAST({dre} AS DOUBLE)"
            f" + CAST({dim} AS DOUBLE) * CAST({dim} AS DOUBLE))"
            f" / CAST({scale!r} AS DOUBLE)")
    aggs["n_used"] = ("CAST(SUM(CASE WHEN flag THEN 0 ELSE 1 END)"
                      " AS BIGINT)")
    return aggs


#: above this channel count the coefficient dim is generated in-engine
#: (spark.range + trig) instead of as a VALUES literal — a real MWA
#: band is 768-3072 fine channels, and an N^2 literal text would be
#: tens of MB of SQL. The in-engine ticks use the JVM's COS/SIN, which
#: can differ from Python's libm by an ulp at a rounding boundary; the
#: oracle-gated driver size (N=24) stays on the literal path, and at
#: production size the transform is not cross-engine-hash-gated anyway.
LITERAL_COEFF_MAX = 64


def delay_coeff_df(spark: SparkSession, n_chan: int):
    """The (chan, k, cre, cim) coefficient dim generated in-engine:
    N^2 rows from one spark.range — no driver-side literal text."""
    two_pi = 2.0 * math.pi
    return (spark.range(n_chan * n_chan)
            .selectExpr(
                f"CAST(id % {n_chan} AS INT) AS chan",
                f"CAST(id DIV {n_chan} AS INT) AS k",
                f"CAST(FLOOR(COS(-{two_pi!r} * (id DIV {n_chan})"
                f" * (id % {n_chan}) / {n_chan}) * {CT} + 0.5)"
                f" AS BIGINT) AS cre",
                f"CAST(FLOOR(SIN(-{two_pi!r} * (id DIV {n_chan})"
                f" * (id % {n_chan}) / {n_chan}) * {CT} + 0.5)"
                f" AS BIGINT) AS cim"))


def delay_spectrum(spark: SparkSession, vis: DataFrame,
                   n_chan: int) -> DataFrame:
    """IM3 relational: broadcast coefficient dim join + one
    partial+final aggregation; crosses only (imager convention)."""
    coeff = F.broadcast(
        spark.sql(delay_coeff_values_sql(n_chan))
        if n_chan <= LITERAL_COEFF_MAX
        else delay_coeff_df(spark, n_chan))
    aggs = delay_fragments()
    return (vis.filter(F.col("ant1") != F.col("ant2"))
            .join(coeff, "chan")
            .groupBy("t", "bl", "k")
            .agg(*(F.expr(frag).alias(name)
                   for name, frag in aggs.items())))


def delay_oracle_select(n_chan: int, vis: str = "vis") -> str:
    aggs = delay_fragments()
    agg_cols = ", ".join(f"{frag} AS {name}" for name, frag in aggs.items())
    return (f"SELECT v.t, v.bl, d.k, {agg_cols}"
            f" FROM {vis} v JOIN ({delay_coeff_values_sql(n_chan)}) d"
            f" ON v.chan = d.chan"
            f" WHERE v.ant1 <> v.ant2"
            f" GROUP BY v.t, v.bl, d.k")


def _round_half_up(v: np.ndarray) -> np.ndarray:
    return np.floor(v + 0.5).astype(np.int64)


def delay_spectrum_udf(vis: DataFrame, n_chan: int) -> DataFrame:
    """IM3b — the identical integer transform as a grouped numpy int64
    matmul per (t, baseline): the O(N log N)-slot UDF island for 100 TB
    (one image-forming shuffle; zero with baseline bucketing). Produces
    EXACTLY the rows of :func:`delay_spectrum` (same ticks, same BIGINT
    accumulation), so both share one oracle.

    Bit-exactness scope: the twin property is gated on the LITERAL
    coefficient path (n_chan <= LITERAL_COEFF_MAX, where both sides use
    Python-libm :func:`delay_coeffs`). Above the threshold the
    relational plan generates its ticks with the JVM's COS/SIN
    (:func:`delay_coeff_df`), which can differ from libm by one tick at
    a rounding boundary — there the twin is rows/shape-compatible but
    not guaranteed bit-identical (and at production size the island is
    the deployment path anyway)."""
    coeffs = np.array(delay_coeffs(n_chan), dtype=np.int64)
    cre = np.zeros((n_chan, n_chan), dtype=np.int64)
    cim = np.zeros((n_chan, n_chan), dtype=np.int64)
    cre[coeffs[:, 0], coeffs[:, 1]] = coeffs[:, 2]
    cim[coeffs[:, 0], coeffs[:, 1]] = coeffs[:, 3]
    scale = float(VT * VT) * float(CT * CT)

    def per_baseline(pdf: pd.DataFrame) -> pd.DataFrame:
        t = int(pdf["t"].iloc[0])
        bl = int(pdf["bl"].iloc[0])
        chans = pdf["chan"].to_numpy()
        flag = pdf["flag"].to_numpy(dtype=bool)
        out: dict = {"t": np.full(n_chan, t, dtype=np.int32),
                     "bl": np.full(n_chan, bl, dtype=np.int32),
                     "k": np.arange(n_chan, dtype=np.int32)}
        # dense per-chan tick vectors (duplicate (t,bl,chan) rows sum,
        # exactly like the SQL aggregation over the joined rows)
        for p in DELAY_POLS:
            vre = np.zeros(n_chan, dtype=np.int64)
            vim = np.zeros(n_chan, dtype=np.int64)
            re_t = _round_half_up(
                np.clip(pdf[f"{p}_re"].to_numpy(np.float64),
                        -CLAMP_V, CLAMP_V) * VT)
            im_t = _round_half_up(
                np.clip(pdf[f"{p}_im"].to_numpy(np.float64),
                        -CLAMP_V, CLAMP_V) * VT)
            np.add.at(vre, chans, np.where(flag, 0, re_t))
            np.add.at(vim, chans, np.where(flag, 0, im_t))
            dre = vre @ cre - vim @ cim
            dim = vre @ cim + vim @ cre
            out[f"{p}_pow"] = np.float64(np.float32(
                (dre.astype(np.float64) * dre.astype(np.float64)
                 + dim.astype(np.float64) * dim.astype(np.float64))
                / scale))
        # n_used per k equals the group's unflagged row count (each k
        # sees every source row once through the coefficient join)
        out["n_used"] = np.full(n_chan, int((~flag).sum()), dtype=np.int64)
        return pd.DataFrame(out)

    schema = ("t int, bl int, k int, xx_pow double, yy_pow double, "
              "n_used bigint")
    return (vis.filter(F.col("ant1") != F.col("ant2"))
            .groupBy("t", "bl")
            .applyInPandas(per_baseline, schema=schema))
