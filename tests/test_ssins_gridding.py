"""F11 SSINS incoherent noise spectra + IM1 uv gridding unit tests."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from birli_spark.operators import corrections, gridding, ssins
from birli_spark.operators.weights import bake_flags_into_weights
from birli_spark.sources import synthetic as syn


def _toy_vis(spark, rfi_t=None, rfi_chan=None, amp=50.0):
    """Dense 8t x 4chan x 6bl cube: static sky (value depends only on
    (chan, bl), so adjacent-time differences vanish) plus tiny
    deterministic per-t jitter, plus an optional RFI burst at one
    (t, chan) on every baseline."""
    rows = []
    for t in range(8):
        for chan in range(4):
            for a1 in range(3):
                for a2 in range(a1, 3):
                    sky = 1.0 + 0.1 * chan + 0.01 * (a1 * 3 + a2)
                    jitter = 0.001 * ((t * 7 + chan * 3 + a1 + a2) % 5)
                    v = sky + jitter
                    if t == rfi_t and chan == rfi_chan:
                        v += amp
                    rows.append({
                        "t": t, "chan": chan, "bl": a1 * 3 + a2,
                        "ant1": a1, "ant2": a2,
                        "freq_hz": 1.4e8 + chan * 4e4,
                        "weight": 8.0, "flag": False,
                        **{f"{p}_{c}": v + i * 0.001
                           for i, (p, c) in enumerate(
                               (p, c) for p in ("xx", "xy", "yx", "yy")
                               for c in ("re", "im"))},
                    })
    return spark.createDataFrame(rows)


def test_ssins_quiet_sky_unflagged(spark):
    out = ssins.ssins_spectra(_toy_vis(spark)).collect()
    # 7 differenced timesteps x 4 channels
    assert len(out) == 28
    assert all(not r.rfi_flag for r in out)
    assert all(r.n_bl == 6 for r in out)


def test_ssins_burst_detected_and_localised(spark):
    out = ssins.ssins_spectra(_toy_vis(spark, rfi_t=4, rfi_chan=2)).collect()
    flagged = {(r.t, r.chan) for r in out if r.rfi_flag}
    # the burst enters both differences that straddle t=4, only on chan 2
    assert flagged == {(4, 2), (5, 2)}
    z = {(r.t, r.chan): r.z_xx for r in out}
    assert z[(4, 2)] > 2.0 and z[(5, 2)] > 2.0


def test_ssins_flag_vis_disjunction(spark):
    vis = _toy_vis(spark, rfi_t=4, rfi_chan=2)
    flagged = ssins.ssins_flag_vis(vis)
    assert flagged.columns == vis.columns
    n = flagged.filter("flag").count()
    # 2 flagged (t, chan) cells x 6 baselines; no pre-existing flags
    assert n == 2 * 6


def test_uv_grid_weighted_mean_and_autos_excluded(spark):
    baked = bake_flags_into_weights(syn.load_vis(spark, "/root/testdata/sf0.001"))
    geom = corrections.correct_geometry(baked, syn.load_dim(spark, "part_uvw"))
    grid = gridding.uv_grid(geom)
    rows = grid.collect()
    assert rows and all(r.n_vis > 0 for r in rows)

    # hand-check one cell: weighted mean of the unflagged xx_re samples
    r0 = max(rows, key=lambda r: r.n_vis)
    cell = geom.filter(
        (F.col("ant1") != F.col("ant2"))
        & (F.expr(gridding._cell("u", gridding.DEFAULT_CELL_LAMBDA))
           == r0.u_cell)
        & (F.expr(gridding._cell("v", gridding.DEFAULT_CELL_LAMBDA))
           == r0.v_cell)
        & (F.col("chan") == r0.chan)
    ).select("xx_re", "weight").collect()
    pos = [(c.xx_re, c.weight) for c in cell if c.weight > 0]
    want = sum(x * w for x, w in pos) / sum(w for _, w in pos)
    assert math.isclose(r0.xx_re, want, rel_tol=1e-6)
    assert math.isclose(r0.grid_weight, sum(w for _, w in pos), rel_tol=1e-6)
    assert r0.n_vis == len(pos)


def test_pipeline_ssins_supersets_plain_flags(spark, sf_dir):
    from birli_spark import pipeline

    plain = pipeline.preprocess(spark, sf_dir)
    rfid = pipeline.preprocess(spark, sf_dir, ssins_rfi=True)
    assert rfid.columns == plain.columns
    # SSINS can only ADD flags: every output block keeps >= the plain
    # pipeline's flag, and cardinality is identical
    a = {tuple(r[k] for k in ("t_out", "chan_out", "bl")): r.flag
         for r in plain.collect()}
    b = {tuple(r[k] for k in ("t_out", "chan_out", "bl")): r.flag
         for r in rfid.collect()}
    assert set(a) == set(b)
    assert all(b[k] or not a[k] for k in a)


def test_uv_grid_drops_fully_flagged_cells(spark):
    vis = _toy_vis(spark).withColumn("flag", F.col("chan") == 3)
    baked = bake_flags_into_weights(vis)
    geom = baked.withColumn("u", F.col("ant1") * 30.0 - F.col("ant2") * 30.0) \
                .withColumn("v", F.col("ant1") * 10.0 - F.col("ant2") * 10.0)
    grid = gridding.uv_grid(geom)
    assert grid.filter("chan = 3").count() == 0
    assert grid.filter("chan < 3").count() > 0


def test_uv_grid_uniform_equal_contribution(spark):
    vis = _toy_vis(spark).withColumn(
        "weight", F.when(F.col("bl") == 1, 100.0).otherwise(8.0))
    baked = bake_flags_into_weights(vis)
    geom = baked.withColumn("u", F.col("ant1") * 30.0 - F.col("ant2") * 30.0) \
                .withColumn("v", F.col("ant1") * 10.0 - F.col("ant2") * 10.0)
    nat = {(r.chan, r.u_cell, r.v_cell): r.xx_re
           for r in gridding.uv_grid(geom).collect()}
    uni = {(r.chan, r.u_cell, r.v_cell): r.xx_re
           for r in gridding.uv_grid_uniform(geom).collect()}
    assert set(nat) == set(uni)
    # uniform weighting ignores the inflated bl=1 weight: in any cell
    # containing bl 1 plus others, the two weightings must differ
    mixed = geom.filter("ant1 <> ant2").groupBy(
        F.expr(gridding._cell("u", gridding.DEFAULT_CELL_LAMBDA)).alias("uc"),
        F.expr(gridding._cell("v", gridding.DEFAULT_CELL_LAMBDA)).alias("vc"),
        "chan").agg(
        F.countDistinct("bl").alias("nbl"),
        F.max((F.col("bl") == 1).cast("int")).alias("has1")).collect()
    diff_cells = [(r.chan, r.uc, r.vc) for r in mixed
                  if r.nbl > 1 and r.has1 == 1]
    assert diff_cells and any(
        abs(nat[c] - uni[c]) > 1e-9 for c in diff_cells)


def test_ssins_autos_burst_detected(spark):
    # burst enters the autos' power column at (t=4, chan=2). The toy's
    # 5-valued quantized jitter makes some clean channels' MAD tiny, so
    # a few low-z cells flag too (a fixture artifact real thermal noise
    # doesn't have) — the operator contract asserted here is that both
    # burst-straddling cells flag and dominate every other z by orders
    # of magnitude.
    out = ssins.ssins_autos(
        _toy_vis(spark, rfi_t=4, rfi_chan=2, amp=50.0)).collect()
    flagged = {(r.t, r.chan) for r in out if r.rfi_flag}
    assert {(4, 2), (5, 2)} <= flagged
    z = {(r.t, r.chan): abs(r.z_xx) for r in out}
    others = max(v for k, v in z.items() if k not in {(4, 2), (5, 2)})
    assert min(z[(4, 2)], z[(5, 2)]) > 1000 * others
    assert all(r.n_ant == 3 for r in out)   # 3 antennas' autos


def test_im4_dirty_image_fringe_semantics(spark):
    """A single uv cell with a real unit visibility produces the
    textbook fringe cos(2*pi*(u*l + v*m)/L) over the pixel grid — the
    real part of the inverse DFT of the gridded aperture (no Hermitian
    doubling: plane coverage is whatever the input carries)."""
    import math

    from birli_spark.operators import gridding as gr
    row = [(0, 2, 1, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 1.0, 2)]
    cols = ["chan", "u_cell", "v_cell", "xx_re", "xx_im", "xy_re",
            "xy_im", "yx_re", "yx_im", "yy_re", "yy_im", "grid_weight",
            "n_vis"]
    spark.createDataFrame(row, cols).createOrReplaceTempView("im4_t")
    img = {(r.lp, r.mp): r.img for r in
           spark.sql(gr.dirty_image_select("im4_t")).collect()}
    L = gr.IMG_L
    assert len(img) == L * L
    for (lp, mp), v in img.items():
        # stokes I = (xx + yy)/2 = 1.0 exactly
        want = math.cos(2.0 * math.pi * (2 * lp + 1 * mp) / L)
        assert abs(v - want) < 3.0 / gr.IMG_CT, ((lp, mp), v, want)


def test_im4_plan_shape(spark, sf_dir):
    """IM4's physical plan: the IM1 aggregation plus broadcast-only
    kernel joins — no sort-merge join; the transform never reshuffles
    the fact."""
    import __spark_entry__ as entry
    df = entry.queries()["im4_dirty_image"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    from birli_spark.operators import gridding as gr
    rows = {(r.lp, r.mp) for r in df.collect()}
    assert len(rows) == gr.IMG_L ** 2


def test_im5_psf_peak_at_origin(spark, sf_dir):
    """The PSF peaks at the image origin (all kernel phases align at
    l = m = 0, so the peak equals the summed grid weight within tick
    precision) and no pixel exceeds it."""
    import __spark_entry__ as entry
    pix = {(r.lp, r.mp): r.psf for r in
           entry.queries()["im5_psf_image"](spark, sf_dir).collect()}
    peak = pix[(0, 0)]
    assert peak > 0
    assert all(v <= peak + 1e-6 for v in pix.values())
