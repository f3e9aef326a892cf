"""Round-trip and semantic tests for the format edges: MWAOCAL binary
(S4), the flag sink + read-back (O3/S5), the pure-numpy UVFITS writer
(O1), picket-fence ranges (P5), and describe (O4)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from birli_spark import pipeline
from birli_spark.operators import describe, picket
from birli_spark.sinks import flagsink, uvfits
from birli_spark.sources import aocal
from birli_spark.sources import synthetic as syn


# ----------------------------------------------------------------- aocal ---

def test_mwaocal_roundtrip_exact(tmp_path):
    rng = np.random.default_rng(3)
    sols = rng.normal(size=(2, 3, 5, 8))
    path = str(tmp_path / "cal.bin")
    aocal.write_mwaocal(path, sols, start_gps=100.0, end_gps=200.0)
    got, times = aocal.read_mwaocal(path)
    assert got.shape == (2, 3, 5, 8)
    assert (got == sols).all()          # f64 bit-exact
    assert times == [100.0, 200.0]      # evenly spaced timeblock starts


def test_mwaocal_timestamp_reconstruction(tmp_path):
    path = str(tmp_path / "cal.bin")
    sols = np.zeros((3, 1, 1, 8))
    aocal.write_mwaocal(path, sols, start_gps=0.0, end_gps=0.0)
    assert aocal.read_mwaocal(path)[1] == []
    aocal.write_mwaocal(path, sols, start_gps=50.0, end_gps=150.0)
    assert aocal.read_mwaocal(path)[1] == [50.0, 100.0, 150.0]
    # single timeblock with distinct start/end: no div-by-zero, one start
    one = np.zeros((1, 1, 1, 8))
    aocal.write_mwaocal(path, one, start_gps=50.0, end_gps=150.0)
    assert aocal.read_mwaocal(path)[1] == [50.0]
    # (start absent, end present) is the reference's panic arm
    aocal.write_mwaocal(path, sols, start_gps=0.0, end_gps=150.0)
    with pytest.raises(ValueError, match="start GPS absent"):
        aocal.read_mwaocal(path)


def test_mwaocal_rejects_bad_magic(tmp_path):
    path = str(tmp_path / "bad.bin")
    with open(path, "wb") as f:
        f.write(b"NOTOCAL" + bytes(9) + bytes(32))
    with pytest.raises(ValueError, match="magic"):
        aocal.read_mwaocal(path)


def test_synthetic_calsols_match_sql_dim(spark, tmp_path):
    path = str(tmp_path / "cal.bin")
    aocal.write_synthetic_calsols(path, syn.NUM_ANTS, syn.NUM_CHAN_SOL)
    got = aocal.calsols_df(spark, path).orderBy("ant", "chan").toPandas()
    exp = (syn.load_dim(spark, "calsols").orderBy("ant", "chan").toPandas())
    assert (got.values == exp.values).all()


# -------------------------------------------------------------- flag sink ---

def test_flag_sink_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    out = str(tmp_path / "flagset")
    vis = pipeline.rule_flags(spark, syn.load_vis(spark, sf_dir))
    header = flagsink.write_flags(vis, out, obsid=42, gps_start=syn.GPS_START)
    assert header["OBSID"] == 42 and header["NSCANS"] == syn.NUM_T
    back = flagsink.read_flags(spark, out)
    assert back.count() == vis.count()
    # flag content identical
    a = vis.select(*flagsink.FLAG_COLS).orderBy(*flagsink.FLAG_COLS).toPandas()
    b = back.orderBy(*flagsink.FLAG_COLS).toPandas()
    assert (a.values == b.values).all()
    # partition pruning on cc: only requested partition rows return
    one = flagsink.read_flags(spark, out, coarse_chans=(1,))
    assert one.count() == vis.filter("cc = 1").count()
    assert one.select("cc").distinct().collect()[0].cc == 1
    # occupancy sidecars exist and cover every channel
    occ = flagsink.read_channel_occupancy(spark, out)
    assert occ.count() == syn.NUM_CC * syn.NUM_FC
    assert flagsink.read_header(out)["VERSION"] == flagsink.VERSION


def test_flag_sink_rowcount_validation(spark, sf_dir, tmp_path):
    vis = pipeline.rule_flags(spark, syn.load_vis(spark, sf_dir))
    with pytest.raises(ValueError, match="row count"):
        flagsink.write_flags(vis, str(tmp_path / "x"), validate_complete=True)


# ----------------------------------------------------------------- uvfits ---

def test_uvfits_binary_roundtrip(tmp_path):
    rng = np.random.default_rng(11)
    n_chan, n_groups = 6, 4
    groups = []
    for g in range(n_groups):
        data = rng.normal(size=(n_chan, 4, 3)).astype(np.float32)
        groups.append((0.1 * g, 0.2 * g, 0.3 * g, 256 * (g + 1) + 2,
                       2458766.5 + g, data))
    path = str(tmp_path / "out.uvfits")
    uvfits.write_uvfits(path, iter(groups), n_chan, n_groups)
    header, params, data = uvfits.read_uvfits(path)
    assert header["GROUPS"] is True and header["GCOUNT"] == n_groups
    assert header["PCOUNT"] == 5 and header["NAXIS4"] == n_chan
    for g in range(n_groups):
        u, v, w, bl, jd, d = groups[g]
        np.testing.assert_allclose(params[g, :3], [u, v, w], rtol=1e-7)
        assert params[g, 3] == bl
        np.testing.assert_allclose(data[g], d, rtol=1e-7)
    # file must be 2880-block aligned
    import os
    assert os.path.getsize(path) % 2880 == 0


def test_uvfits_group_rows_from_pipeline(spark, sf_dir, tmp_path):
    baked = pipeline.preprocess_baked(spark, sf_dir)
    rows = uvfits.uvfits_group_rows(
        baked, pipeline.AVG_TIME, pipeline.AVG_FREQ,
        syn.GPS_START, syn.INT_TIME_S)
    pdf = rows.orderBy("t_out", "bl", "chan_out").toPandas()
    assert (pdf.bl_code == 256 * (pdf.ant1 + 1) + pdf.ant2 + 1).all()
    # write the real file from the relational rows: group = (t_out, bl);
    # channels absent from a block become zero-weight cells (the missing-
    # data convention for a fixed-shape group cube)
    all_chans = sorted(pdf.chan_out.unique())
    n_chan = len(all_chans)
    groups = []
    for (_, _), grp in pdf.groupby(["t_out", "bl"]):
        grp = grp.set_index("chan_out").reindex(all_chans)
        data = np.stack(
            [np.stack([grp[f"{p}_re"].fillna(0.0), grp[f"{p}_im"].fillna(0.0),
                       grp["weight"].fillna(0.0)], axis=-1)
             for p in uvfits.UVFITS_POLS], axis=1)
        g0 = grp.dropna(subset=["bl_code"]).iloc[0]
        groups.append((g0.u, g0.v, g0.w, g0.bl_code, g0.jd, data))
    path = str(tmp_path / "pipe.uvfits")
    uvfits.write_uvfits(path, iter(groups), n_chan, len(groups))
    header, params, data = uvfits.read_uvfits(path)
    assert header["GCOUNT"] == len(groups)
    np.testing.assert_allclose(
        params[:, 3], [g[3] for g in groups], rtol=0)


# ----------------------------------------------------------------- picket ---

def test_parse_ranges():
    assert picket.parse_ranges("0,1-2") == [(0, 0), (1, 2)]
    assert picket.parse_ranges("5") == [(5, 5)]
    with pytest.raises(ValueError):
        picket.parse_ranges("2-1")
    with pytest.raises(ValueError):
        picket.parse_ranges("0-3,2-4")


def test_picket_partitions_by_range(spark, sf_dir):
    out = picket.run_picket(spark, sf_dir, "0,1-2")
    pdf = out.toPandas()
    # chan encodes cc: range 0 -> chans [0, NUM_FC); range 1 -> rest
    chans0 = pdf[pdf.range_id == 0].chan_out.unique() * pipeline.AVG_FREQ
    assert chans0.max() < syn.NUM_FC
    chans1 = pdf[pdf.range_id == 1].chan_out.unique() * pipeline.AVG_FREQ
    assert chans1.min() >= syn.NUM_FC
    # union of ranges == unrestricted pipeline
    full = pipeline.preprocess(spark, sf_dir).count()
    assert len(pdf) == full


# --------------------------------------------------------------- describe ---

def test_describe_stats(spark, sf_dir):
    vis = syn.load_vis(spark, sf_dir)
    got = {r.stat: r.value for r in describe.describe(spark, vis).collect()}
    assert got["n_timesteps"] == syn.NUM_T
    assert got["n_coarse_chans"] == syn.NUM_CC
    assert got["n_fine_chans"] == syn.NUM_CC * syn.NUM_FC
    assert got["n_rows"] == vis.count()
    assert got["est_vis_bytes"] == got["n_rows"] * describe.BYTES_PER_ROW

def test_uvfits_date_keeps_second_resolution(tmp_path):
    import numpy as np
    from birli_spark.sinks import uvfits
    # two groups 1 second apart near JD 2.44e6: raw f32 would collapse
    # them (0.25-day ULP); PZERO must preserve the separation
    jd0 = uvfits.GPS_EPOCH_JD + 12345.0 / 86400.0
    groups = [(0.0, 0.0, 0.0, 257, jd0 + i / 86400.0,
               np.zeros((2, 4, 3))) for i in range(2)]
    path = str(tmp_path / "date.uvfits")
    uvfits.write_uvfits(path, iter(groups), 2, 2)
    header, params, _ = uvfits.read_uvfits(path)
    dates = params[:, 4]
    assert abs((dates[1] - dates[0]) * 86400.0 - 1.0) < 1e-3
    assert abs(dates[0] - jd0) < 1e-4 / 86400.0 * 1e4  # absolute JD restored


def test_shard_export_roundtrip(spark, sf_dir, tmp_path):
    from birli_spark.sinks import shards
    from birli_spark.sources import corpus

    docs = corpus.load_documents(spark, sf_dir)
    manifest = shards.write_shards(docs, str(tmp_path / "ds"),
                                   shard_tokens=2000).toPandas()
    back = spark.read.parquet(str(tmp_path / "ds"))
    assert back.count() == docs.count()
    # every (source, shard) directory holds exactly its manifest count
    got = (back.groupBy("source", "shard").count().toPandas()
           .sort_values(["source", "shard"]).reset_index(drop=True))
    want = (manifest[["source", "shard", "n_docs"]]
            .sort_values(["source", "shard"]).reset_index(drop=True))
    assert (got["count"].values == want["n_docs"].values).all()
    # budget respected up to one document's overshoot
    assert (manifest.groupby("source")["n_tokens"].max() <= 4000).all()


def test_uvfits_distributed_writer_byte_identical(spark, sf_dir, tmp_path):
    """The executor-parallel pwrite writer (fixed-size group records at
    computed offsets) produces the byte-identical file the sequential
    toLocalIterator writer produces."""
    import numpy as np

    from birli_spark import pipeline
    from birli_spark.sinks import uvfits
    from birli_spark.sources import synthetic as syn

    baked = pipeline.preprocess_baked(spark, sf_dir)
    rows_df = uvfits.uvfits_group_rows(
        baked, pipeline.AVG_TIME, pipeline.AVG_FREQ,
        syn.GPS_START, syn.INT_TIME_S)

    rows = rows_df.orderBy("t_out", "bl", "chan_out").toPandas()
    all_chans = sorted(rows.chan_out.unique())
    groups = []
    for (_, _), grp in rows.groupby(["t_out", "bl"]):
        grp = grp.set_index("chan_out").reindex(all_chans)
        data = np.stack(
            [np.stack([grp[f"{p}_re"].fillna(0.0),
                       grp[f"{p}_im"].fillna(0.0),
                       grp["weight"].fillna(0.0)], axis=-1)
             for p in uvfits.UVFITS_POLS], axis=1)
        g0 = grp.dropna(subset=["bl_code"]).iloc[0]
        groups.append((g0.u, g0.v, g0.w, g0.bl_code, g0.jd, data))
    seq = str(tmp_path / "seq.uvfits")
    uvfits.write_uvfits(seq, iter(groups), len(all_chans), len(groups))

    par = str(tmp_path / "par.uvfits")
    summary = uvfits.write_uvfits_distributed(
        rows_df, par, len(all_chans)).toPandas()
    # per-t_out summary (the writer validates full gidx coverage
    # internally); totals must still account for every group
    assert int(summary.n_groups.sum()) == len(groups)
    assert int(summary.g_lo.min()) == 0
    assert int(summary.g_hi.max()) == len(groups) - 1

    a = open(seq, "rb").read()
    b = open(par, "rb").read()
    assert len(a) == len(b)
    assert a == b


def test_uvfits_file_rows_gate(spark, sf_dir, tmp_path):
    """O1b: the physical-file read-back relation matches the f32-demoted
    oracle row for row (the driver's hash-gate property) — certifying
    the BYTES, not just the pre-sink relation."""
    import duckdb

    import __spark_entry__ as entry

    sdf = entry.queries()["o1b_uvfits_file"](spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{sf_dir}/lineitem.parquet')")
    ddf = con.execute(entry.oracle_sql()["o1b_uvfits_file"]).df()
    key = sorted(sdf.columns)
    sdf = sdf.sort_values(key).reset_index(drop=True)
    ddf = ddf.sort_values(key).reset_index(drop=True)
    assert len(sdf) == len(ddf) > 0
    for c in sorted(sdf.columns):
        assert (sdf[c].to_numpy() == ddf[c].to_numpy()).all(), c


def test_uvfits_obs_anchored_date_resolution(spark, sf_dir, tmp_path):
    """Regression: with PZERO anchored at the OBS start (obs_jd_zero) —
    not the 1980 GPS epoch — every averaged output timestep survives the
    f32 DATE encoding distinctly (the epoch-anchored form collapsed all
    of them into ~84 s ulp bins)."""
    from birli_spark import pipeline
    from birli_spark.sinks import uvfits
    from birli_spark.sources import synthetic as syn

    baked = pipeline.preprocess_baked(spark, sf_dir)
    rows = uvfits.uvfits_group_rows(
        baked, pipeline.AVG_TIME, pipeline.AVG_FREQ,
        syn.GPS_START, syn.INT_TIME_S)
    n_t = rows.select("t_out").distinct().count()
    path = str(tmp_path / "obs_anchor.uvfits")
    out = uvfits.uvfits_file_rows(
        spark, rows, path, jd_zero=uvfits.obs_jd_zero(syn.GPS_START))
    assert out.select("jd").distinct().count() == n_t
