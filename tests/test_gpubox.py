"""Distributed FITS gpubox source: fixture round-trip, value lineage
(coordinate-encoded cells), baseline ordering, and missing-HDU handling."""

from __future__ import annotations

import numpy as np
import pytest

from birli_spark.sources import gpubox

N_ANTS, N_FINE, N_TS, N_CC = 4, 8, 4, 2


@pytest.fixture(scope="module")
def gpubox_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("gpubox")
    for cc in range(N_CC):
        gpubox.write_gpubox(str(d / f"gpubox_{cc:02d}.fits"), cc, N_ANTS,
                            N_FINE, N_TS, obsid=1297526432)
    return str(d)


def test_baseline_order_upper_triangular():
    pairs = gpubox.baseline_pairs(3)
    assert pairs == [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]


def test_scan_shape_and_lineage(spark, gpubox_dir):
    df = gpubox.read_gpubox(spark, gpubox_dir + "/*.fits")
    n_bl = len(gpubox.baseline_pairs(N_ANTS))
    pdf = df.toPandas()
    assert len(pdf) == N_TS * N_CC * n_bl * N_FINE
    # every cell decodes back to its own coordinates (reference
    # tests/data/README.md fixture design)
    for r in pdf.sample(50, random_state=1).itertuples():
        assert r.xx_re == gpubox.encoded_value(r.t, r.bl, r.chan, 0)
        assert r.yy_im == gpubox.encoded_value(r.t, r.bl, r.chan, 7)
        assert r.chan == r.cc * N_FINE + r.fc
    # f32-exact values survive the f32->f64 promotion
    assert (pdf.xx_re == pdf.xx_re.astype(np.float32).astype(np.float64)).all()


def test_scan_matches_closed_form_oracle(spark, gpubox_dir):
    import duckdb
    df = gpubox.read_gpubox(spark, gpubox_dir + "/*.fits")
    got = df.toPandas().sort_values(
        ["t", "bl", "chan"], ignore_index=True)
    exp = duckdb.sql(gpubox.expected_grid_sql(
        N_CC, N_ANTS, N_FINE, N_TS)).df().sort_values(
        ["t", "bl", "chan"], ignore_index=True)
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    assert (got.values == exp.values).all()


def test_missing_hdu_detectable(spark, tmp_path):
    path = str(tmp_path / "gap.fits")
    gpubox.write_gpubox(path, 0, N_ANTS, N_FINE, N_TS, skip_timesteps=(2,))
    df = gpubox.read_gpubox(spark, path)
    ts = sorted(r.t for r in df.select("t").distinct().collect())
    assert ts == [0, 1, 3]  # flag_missing_slabs (S2) fills the gap downstream

def test_python_datasource_matches_mapinpandas(spark, gpubox_dir):
    """spark.read.format("gpubox") — the registered Python DataSource —
    must produce exactly the binaryFile+mapInPandas scan's rows, with
    one input partition per file."""
    gpubox.register_gpubox_source(spark)
    via_ds = (spark.read.format("gpubox")
              .load(gpubox_dir + "/*.fits"))
    assert via_ds.rdd.getNumPartitions() == N_CC
    a = (via_ds.orderBy("cc", "t", "bl", "fc").toPandas())
    b = (gpubox.read_gpubox(spark, gpubox_dir + "/*.fits")
         .orderBy("cc", "t", "bl", "fc").toPandas())
    assert a.equals(b.astype(a.dtypes.to_dict()))
