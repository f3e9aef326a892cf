"""Bit-packed .mwaf FITS format: template expansion, write/read
round-trip, occupancy HDU consistency, and bit-order correctness."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from birli_spark import pipeline
from birli_spark.sinks import mwaf
from birli_spark.sources import synthetic as syn


def test_template_expansion():
    assert mwaf.expand_template("Flagfile%%.mwaf", 3) == "Flagfile03.mwaf"
    assert mwaf.expand_template("F%%%.mwaf", 12, digits=3) == "F012.mwaf"
    with pytest.raises(ValueError):
        mwaf.expand_template("noperc.mwaf", 1)


def test_mwaf_roundtrip(spark, sf_dir, tmp_path):
    vis = pipeline.rule_flags(spark, syn.load_vis(spark, sf_dir))
    out = str(tmp_path / "mwaf")
    paths = mwaf.write_mwaf_set(vis, out, obsid=1254670392,
                                gps_start=syn.GPS_START)
    assert len(paths) == syn.NUM_CC
    assert paths[0].endswith("Flagfile00.mwaf")

    # primary header carries the reference's metadata fields
    primary, mat, ch_occ = mwaf.read_mwaf(paths[1])
    assert primary["VERSION"] == mwaf.VERSION
    assert primary["OBSID"] == 1254670392
    assert primary["NCHANS"] == syn.NUM_FC
    assert mat.shape == (primary["NSCANS"] * primary["NBL"], syn.NUM_FC)

    # CH_OCC counts equal column sums of the flag matrix
    assert (ch_occ["Count"].to_numpy() == mat.sum(axis=0)).all()
    np.testing.assert_allclose(
        ch_occ["Occupancy"], mat.sum(axis=0) / mat.shape[0])

    # full read-back equals the (OR-reduced) input flags at observed cells
    back = mwaf.read_mwaf_set(spark, out)
    cell = (vis.groupBy("t", "bl", "cc", "fc")
            .agg(F.max("flag").alias("flag")))
    joined = (cell.alias("a")
              .join(back.alias("b"), ["t", "bl", "cc", "fc"])
              .select(F.expr("a.flag = b.flag").alias("eq")))
    assert joined.filter(~F.col("eq")).count() == 0
    assert back.count() == (
        syn.NUM_CC * syn.NUM_FC
        * (int(cell.agg(F.max("t")).collect()[0][0]) + 1)
        * (int(cell.agg(F.max("bl")).collect()[0][0]) + 1))


def test_bit_packing_msb_first(spark, tmp_path):
    # single flagged cell at fc=0 must set the MSB of the first byte
    rows = [(0, 0, 0, f, f == 0) for f in range(8)]
    df = spark.createDataFrame(rows, ["t", "bl", "cc", "fc", "flag"])
    paths = mwaf.write_mwaf_set(df, str(tmp_path / "m"))
    with open(paths[0], "rb") as f:
        raw = f.read()
    _, mat, _ = mwaf.read_mwaf(paths[0])
    assert mat[0, 0] and not mat[0, 1:].any()
    # locate the FLAGS data unit: single row, one byte, value 0b10000000
    from birli_spark.sources import fitscore as fc_
    _, off = fc_.parse_header(raw)
    hdr, off = fc_.parse_header(raw, off)
    assert raw[off] == 0b10000000