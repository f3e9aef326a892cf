"""S1j — the UVFITS Python DataSource (sources/uvfits_source.py):
byte-range planning from the header alone, partition-count invariance,
and exact agreement with the established driver-side read-back."""

from __future__ import annotations

import numpy as np
import pytest

from birli_spark import pipeline
from birli_spark.sinks import uvfits
from birli_spark.sources import synthetic as syn
from birli_spark.sources.uvfits_source import (read_uvfits_header,
                                               register_uvfits_source)


@pytest.fixture(scope="module")
def uvfits_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("s1j") / "scan.uvfits")
    baked = pipeline.preprocess_baked(spark, sf_dir)
    rows = uvfits.uvfits_group_rows(
        baked, pipeline.AVG_TIME, pipeline.AVG_FREQ,
        syn.GPS_START, syn.INT_TIME_S).localCheckpoint(eager=True)
    n_chan = syn.NUM_CC * syn.NUM_FC // pipeline.AVG_FREQ
    uvfits.write_uvfits_distributed(
        rows, path, n_chan,
        jd_zero=uvfits.obs_jd_zero(syn.GPS_START)).count()
    return path, n_chan


def test_header_only_planning(uvfits_path):
    path, n_chan = uvfits_path
    header, hlen = read_uvfits_header(path)
    assert hlen % 2880 == 0
    assert int(header["NAXIS4"]) == n_chan
    assert int(header["PCOUNT"]) == 5
    assert int(header["GCOUNT"]) > 0


def test_scan_matches_driver_readback(spark, uvfits_path):
    path, n_chan = uvfits_path
    register_uvfits_source(spark)
    got = (spark.read.format("uvfits").option("groups_per_task", "8")
           .load(path).toPandas()
           .sort_values(["bl_code", "jd", "chan_out"])
           .reset_index(drop=True))
    want = uvfits.file_cells_frame(path, n_chan) \
        .sort_values(["bl_code", "jd", "chan_out"]).reset_index(drop=True)
    assert len(got) == len(want) > 0
    for c in want.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype == np.float64:
            assert (a.view(np.int64) == b.view(np.int64)).all(), c
        else:
            assert (a == b).all(), c


def test_partition_count_invariance(spark, uvfits_path):
    """1 partition vs many-partition plans read identical content —
    the byte-range math has no seam errors."""
    path, _ = uvfits_path
    register_uvfits_source(spark)
    one = (spark.read.format("uvfits").option("groups_per_task", "100000")
           .load(path))
    many = (spark.read.format("uvfits").option("groups_per_task", "3")
            .load(path))
    assert many.rdd.getNumPartitions() > one.rdd.getNumPartitions()
    key = ["bl_code", "jd", "chan_out"]
    a = one.toPandas().sort_values(key).reset_index(drop=True)
    b = many.toPandas().sort_values(key).reset_index(drop=True)
    assert a.equals(b)
