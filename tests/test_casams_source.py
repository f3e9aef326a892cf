"""S1k — the casacore-MS Python DataSource (sources/casams_source.py):
table.dat-only planning, physical column pruning, partition-count
invariance, and exact agreement with the driver-side byte-gate
read-back."""

from __future__ import annotations

import numpy as np
import pytest

from birli_spark import pipeline
from birli_spark.sinks import ms_file
from birli_spark.sources import synthetic as syn
from birli_spark.sources.casams_source import (read_main_desc,
                                               register_casams_source)


@pytest.fixture(scope="module")
def ms_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("s1k") / "scan.ms")
    baked = pipeline.preprocess_baked(spark, sf_dir)
    ms_file.write_ms_casa(spark, baked, path, pipeline.AVG_TIME,
                          pipeline.AVG_FREQ, syn.GPS_START,
                          syn.INT_TIME_S)
    return path


def test_desc_only_planning(ms_path):
    nrow, metas = read_main_desc(ms_path)
    assert nrow > 0
    names = [m["name"] for m in metas]
    assert names[:2] == ["TIME", "TIME_CENTROID"]
    assert {"DATA", "UVW", "FLAG", "WEIGHT_SPECTRUM"} <= set(names)
    data = next(m for m in metas if m["name"] == "DATA")
    assert data["dtype"] == "complex" and len(data["shape"]) == 2


def test_scan_matches_driver_readback(spark, ms_path):
    register_casams_source(spark)
    got = (spark.read.format("casams").option("rows_per_task", "16")
           .load(ms_path).toPandas()
           .sort_values(["time_block", "antenna1", "antenna2", "chan"])
           .reset_index(drop=True))
    want = ms_file.main_cells_frame(ms_path) \
        .sort_values(["time_block", "antenna1", "antenna2", "chan"]) \
        .reset_index(drop=True)
    assert len(got) == len(want) > 0
    for c in want.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype == np.float64:
            assert (a.view(np.int64)
                    == b.astype(np.float64).view(np.int64)).all(), c
        else:
            assert (a == b.astype(a.dtype)).all(), c


def test_partition_count_invariance(spark, ms_path):
    register_casams_source(spark)
    one = (spark.read.format("casams").option("rows_per_task", "100000")
           .load(ms_path))
    many = (spark.read.format("casams").option("rows_per_task", "5")
            .load(ms_path))
    assert many.rdd.getNumPartitions() > one.rdd.getNumPartitions()
    key = ["time_block", "antenna1", "antenna2", "chan"]
    a = one.toPandas().sort_values(key).reset_index(drop=True)
    b = many.toPandas().sort_values(key).reset_index(drop=True)
    assert a.equals(b)
