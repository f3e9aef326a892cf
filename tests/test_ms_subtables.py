"""O2b gates: the full MS v2 relational model (sinks/ms_subtables.py) —
directory write/read roundtrip and spec sanity of the subtable set the
reference emits via marlu/casacore (src/io/mod.rs:542-595)."""

from __future__ import annotations

import numpy as np
import pytest

from birli_spark import pipeline
from birli_spark.sinks import ms_subtables as MS


def test_subtable_set_matches_ms_v2():
    sqls = MS.subtable_sqls()
    assert set(sqls) == {
        "ANTENNA", "SPECTRAL_WINDOW", "POLARIZATION", "DATA_DESCRIPTION",
        "FIELD", "FEED", "STATE", "PROCESSOR", "OBSERVATION", "HISTORY"}


def test_roundtrip_ms_dir(spark, sf_dir, tmp_path):
    out = str(tmp_path / "obs.ms")
    baked = pipeline.preprocess_baked(spark, sf_dir)
    MS.write_ms_dir(spark, baked, out, pipeline.AVG_TIME,
                    pipeline.AVG_FREQ,
                    gps_start=1254670392.0, int_time_s=2.0)
    tabs = MS.read_ms_dir(spark, out)
    assert set(tabs) == set(MS.subtable_sqls()) | {"MAIN"}

    main = tabs["MAIN"]
    assert main.count() > 0
    assert {"time_mjd_s", "antenna1", "antenna2", "uvw_u", "flag",
            "weight"} <= set(main.columns)

    ant = tabs["ANTENNA"].toPandas()
    # 4 synthetic antennas x 3 ITRF position components
    assert len(ant) == 12
    assert set(ant.antenna_id) == {0, 1, 2, 3}
    # positions land near the MWA ITRF origin
    assert (np.abs(ant.position_m.to_numpy()) < 6e6).all()
    pos0 = ant[ant.antenna_id == 0].sort_values("pos_idx")
    r = np.linalg.norm(pos0.position_m.to_numpy())
    assert 6.36e6 < r < 6.38e6          # on the Earth ellipsoid

    spw = tabs["SPECTRAL_WINDOW"].toPandas().sort_values("chan_idx")
    assert len(spw) == spw.num_chan.iloc[0]
    freqs = spw.chan_freq_hz.to_numpy()
    assert (np.diff(freqs) == spw.chan_width_hz.iloc[0]).all()

    pol = tabs["POLARIZATION"].toPandas().sort_values("corr_idx")
    assert pol.corr_type.tolist() == [9, 10, 11, 12]   # XX XY YX YY

    # MAIN foreign keys resolve against the subtables
    a_ids = {r.antenna_id for r in tabs["ANTENNA"].collect()}
    got = {r.antenna1 for r in main.select("antenna1").distinct().collect()}
    assert got <= a_ids

    obs = tabs["OBSERVATION"].toPandas()
    assert (obs.time_range_end_s > obs.time_range_start_s).all()
    t = main.toPandas().time_mjd_s
    assert (t >= obs.time_range_start_s.iloc[0] - 1).all()
    assert (t <= obs.time_range_end_s.iloc[0] + 1).all()


def test_bundle_covers_every_subtable(spark):
    df = spark.sql(MS.subtables_bundle_sql()).toPandas()
    assert set(df.table_name) == set(MS.subtable_sqls())
    # each (table, row, attr) unique
    assert not df.duplicated(["table_name", "row_id", "attr"]).any()
    # numeric and string values are mutually exclusive, never both null
    both = df.val_str.notna() & df.val_num.notna()
    neither = df.val_str.isna() & df.val_num.isna()
    assert not both.any() and not neither.any()
