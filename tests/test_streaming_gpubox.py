"""S1f — streaming gpubox ingest: micro-batches over a growing file
directory via the Python DataSource stream reader (exactly-once per
file across restarts through the checkpointed offset)."""

from __future__ import annotations

import pytest


@pytest.fixture()
def gdir(tmp_path):
    from birli_spark.sources import gpubox
    d = tmp_path / "gpubox_stream"
    d.mkdir()
    for cc in (0, 1):
        gpubox.write_gpubox(str(d / f"gpubox_{cc:02d}.fits"), cc_idx=cc,
                            num_ants=2, num_fine=2, num_timesteps=2)
    return d


def _run_stream(spark, gdir, ckpt, out):
    from birli_spark.sources import gpubox
    gpubox.register_gpubox_source(spark)
    q = (spark.readStream.format("gpubox")
         .load(str(gdir / "*.fits"))
         .writeStream.format("parquet")
         .option("path", str(out))
         .option("checkpointLocation", str(ckpt))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.read.parquet(str(out))


def test_streaming_gpubox_incremental(spark, gdir, tmp_path):
    from birli_spark.sources import gpubox
    ckpt, out = tmp_path / "ckpt", tmp_path / "out_parquet"
    df1 = _run_stream(spark, gdir, ckpt, out)
    # 2 files x 2 ts x 3 baselines x 2 fine chans
    assert df1.count() == 2 * 2 * 3 * 2
    assert {r.cc for r in df1.select("cc").distinct().collect()} == {0, 1}
    # a new file arrives that sorts BEFORE the processed ones (the real
    # correlator interleaves channel/batch in names) -> ONLY its rows
    # enter the next run: set-difference offsets, not a count high-water
    gpubox.write_gpubox(str(gdir / "aaa_gpubox.fits"), cc_idx=2,
                        num_ants=2, num_fine=2, num_timesteps=2)
    df2 = _run_stream(spark, gdir, ckpt, out)
    assert df2.count() == 2 * 2 * 3 * 2 + 2 * 3 * 2
    new_rows = df2.filter("cc = 2")
    assert new_rows.count() == 2 * 3 * 2
    # values identical to the batch scan of the same file
    batch = gpubox.read_gpubox(spark, str(gdir / "aaa_gpubox.fits"))
    assert sorted(map(tuple, new_rows.collect())) == \
        sorted(map(tuple, batch.collect()))


def test_stream_min_age_filters_fresh_files(tmp_path):
    """min_age_s keeps a file the correlator may still be writing out
    of the offset (set-difference offsets would otherwise mark a
    partially-read file processed forever); 0 (the default) ingests
    everything immediately."""
    import os
    import time

    from birli_spark.sources.gpubox import GpuboxStreamReader

    old = tmp_path / "obs_ch101_000.fits"
    new = tmp_path / "obs_ch101_001.fits"
    old.write_bytes(b"x")
    new.write_bytes(b"x")
    past = time.time() - 60
    os.utime(old, (past, past))   # 60 s old
    glob_p = str(tmp_path / "obs_ch101_*.fits")
    eager = GpuboxStreamReader({"path": glob_p})
    assert len(eager._files()) == 2
    guarded = GpuboxStreamReader({"path": glob_p, "min_age_s": "5"})
    assert guarded._files() == [str(old)]
    # once the file ages past the guard it becomes visible
    os.utime(new, (past, past))
    assert len(guarded._files()) == 2
