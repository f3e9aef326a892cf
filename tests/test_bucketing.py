"""Bucketing contract: writing the fact table bucketed by the RFI
grouping keys must eliminate the groupBy exchange — the claim in
operators/rfi.py's docstring ("write bucketed by baseline and the
shuffle disappears")."""

from __future__ import annotations

import pytest

from birli_spark.sources import synthetic as syn


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # saveAsTable needs a warehouse; the session default points at the
    # test cwd, which is fine — use a unique table name instead
    return spark


def test_bucketed_rfi_island_has_no_exchange(spark, sf_dir):
    """The production claim itself: the F9e UDF island
    (groupBy(ant1, ant2).applyInPandas) planned over a baseline-bucketed
    fact table contains ZERO shuffle exchanges — the 100 TB layout makes
    the pipeline's one image-forming shuffle disappear."""
    from birli_spark.operators import rfi
    vis = syn.load_vis(spark, sf_dir)
    spark.sql("DROP TABLE IF EXISTS vis_bucketed_rfi")
    (vis.write.mode("overwrite")
     .bucketBy(8, "ant1", "ant2").sortBy("ant1", "ant2")
     .saveAsTable("vis_bucketed_rfi"))
    try:
        bucketed = spark.table("vis_bucketed_rfi")
        flagged = rfi.flag_rfi_mwa(bucketed)
        plan = flagged._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:1500]
        assert "FlatMapGroupsInPandas" in plan
        assert "Bucketed: true" in plan
        # and the unbucketed twin DOES shuffle
        plain = rfi.flag_rfi_mwa(vis)
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS vis_bucketed_rfi")


def test_bucketed_groupby_has_no_exchange(spark, sf_dir):
    vis = syn.load_vis(spark, sf_dir)
    spark.sql("DROP TABLE IF EXISTS vis_bucketed")
    (vis.write.mode("overwrite")
     .bucketBy(8, "ant1", "ant2").sortBy("ant1", "ant2")
     .saveAsTable("vis_bucketed"))
    try:
        bucketed = spark.table("vis_bucketed")
        agg = bucketed.groupBy("ant1", "ant2").count()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:1500]
        # same aggregation on the unbucketed source DOES shuffle
        plain = vis.groupBy("ant1", "ant2").count()
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
        # and results agree
        a = {(r.ant1, r.ant2): r["count"] for r in agg.collect()}
        b = {(r.ant1, r.ant2): r["count"] for r in plain.collect()}
        assert a == b
    finally:
        spark.sql("DROP TABLE IF EXISTS vis_bucketed")