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