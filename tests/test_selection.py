"""Selection operators (P1-P4) on the derived vis table."""

from __future__ import annotations

from pyspark.sql import functions as F

from birli_spark.operators import selection
from birli_spark.sources import synthetic as syn


def test_select_ranges_pushes_down(spark, sf_dir):
    vis = syn.load_vis(spark, sf_dir)
    out = selection.select_ranges(vis, t_min=2, t_max=10, coarse_chans=(0, 2))
    pdf = out.select("t", "cc").distinct().toPandas()
    assert pdf["t"].between(2, 9).all()
    assert set(pdf["cc"]) <= {0, 2}


def test_retain_antennas(spark, sf_dir):
    vis = syn.load_vis(spark, sf_dir)
    out = selection.retain_antennas(vis, (0, 1))
    pdf = out.select("ant1", "ant2").distinct().toPandas()
    assert set(pdf["ant1"]) <= {0, 1} and set(pdf["ant2"]) <= {0, 1}


def test_filter_antennas_anti_join(spark, sf_dir):
    vis = syn.load_vis(spark, sf_dir)
    flagged = syn.load_dim(spark, "antennas").filter(F.col("flagged"))
    out = selection.filter_antennas(vis, flagged)
    pdf = out.select("ant1", "ant2").distinct().toPandas()
    assert 3 not in set(pdf["ant1"]) and 3 not in set(pdf["ant2"])
    # anti-join must not change surviving row count vs a literal filter
    expected = vis.filter((F.col("ant1") != 3) & (F.col("ant2") != 3)).count()
    assert out.count() == expected


def test_filter_autos(spark, sf_dir):
    out = selection.filter_autos(syn.load_vis(spark, sf_dir))
    assert out.filter(F.col("ant1") == F.col("ant2")).count() == 0


def test_plan_has_pushed_filters(spark, sf_dir):
    """Scale check: P1 predicates must reach the parquet scan."""
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plan = lineitem.filter(F.col("l_orderkey") > 100).select("l_orderkey")
    formatted = plan._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert "PushedFilters: [IsNotNull(l_orderkey), GreaterThan(l_orderkey,100)]" in formatted
