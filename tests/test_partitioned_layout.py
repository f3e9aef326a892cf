"""P1b — the materialized cc-partitioned parquet layout (VERDICT r3
ask 5): sources/synthetic.py::load_vis claims "at 100 TB the fact table
would be real parquet partitioned by (cc, t)". This proves it: write
the baked fact cc-partitioned, run the P1 selection and the full
pipeline over the partitioned scan, and assert the coarse-channel
predicate reaches the scan as a PARTITION FILTER (directory prune at
plan time), not just a row filter."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from birli_spark import pipeline
from birli_spark.operators import selection
from birli_spark.sources import synthetic as syn


@pytest.fixture(scope="module")
def part_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("layout") / "vis_by_cc")
    return syn.materialize_vis_partitioned(spark, sf_dir, out)


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_cc_predicate_becomes_partition_filter(spark, part_dir):
    vis = spark.read.parquet(part_dir).select(*syn.VIS_COLUMNS)
    sel = selection.select_ranges(vis, t_min=2, t_max=10,
                                  coarse_chans=(0, 2))
    plan = _formatted_plan(sel)
    # the scan node must carry a NON-EMPTY PartitionFilters entry
    # naming cc — whole directories pruned before any IO
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf, plan
    assert "cc" in pf[0] and "[]" not in pf[0].replace(" ", ""), pf[0]
    # the t range is NOT a partition column -> it must be pushed to the
    # row-group level instead
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "t" in pushed[0], plan


def test_partitioned_scan_reads_only_selected_dirs(spark, part_dir):
    vis = spark.read.parquet(part_dir).select(*syn.VIS_COLUMNS)
    from pyspark.sql import functions as F

    sel = selection.select_ranges(vis, coarse_chans=(1,))
    # executed proof, not just plan text: every row the pruned scan
    # actually reads comes from the cc=1 directory
    files = [r[0] for r in
             sel.select(F.input_file_name()).distinct().collect()]
    assert files and all("/cc=1/" in f for f in files), files[:3]


def test_partitioned_scan_matches_derived_scan(spark, sf_dir, part_dir):
    vis_p = spark.read.parquet(part_dir).select(*syn.VIS_COLUMNS)
    # (t, bl, chan) is NOT unique on the derived fact (several
    # lineitem rows land in one cell) — sort on every column
    cols = list(syn.VIS_COLUMNS)
    a = selection.select_ranges(vis_p, t_min=2, t_max=10,
                                coarse_chans=(0, 2)) \
        .orderBy(*cols).toPandas()
    b = selection.select_ranges(syn.load_vis(spark, sf_dir), t_min=2,
                                t_max=10, coarse_chans=(0, 2)) \
        .orderBy(*cols).toPandas()
    assert a.equals(b[a.columns])


def test_pipeline_over_partitioned_layout(spark, sf_dir, part_dir):
    """The full preprocess pipeline accepts the partitioned scan as its
    vis override and produces the same averaged output."""
    vis_p = spark.read.parquet(part_dir).select(*syn.VIS_COLUMNS)
    a = pipeline.preprocess(spark, sf_dir, vis=vis_p) \
        .orderBy("t_out", "chan_out", "bl").toPandas()
    b = pipeline.preprocess(spark, sf_dir) \
        .orderBy("t_out", "chan_out", "bl").toPandas()
    assert a.equals(b[a.columns])
