"""Gate for the fully-relational complete pipeline
(pipeline.preprocess_full_rel): the reference flowchart including both
former UDF islands (C1 Van Vleck, F9 SumThreshold) as one plan, checked
bit-exact against its DuckDB oracle — the driver's hash-gate property
for pipeline_preprocess_full."""

from __future__ import annotations

import duckdb
import numpy as np

from birli_spark import pipeline


def test_full_pipeline_cross_engine_bitexact(spark, sf_dir):
    s = pipeline.preprocess_full_rel(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')")
    d = con.execute(pipeline.preprocess_full_oracle_sql()).df()
    assert sorted(s.columns) == sorted(d.columns)
    key = [c for c in ("t_out", "chan_out", "bl") if c in s.columns]
    s2 = s.sort_values(key).reset_index(drop=True)
    d2 = d.sort_values(key).reset_index(drop=True)
    assert len(s2) == len(d2) > 0
    for c in sorted(s2.columns):
        a, b = s2[c].to_numpy(), d2[c].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            a64 = a.astype(np.float64)
            b64 = b.astype(np.float64)
            eq = (a64.view(np.int64) == b64.view(np.int64)) | (
                np.isnan(a64) & np.isnan(b64))
        else:
            eq = np.asarray(a == b)
        assert eq.all(), f"col {c}: {(~eq).sum()} cross-engine diffs"


def test_full_pipeline_same_shape_as_udf_twin(spark, sf_dir):
    """The relational plan and the UDF-island twin average down to the
    same output grid (same keys and row count; values differ only by the
    documented f32-transcendental / cell-image spec deltas)."""
    rel = pipeline.preprocess_full_rel(spark, sf_dir).toPandas()
    udf = pipeline.preprocess_full(spark, sf_dir).toPandas()
    key = [c for c in ("t_out", "chan_out", "bl") if c in rel.columns]
    assert sorted(rel.columns) == sorted(udf.columns)
    r = rel.sort_values(key).reset_index(drop=True)
    u = udf.sort_values(key).reset_index(drop=True)
    assert len(r) == len(u)
    assert (r[key].values == u[key].values).all()
