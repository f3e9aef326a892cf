"""As-of join: constructed-case semantics (inclusive backward match,
no-match nulls), and agreement between the window implementation, the
merge_asof implementation, and DuckDB's native ASOF JOIN."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import Row

from birli_spark.operators import asof
from birli_spark.sources import corpus

US = 1_000_000
NS = 1_000


def _ev(eid, user, t_us, typ, value=1.0):
    return Row(event_id=eid, ts=t_us * NS, user_id=user,
               event_type=typ, value=value, props="{}")


def test_asof_semantics_constructed(spark):
    rows = [
        _ev(1, 7, 10 * US, "view"),
        _ev(2, 7, 20 * US, "click"),        # -> view 1
        _ev(3, 7, 30 * US, "view"),
        _ev(4, 7, 30 * US, "click"),        # exact tie -> view 3 (inclusive)
        _ev(5, 9, 5 * US, "click"),         # no prior view -> null
        _ev(6, 9, 6 * US, "view"),
    ]
    out = {r.event_id: r for r in
           asof.asof_join(spark.createDataFrame(rows)).collect()}
    assert out[2].view_event_id == 1
    assert out[4].view_event_id == 3 and out[4].view_ts_us == 30 * US
    assert out[5].view_event_id is None


def test_asof_implementations_agree(spark, sf_dir):
    ev = corpus.load_events(spark, sf_dir)
    a = (asof.asof_join(ev).orderBy("event_id").toPandas())
    b = (asof.asof_join_pandas(ev).orderBy("event_id").toPandas())
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # and both agree with DuckDB's native ASOF JOIN
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_dir}/events.parquet'")
    c = con.execute(asof.asof_oracle_sql()).df().sort_values(
        "event_id", ignore_index=True)
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True)[sorted(a.columns)],
        c[sorted(c.columns)], check_dtype=False)