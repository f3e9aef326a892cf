"""End-to-end demo of the event-analytics side of the engine: one pass
over the events stream table producing the standard product-analytics
bundle — sessions, ordered conversion funnel, cohort retention, the
user-journey Markov matrix, per-user EWMA value trends, and the SCD2
event-type history — written as partitioned parquet plus a funnel
cross-check against the streaming twin (exact batch/stream parity).

Run: python examples/events_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from birli_spark.operators import events, merge  # noqa: E402
from birli_spark.session import get_spark  # noqa: E402
from birli_spark.sources import corpus  # noqa: E402


def main(sf_dir: str | None = None, out_dir: str | None = None) -> dict:
    sf_dir = sf_dir or "/root/testdata/sf0.001"
    out_dir = out_dir or tempfile.mkdtemp(prefix="events_out_")
    spark = get_spark("events_pipeline_example")
    ev = corpus.load_events(spark, sf_dir)

    sessions = events.sessionize(ev)
    sessions.write.mode("overwrite").parquet(os.path.join(out_dir,
                                                          "sessions"))
    funnel_batch = events.funnel(ev)
    funnel_batch.write.mode("overwrite").parquet(
        os.path.join(out_dir, "funnel"))
    retention = events.retention_cohorts(ev)
    retention.write.mode("overwrite").parquet(
        os.path.join(out_dir, "retention"))
    transitions = events.type_transitions(ev)
    transitions.write.mode("overwrite").parquet(
        os.path.join(out_dir, "transitions"))
    ewma = events.user_ewma(ev)
    ewma.write.mode("overwrite").parquet(os.path.join(out_dir, "ewma"))
    history = merge.scd2_user_type(ev)
    history.write.mode("overwrite").parquet(os.path.join(out_dir,
                                                         "history"))

    # batch/stream parity check: the streaming funnel must reproduce the
    # batch counts exactly over the finite source
    from birli_spark.streaming import funnel as sfunnel
    spark.conf.set("spark.sql.streaming.checkpointLocation",
                   tempfile.mkdtemp(prefix="events_ckpt_"))
    stream_counts = sfunnel.funnel_counts_from_updates(
        sfunnel.run_available_now(spark, sf_dir, "example_funnel"))
    batch = {r.stage: r.n_users for r in funnel_batch.collect()}
    stream = {r.stage: r.n_users for r in stream_counts.collect()}

    report = {
        "out_dir": out_dir,
        "n_events": ev.count(),
        "n_sessions": spark.read.parquet(
            os.path.join(out_dir, "sessions")).count(),
        "n_history_rows": spark.read.parquet(
            os.path.join(out_dir, "history")).count(),
        "funnel": batch,
        "stream_parity": batch == stream,
    }
    print(report)
    spark.stop()
    return report


if __name__ == "__main__":
    main(*sys.argv[1:3])
