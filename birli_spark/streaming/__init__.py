"""Structured-Streaming twins of the batch operators.

Every module exposes a ``run_available_now(spark, sf_dir)`` harness that
drains its finite file source with ``trigger(availableNow=True)`` into a
memory sink; the driver hash-gates the result against the batch twin.
"""

from pyspark.sql import DataFrame


def drain_to_memory(out: DataFrame, query_name: str,
                    output_mode: str) -> DataFrame:
    """Start ``out`` as an availableNow memory-sink stream with a FRESH
    per-run checkpoint directory, await completion, return the sink table.

    The explicit per-run ``checkpointLocation`` is the point: a stream
    that inherits the session-global ``spark.sql.streaming.
    checkpointLocation`` from an earlier run would find committed
    offsets there and silently skip already-seen input files — a
    correctness hazard for any caller that invokes the harness twice in
    one session (driver re-runs, bench repeats, tests).
    """
    import shutil
    import tempfile

    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{query_name}_")
    q = (out.writeStream
         .format("memory")
         .queryName(query_name)
         .option("checkpointLocation", ckpt)
         .outputMode(output_mode)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    # the memory sink holds the rows; the checkpoint is disposable
    shutil.rmtree(ckpt, ignore_errors=True)
    return out.sparkSession.table(query_name)
