"""Batch/stream parity for the theta-sketch twin: the drained streaming
k-minima state must equal the batch two-level aggregation's sketches,
so the pairwise algebra produces identical estimates."""

from __future__ import annotations

import tempfile


def test_theta_stream_matches_batch(spark, sf_dir):
    from birli_spark.operators import sketches
    from birli_spark.sources import corpus
    from birli_spark.streaming import theta as stheta

    with tempfile.TemporaryDirectory():
        updates = stheta.run_available_now(spark, sf_dir, "t_theta_parity")
    got = (stheta.pairs_from_updates(updates)
           .toPandas()
           .sort_values(["source_a", "source_b"])
           .reset_index(drop=True))
    want = (sketches.theta_sketch_pairs(
                corpus.load_documents(spark, sf_dir))
            .toPandas()
            .sort_values(["source_a", "source_b"])
            .reset_index(drop=True))
    assert len(got) == len(want) > 0
    for c in ["n_inter", "n_union"]:
        assert (got[c] == want[c]).all(), c
    for c in ["est_intersect", "est_union", "est_jaccard"]:
        assert (got[c] == want[c]).all(), c   # bitwise-identical arithmetic
