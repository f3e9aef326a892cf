"""Gates for the LSH-bucketed D5 embedding near-dup
(dedup.embedding_neardup_lsh) against the brute exactness baseline and
its DuckDB spec-parity oracle."""

from __future__ import annotations

import duckdb
import numpy as np

from birli_spark.operators import dedup


def test_lsh_subset_of_brute_with_high_recall(spark, sf_dir):
    """Verify is exact, so LSH pairs are a SUBSET of the brute pairs
    (no false positives ever); candidate recall must clear the banded
    bound (~98% on this data; ~1.0 for true near-dups at cos>=0.9)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    lsh = dedup.embedding_neardup_lsh(emb).toPandas()
    brute = dedup.embedding_neardup(emb).toPandas()
    ls = set(zip(lsh.vec_a, lsh.vec_b))
    bs = set(zip(brute.vec_a, brute.vec_b))
    assert ls <= bs, f"{len(ls - bs)} false positives"
    assert len(bs) > 0
    assert len(ls & bs) / len(bs) >= 0.9


def test_lsh_cross_engine_bitexact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    s = dedup.embedding_neardup_lsh(emb).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')")
    d = con.execute(dedup.embedding_neardup_lsh_oracle_sql()).df()
    key = ["vec_a", "vec_b"]
    s2 = s.sort_values(key).reset_index(drop=True)
    d2 = d.sort_values(key).reset_index(drop=True)
    assert len(s2) == len(d2) > 0
    assert (s2[key].values == d2[key].values).all()
    a = s2["cos"].to_numpy(np.float64)
    b = d2["cos"].to_numpy(np.float64)
    assert (a.view(np.int64) == b.view(np.int64)).all()


def test_hot_bucket_guard_bounds_candidates(spark):
    """A degenerate corpus (every vector identical) lands in ONE bucket
    per band; with max_bucket the join must not explode — the guard
    drops the hot buckets entirely (exact dups are D1's job)."""
    base = [float(v) for v in np.linspace(-1, 1, 64)]
    rows = [(i, base) for i in range(300)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = dedup.embedding_neardup_lsh(emb, max_bucket=100)
    assert out.count() == 0
    # without the guard the same corpus yields all pairs
    out2 = dedup.embedding_neardup_lsh(emb, max_bucket=None)
    assert out2.count() == 300 * 299 // 2
