"""Streaming exact dedup: the stream must admit exactly one document per
distinct text, with duplicate suppression carrying across micro-batches
via the dropDuplicatesWithinWatermark state store."""

from __future__ import annotations

import os

import pandas as pd

from birli_spark.operators import dedup as batch_dedup
from birli_spark.sources import corpus
from birli_spark.streaming import dedup as sdedup


def test_stream_dedup_matches_batch(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.streaming.checkpointLocation",
                   str(tmp_path / "ckpt"))
    got = sdedup.run_available_now(spark, sf_dir, "t_dedup").toPandas()
    exp = (batch_dedup.exact_dedup(corpus.load_documents(spark, sf_dir))
           .toPandas())
    # one admitted row per distinct text, same hash set as batch D1
    assert sorted(got.text_md5) == sorted(exp.text_md5.unique())
    # every admitted doc_id really belongs to its hash group
    groups = exp.groupby("text_md5").doc_id.apply(set)
    assert all(r.doc_id in groups[r.text_md5] for r in got.itertuples())


def test_stream_dedup_across_batches(spark, tmp_path):
    # batch 0 delivers docs 0-2; batch 1 re-delivers doc 1's text (as doc
    # 3) and adds a new doc 4 — the re-delivery must be suppressed by
    # state carried across micro-batches
    src = str(tmp_path / "docs_split")
    os.makedirs(src, exist_ok=True)
    mk = lambda i, t: {"doc_id": i, "text": t, "lang": "en",
                       "source": "s", "n_chars": len(t)}
    pd.DataFrame([mk(0, "alpha beta"), mk(1, "gamma delta"),
                  mk(2, "epsilon zeta")]).to_parquet(
        f"{src}/part0.parquet", index=False)
    pd.DataFrame([mk(3, "gamma delta"), mk(4, "eta theta")]).to_parquet(
        f"{src}/part1.parquet", index=False)
    stream = (spark.readStream.schema(sdedup.DOCS_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (sdedup.dedup_stream(stream)
         .writeStream.format("memory").queryName("t_dedup_mb")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_mb"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    got = spark.table("t_dedup_mb").toPandas().sort_values("doc_id")
    assert got.doc_id.tolist() == [0, 1, 2, 4]


# --------------------------------- st12: streaming index probe (D11) ---

def test_stream_minhash_probe_matches_batch_new_old(spark, sf_dir,
                                                    tmp_path):
    """Stream-static index probe == its DuckDB oracle (the d11 new_old
    subset with the hot-bucket cap on the INDEX side, exactly the
    driver-gated property)."""
    import duckdb

    spark.conf.set("spark.sql.streaming.checkpointLocation",
                   str(tmp_path / "ckpt12"))
    from birli_spark.streaming import minhash_index as sminh

    got = sminh.run_available_now(spark, sf_dir, "t_minhash").toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM"
                f" read_parquet('{sf_dir}/documents.parquet')")
    exp = con.execute(
        batch_dedup.minhash_incremental_oracle_sql(cap_side="index")
    ).df()
    exp = exp[exp.pair_type == "new_old"]
    key = ["doc_a", "doc_b"]
    g = got.sort_values(key).reset_index(drop=True)
    e = exp.sort_values(key).reset_index(drop=True)
    assert len(g) == len(e)
    assert (g[key].to_numpy() == e[key].to_numpy()).all()
    assert (g.est_jaccard.to_numpy() == e.est_jaccard.to_numpy()).all()


def test_stream_minhash_probe_finds_planted_dup(spark, tmp_path):
    """A batch-arriving exact copy of an indexed document is caught by
    the stream-static probe with estimated Jaccard 1.0."""
    import pandas as pd

    from birli_spark.streaming import dedup as sd
    from birli_spark.streaming import minhash_index as sminh

    text = ("the quick brown fox jumps over the lazy dog again and "
            "again when nobody watches the meadow at dusk")
    other = ("entirely different content about rivers and bridges and "
             "the engineering of long spans in high wind conditions")
    src = tmp_path / "mini"
    src.mkdir()
    pd.DataFrame({
        "doc_id": [0, 1, 4, 9],  # 4 and 9 are batch (id % 5 == 4)
        "text": [text, other, text, "nothing shared with anything"],
        "lang": ["en"] * 4, "source": ["t"] * 4,
        "n_chars": [len(text), len(other), len(text), 28],
    }).to_parquet(src / "documents.parquet")
    spark.conf.set("spark.sql.streaming.checkpointLocation",
                   str(tmp_path / "ckpt12b"))
    got = sminh.run_available_now(spark, str(src), "t_minhash_b") \
        .toPandas()
    assert len(got) == 1
    assert (int(got.doc_a[0]), int(got.doc_b[0])) == (0, 4)
    assert got.est_jaccard[0] == 1.0
