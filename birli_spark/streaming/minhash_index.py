"""Streaming twin of the incremental MinHash dedup (D11,
operators/dedup.py::minhash_incremental_pairs): arriving documents are
probed against the STANDING band index as a Structured Streaming
**stream-static join** — the exact production shape of a continuous
corpus ingest guard (the reference has no streaming surface; this is
the engine's forward-looking path, like streaming/dedup.py).

Per micro-batch, each arriving document's minhash signature is computed
as a PER-ROW array aggregate (``array_min(transform(shingles, ...))``)
— no streaming aggregation, no state store, no watermark: the whole
probe is projections + a join against a static DataFrame, so it runs
in append mode with bounded memory regardless of corpus size. The
static side is the stored index (bucketed parquet in production;
computed + checkpointed here).

Scope: the stream probes NEW-vs-INDEX pairs (the ingest guard). The
NEW-vs-NEW half needs either the batch pass over the landed batch
(d11) or a watermarked self-join; the driver-checked oracle is the
``pair_type = 'new_old'`` subset of the d11 oracle with the hot-bucket
cap on the INDEX side only (``cap_side="index"`` — matching
:func:`static_index`'s build-time exclusion; d11's combined cap counts
batch members a stream cannot see across micro-batches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from birli_spark.functions import textsql as X
from birli_spark.operators.dedup import (D11_BATCH_MOD, D11_BATCH_RES,
                                         MINHASH_BANDS, MINHASH_SEEDS,
                                         SHINGLE_N, minhash_band_index)
from birli_spark.streaming.dedup import read_documents_stream


def _row_signature_cols(seeds: int = MINHASH_SEEDS) -> list:
    """Per-row minhash signature columns over the document's distinct
    shingles — the same ``minhash16`` unit the batch groupBy MINs over,
    folded as an array_min so a stream can compute it without state."""
    sh = X.distinct(X.SPARK, X.shingles(X.SPARK, X.toks(X.SPARK),
                                        SHINGLE_N))
    return [
        F.expr(f"array_min(transform({sh},"
               f" s -> {X.minhash16('s', k)}))").alias(f"h{k}")
        for k in range(seeds)]


def static_index(spark: SparkSession, sf_dir: str,
                 seeds: int = MINHASH_SEEDS,
                 bands: int = MINHASH_BANDS,
                 max_bucket: int | None = 256) -> tuple[DataFrame,
                                                        DataFrame]:
    """The standing corpus index (banded buckets + signatures) as
    STATIC DataFrames for the stream-static join — checkpointed, the
    stand-in for the stored bucketed tables. Hot buckets (> max_bucket
    members) are dropped AT INDEX BUILD TIME — the streaming analogue
    of d11's boilerplate exclusion (a stream cannot know batch bucket
    sizes across micro-batches, so the cap is an index property; the
    st12 oracle mirrors it with cap_side="index")."""
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter((F.col("doc_id") % D11_BATCH_MOD) != D11_BATCH_RES))
    banded, sig = minhash_band_index(docs, seeds, bands)
    if max_bucket is not None:
        small = (banded.groupBy("band", "key")
                 .agg(F.count("*").alias("bsz"))
                 .filter(F.col("bsz") <= max_bucket)
                 .select("band", "key"))
        banded = banded.join(small, ["band", "key"], "left_semi")
    return (banded.localCheckpoint(eager=True),
            sig.localCheckpoint(eager=True))


def probe_stream(stream: DataFrame, idx_banded: DataFrame,
                 idx_sig: DataFrame, threshold: float = 0.5,
                 seeds: int = MINHASH_SEEDS,
                 bands: int = MINHASH_BANDS) -> DataFrame:
    """new-vs-index near-dup pairs for the arriving documents: per-row
    signatures -> band keys (narrow explode) -> stream-static equi-join
    on (band, key) -> signature-estimated Jaccard against the index's
    stored signature."""
    r = seeds // bands
    new = (stream
           .filter((F.col("doc_id") % D11_BATCH_MOD) == D11_BATCH_RES)
           .select("doc_id", *_row_signature_cols(seeds)))
    band_structs = [
        F.struct(F.lit(b).alias("band"),
                 F.concat(*[F.col(f"h{b * r + j}")
                            for j in range(r)]).alias("key"))
        for b in range(bands)]
    banded = (new.select(
        "doc_id", *[F.col(f"h{k}") for k in range(seeds)],
        F.explode(F.array(*band_structs)).alias("bk"))
        .select(F.col("doc_id").alias("doc_n"),
                *[F.col(f"h{k}").alias(f"a{k}") for k in range(seeds)],
                F.col("bk.band").alias("band"),
                F.col("bk.key").alias("key")))
    idx = idx_banded.withColumnsRenamed({"doc_id": "doc_o"})
    sb = idx_sig.select(F.col("doc_id").alias("doc_o"),
                        *[F.col(f"h{k}").alias(f"b{k}")
                          for k in range(seeds)])
    match = " + ".join(f"IF(a{k} = b{k}, 1, 0)" for k in range(seeds))
    est = f"CAST(({match}) AS DOUBLE) / {float(seeds)!r}"
    return (banded.join(idx, ["band", "key"])        # stream-static
            .join(F.broadcast(sb), "doc_o")
            .withColumn("est_jaccard", F.expr(est))
            .filter(F.col("est_jaccard") >= threshold)
            .select(F.least("doc_n", "doc_o").alias("doc_a"),
                    F.greatest("doc_n", "doc_o").alias("doc_b"),
                    "est_jaccard",
                    F.lit("new_old").alias("pair_type")))


def run_available_now(spark: SparkSession, sf_dir: str,
                      query_name: str = "stream_minhash",
                      threshold: float = 0.5) -> DataFrame:
    """Drain the probe stream (availableNow) and return the DISTINCT
    matched pairs (a pair found via several shared buckets — or
    re-delivered across micro-batches — reports once, like d11)."""
    idx_banded, idx_sig = static_index(spark, sf_dir)
    stream = read_documents_stream(spark, sf_dir)
    pairs = probe_stream(stream, idx_banded, idx_sig, threshold)
    from birli_spark.streaming import drain_to_memory
    return drain_to_memory(pairs, query_name, "append").distinct()
