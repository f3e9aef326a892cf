"""Full-text retrieval over the ``documents`` table — the search family
of the training-data pipeline (an inverted index is how a 100 TB corpus
answers "which documents mention X" without a full scan, and BM25 is the
standard lexical ranker used for retrieval-based decontamination and
RAG-corpus curation).

Reference analogue: none — the reference is a fixed signal-processing
batch pipeline; SURVEY.md §2.8 lists this family as beyond-reference.

Scale shapes:

- :func:`inverted_index` — postings are **sharded by doc_id** so no
  single (term, postings) row can exceed a task: at 100 TB a stopword's
  posting list is billions of entries; `shard = doc_id % NUM_SHARDS`
  bounds every row to corpus/NUM_SHARDS and makes the index build a
  single map-side-combined groupBy((term, shard)). Readers prune shards
  by doc-range and merge per-term rows (posting strings are sorted, so
  the merge is a k-way concatenation).
- :func:`bm25_topk` — the query set is a literal broadcast; the corpus
  side is two narrow scans (term frequencies + doc lengths) with one
  partial-aggregated groupBy(doc) reduction. Nothing corpus-sized ever
  sorts: top-k per query ranks the aggregated candidate set only.

Determinism (the repo's cross-engine rules): every corpus reduction that
crosses a shuffle is an exact BIGINT sum — BM25 per-term scores are
converted to 2^-20 ticks before the per-doc SUM — and the idf's log2
comes from the fixed-point binary-digit algorithm
(:func:`birli_spark.functions.textsql.log2fix_duck_sql`), never libm, so
Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from birli_spark.functions import textsql as X
from birli_spark.operators import similarity as brute_sim

NUM_SHARDS = 8

#: BM25 constants (Robertson k1/b defaults; exactly-representable doubles
#: are not required — both engines parse the same literal to the same bits)
BM25_K1 = "1.2"
BM25_B = "0.75"
_NBITS = 24
#: idf ratio is scaled by 2^20 before the integer log2
_RSCALE = 1 << 20
#: per-term score → ticks scale (2^20)
_TSCALE = 1 << 20

#: fixed query workload: (query_id, term) — broadcast-sized by definition
QUERIES = [
    (0, "hash"), (0, "join"),
    (1, "window"), (1, "agg"), (1, "sort"),
    (2, "stream"), (2, "batch"),
    (3, "customer"), (3, "query"), (3, "fast"),
]


def _tf(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf) — narrow explode off the scan + one
    map-side-combined groupBy."""
    return (docs
            .select("doc_id", F.explode(F.expr(X.toks(X.SPARK))).alias("term"))
            .filter(F.col("term") != "")
            .groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf")))


def _tf_cte(table: str = "documents") -> str:
    return f"""tok AS (
  SELECT doc_id, unnest({X.toks(X.DUCK)}) AS term
  FROM {table}),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
  WHERE term <> '' GROUP BY doc_id, term)"""


_TF_CTE = _tf_cte()


def inverted_index(docs: DataFrame,
                   num_shards: int = NUM_SHARDS) -> DataFrame:
    """I1 — doc-sharded inverted index: one row per (term, shard) with
    the shard's document count, total term frequency, and the posting
    list serialized as a sorted ``doc:tf`` string (strings hash exactly
    across engines; a production sink would store the equivalent
    ``array<struct<doc,tf>>``)."""
    tf = _tf(docs).withColumn("shard",
                              (F.col("doc_id") % num_shards).cast("int"))
    return (tf.groupBy("term", "shard")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("tf").alias("tf_total"),
                 F.expr("concat_ws(',', transform("
                        "array_sort(collect_list(struct(doc_id, tf))), "
                        "s -> concat(s.doc_id, ':', s.tf)))")
                 .alias("postings")))


def inverted_index_oracle_sql(num_shards: int = NUM_SHARDS,
                              table: str = "documents",
                              extra_ctes: str = "") -> str:
    return f"""
WITH {extra_ctes}{_tf_cte(table)}
SELECT term, CAST(doc_id % {num_shards} AS INT) AS shard,
  COUNT(*) AS n_docs, CAST(SUM(tf) AS BIGINT) AS tf_total,
  string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
FROM tf GROUP BY term, shard"""


def bm25_topk(docs: DataFrame, spark, k: int = 10) -> DataFrame:
    """I2 — BM25 top-k documents per query: broadcast the literal query
    terms onto the (doc, term, tf) table, score each hit with the Lucene
    idf ``log2(1 + (N − df + 0.5)/(df + 0.5))`` times
    ``tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))``, reduce per (query, doc)
    as exact ticks, rank inside each query.

    The idf ratio (one exact-rounded division of identical operands) is
    scaled to an integer and fed to the fixed-point log2; the chain runs
    on the query-term-pruned vocab table only. avgdl is an in-plan 1-row
    aggregate (broadcast), never a collect."""
    from birli_spark.operators.text import _log2fix_ticks
    q = spark.createDataFrame(QUERIES, "query_id INT, term STRING")
    # dl is functionally dependent on doc_id, so it rides THROUGH the
    # explode as a carried column and lands in the tf aggregate's key —
    # one corpus scan and NO tf⋈dl shuffle join (the join key would have
    # been doc_id, i.e. a full re-shuffle of the corpus-sized tf table).
    # The query-term prune happens BEFORE the tf aggregate (a broadcast
    # semi join on the exploded stream): per-(doc, term) counts are
    # unaffected by dropping other terms' rows, so only query-term
    # postings ever cross a shuffle — and the pruned tf table is cheap
    # enough that its two consumers (df aggregate, hit scoring) can
    # recompute the narrow explode instead of materializing the
    # full-vocabulary postings list.
    qt = F.broadcast(q.select("term").distinct())
    tf = (docs
          .select("doc_id",
                  F.expr(X.toks(X.SPARK)).alias("__toks"))
          .select("doc_id",
                  F.expr("size(__toks)").alias("dl"),
                  F.explode("__toks").alias("term"))
          .filter(F.col("term") != "")
          .join(qt, "term")
          .groupBy("doc_id", "dl", "term")
          .agg(F.count("*").alias("tf")))
    n_total = (docs.agg(
        F.sum(F.expr(X.size(X.SPARK, X.toks(X.SPARK)))).alias("tot"),
        F.count("*").alias("n")))
    dft = tf.groupBy("term").agg(F.count("*").alias("df"))
    dfq = dft.join(F.broadcast(n_total))
    r = ("1.0 + (CAST(n - df AS DOUBLE) + 0.5) / "
         "(CAST(df AS DOUBLE) + 0.5)")
    dfq = dfq.withColumn(
        "__ri", F.expr(f"CAST(ROUND(({r}) * {_RSCALE}.0) AS BIGINT)"))
    dfq = _log2fix_ticks(dfq, "__ri", "__lg", _NBITS)
    idf = dfq.select(
        "term",
        F.expr(f"__lg - CAST(20 AS BIGINT) * {1 << _NBITS}")
        .alias("idf_ticks"))

    score = (f"(CAST(idf_ticks AS DOUBLE) / {1 << _NBITS}.0) * "
             f"(CAST(tf AS DOUBLE) * ({BM25_K1} + 1.0)) / "
             f"(CAST(tf AS DOUBLE) + {BM25_K1} * (1.0 - {BM25_B} + "
             f"{BM25_B} * (CAST(dl AS DOUBLE) / "
             f"(CAST(tot AS DOUBLE) / CAST(n AS DOUBLE)))))")
    hits = (tf.join(F.broadcast(q), "term")
            .join(F.broadcast(n_total))
            .join(F.broadcast(idf), "term")
            .withColumn("score_ticks",
                        F.expr(f"CAST(ROUND(({score}) * {_TSCALE}.0) "
                               f"AS BIGINT)")))
    per_doc = (hits.groupBy("query_id", "doc_id")
               .agg(F.count("*").alias("n_hit"),
                    F.sum("score_ticks").alias("ticks")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("ticks"), F.asc("doc_id"))
    return (per_doc.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", "rank", "n_hit",
                    F.expr(f"CAST(ticks AS DOUBLE) / {_TSCALE}.0")
                    .alias("score")))


def bm25_topk_oracle_sql(k: int = 10) -> str:
    qvals = ", ".join(f"({qid}, '{t}')" for qid, t in QUERIES)
    r = ("1.0 + (CAST(n - df AS DOUBLE) + 0.5) / "
         "(CAST(df AS DOUBLE) + 0.5)")
    idf_inner = f"""
SELECT d.term, CAST(ROUND(({r}) * {_RSCALE}.0) AS BIGINT) AS __ri
FROM dft d, ntot"""
    idf_sql = X.log2fix_duck_sql(
        f"SELECT term, __ri FROM ({idf_inner})", "__ri", "__lg", ["term"],
        _NBITS)
    score = (f"(CAST(i.idf_ticks AS DOUBLE) / {1 << _NBITS}.0) * "
             f"(CAST(tf.tf AS DOUBLE) * ({BM25_K1} + 1.0)) / "
             f"(CAST(tf.tf AS DOUBLE) + {BM25_K1} * (1.0 - {BM25_B} + "
             f"{BM25_B} * (CAST(dl.dl AS DOUBLE) / "
             f"(CAST(ntot.tot AS DOUBLE) / CAST(ntot.n AS DOUBLE)))))")
    return f"""
WITH {_TF_CTE},
q(query_id, term) AS (VALUES {qvals}),
dl AS (SELECT doc_id, {X.size(X.DUCK, X.toks(X.DUCK))} AS dl
       FROM documents),
ntot AS (SELECT SUM(dl) AS tot, COUNT(*) AS n FROM dl),
dft AS (SELECT tf.term, COUNT(*) AS df FROM tf
        JOIN (SELECT DISTINCT term FROM q) qt ON tf.term = qt.term
        GROUP BY tf.term),
idf AS (SELECT term, __lg - CAST(20 AS BIGINT) * {1 << _NBITS} AS idf_ticks
        FROM ({idf_sql})),
hits AS (
  SELECT q.query_id, tf.doc_id,
    CAST(ROUND(({score}) * {_TSCALE}.0) AS BIGINT) AS score_ticks
  FROM tf
  JOIN q ON tf.term = q.term
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN idf i ON tf.term = i.term
  CROSS JOIN ntot),
per_doc AS (
  SELECT query_id, doc_id, COUNT(*) AS n_hit, SUM(score_ticks) AS ticks
  FROM hits GROUP BY query_id, doc_id)
SELECT query_id, doc_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY ticks DESC, doc_id ASC) AS INT) AS rank,
  n_hit, CAST(ticks AS DOUBLE) / {_TSCALE}.0 AS score
FROM per_doc
QUALIFY rank <= {k}"""


def clean_index_pipeline(docs: DataFrame) -> DataFrame:
    """PIPELINE — curate-then-index: drop exact/near duplicates and
    low-quality documents (:func:`~birli_spark.operators.corpus_clean.
    clean_corpus`), then build the sharded inverted index over the
    survivors only — the end-to-end offline path of a search corpus
    (indexing rejects is pure waste at 100 TB; the semi join pushes the
    survivor filter into the index build's first scan)."""
    from birli_spark.operators.corpus_clean import clean_corpus
    survivors = clean_corpus(docs).select("doc_id")
    kept = docs.join(survivors, "doc_id", "semi")
    return inverted_index(kept)


def clean_index_pipeline_oracle_sql(num_shards: int = NUM_SHARDS) -> str:
    from birli_spark.operators.corpus_clean import clean_corpus_oracle_sql
    extra = (f"kept AS (\n  SELECT d.* FROM documents d\n"
             f"  WHERE d.doc_id IN (SELECT doc_id FROM "
             f"({clean_corpus_oracle_sql()}))),\n")
    return inverted_index_oracle_sql(num_shards, table="kept",
                                     extra_ctes=extra)


# ------------------------------------------------ I3: hybrid RRF fusion ---

RRF_K = 60
RRF_CAND = 20
#: 1/(K+rank) in nanounits — exact BIGINTs, so fused ordering can't flap
_RRF_SCALE = 1_000_000_000


def rrf_fusion(docs: DataFrame, emb: DataFrame, spark, k: int = 10,
               k_cand: int = RRF_CAND, kconst: int = RRF_K) -> DataFrame:
    """I3 — hybrid retrieval by **reciprocal-rank fusion** (Cormack et
    al. 2009): merge the BM25 lexical top-``k_cand`` with the exact
    cosine vector top-``k_cand`` (doc_id ≙ vec_id for embedded docs) and
    re-rank by ``Σ 1/(K + rank)``. The standard production hybrid-search
    shape: two independent candidate generators, one cheap fusion.

    Scale shape: both inputs are already per-query top-k lists —
    queries × k_cand rows — so the fusion's full-outer join and window
    re-rank never touch the corpus; the corpus-sized work lives in the
    two upstream rankers. Partial embedding coverage is the normal case
    (a doc in only one list just scores one term). RRF contributions are
    exact nano-ticks (BIGINT), so cross-engine ordering is stable."""
    lex = (bm25_topk(docs, spark, k=k_cand)
           .select("query_id", "doc_id", F.col("rank").alias("r_lex")))
    vec = (brute_sim.brute_topk(emb, k=k_cand, n_queries=4)
           .select(F.col("qid").alias("query_id"),
                   F.col("vec_id").alias("doc_id"),
                   F.col("rank").alias("r_vec")))
    tick = (f"COALESCE(CAST(ROUND({_RRF_SCALE}.0 / "
            f"({kconst} + r_lex)) AS BIGINT), CAST(0 AS BIGINT)) + "
            f"COALESCE(CAST(ROUND({_RRF_SCALE}.0 / "
            f"({kconst} + r_vec)) AS BIGINT), CAST(0 AS BIGINT))")
    fused = (lex.join(vec, ["query_id", "doc_id"], "full_outer")
             .withColumn("ticks", F.expr(tick)))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("ticks"), F.asc("doc_id"))
    return (fused.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", "rank",
                    F.expr("r_lex IS NOT NULL").alias("from_lex"),
                    F.expr("r_vec IS NOT NULL").alias("from_vec"),
                    F.expr(f"CAST(ticks AS DOUBLE) / {_RRF_SCALE}.0")
                    .alias("rrf")))


def rrf_fusion_oracle_sql(k: int = 10, k_cand: int = RRF_CAND,
                          kconst: int = RRF_K) -> str:
    from birli_spark.operators.similarity import brute_topk_oracle_sql
    tick = (f"COALESCE(CAST(ROUND({_RRF_SCALE}.0 / "
            f"({kconst} + l.rank)) AS BIGINT), CAST(0 AS BIGINT)) + "
            f"COALESCE(CAST(ROUND({_RRF_SCALE}.0 / "
            f"({kconst} + v.rank)) AS BIGINT), CAST(0 AS BIGINT))")
    return f"""
WITH lex AS (SELECT * FROM ({bm25_topk_oracle_sql(k=k_cand)})),
vec AS (SELECT * FROM ({brute_topk_oracle_sql(k=k_cand, n_queries=4)})),
fused AS (
  SELECT COALESCE(l.query_id, v.qid) AS query_id,
    COALESCE(l.doc_id, v.vec_id) AS doc_id,
    l.rank IS NOT NULL AS from_lex,
    v.rank IS NOT NULL AS from_vec,
    {tick} AS ticks
  FROM lex l FULL OUTER JOIN vec v
    ON l.query_id = v.qid AND l.doc_id = v.vec_id)
SELECT query_id, doc_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY ticks DESC, doc_id ASC) AS INT) AS rank,
  from_lex, from_vec,
  CAST(ticks AS DOUBLE) / {_RRF_SCALE}.0 AS rrf
FROM fused
QUALIFY rank <= {k}"""
