"""The flagship training-data pipeline: corpus cleaning — exact dedup →
MinHash-LSH near-dup removal → quality filter, composed from the dedup
and text operators (the document-side analogue of the visibility
preprocessing pipeline).

Spark shape: two bucket-join candidate stages and one per-row
projection. Survivors are selected with **anti-joins** against the
removal sets (exact-dupe doc_ids, near-dup doc_b's), so nothing
materializes per surviving row but the final projection. At 100 TB the
shingle table is the dominant intermediate; it is deliberately
recomputed per consumer inside the LSH stage rather than cached
(operators/dedup.py — codegen recompute beats materializing an
exploded corpus-scale table).

Removal policy (the standard pairwise one): for an exact group keep the
minimum doc_id; for a near-dup pair (doc_a < doc_b) drop doc_b. A doc
survives the near-dup stage iff it has no *direct* pair with a smaller
doc_id — so a component like {1, 5, 4} with pairs (1,5) and (4,5) keeps
both 1 and 4 (they never paired with each other). For the stricter
one-survivor-per-transitive-cluster policy, use
:func:`birli_spark.operators.dedup.connected_components` /
``neardup_clusters`` (D6) and keep ``doc_id == cluster_id``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from birli_spark.functions import textsql as X
from birli_spark.operators import dedup, text

QUALITY_MIN = 0.55
NEARDUP_JACCARD = 0.7


def clean_corpus(docs: DataFrame, quality_min: float = QUALITY_MIN,
                 neardup_threshold: float = NEARDUP_JACCARD) -> DataFrame:
    """→ (doc_id, lang, source, n_tokens, quality_score) of surviving
    documents."""
    exact = dedup.exact_dedup(docs).filter("is_dupe").select("doc_id")
    near = (dedup.minhash_lsh_pairs(docs, threshold=neardup_threshold)
            .select(F.col("doc_b").alias("doc_id")).distinct())
    drop = exact.unionByName(near).distinct()
    stats = text.token_stats(docs).select("doc_id", "n_tokens",
                                          "quality_score")
    return (docs.join(drop, "doc_id", "left_anti")
            .join(stats, "doc_id")
            .filter(F.col("quality_score") >= quality_min)
            .select("doc_id", "lang", "source", "n_tokens", "quality_score"))


def clean_corpus_oracle_sql(quality_min: float = QUALITY_MIN,
                            neardup_threshold: float = NEARDUP_JACCARD) -> str:
    minhash = dedup.minhash_lsh_oracle_sql(threshold=neardup_threshold)
    stats = text.token_stats_oracle_sql()
    return f"""
WITH exact_dupes AS (
  SELECT doc_id FROM (
    SELECT doc_id,
      MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_doc_id
    FROM documents)
  WHERE doc_id <> keep_doc_id),
near_pairs AS ({minhash}),
near_dupes AS (SELECT DISTINCT doc_b AS doc_id FROM near_pairs),
drops AS (SELECT doc_id FROM exact_dupes UNION SELECT doc_id FROM near_dupes),
stats AS ({stats})
SELECT d.doc_id, d.lang, d.source, s.n_tokens, s.quality_score
FROM documents d
JOIN stats s ON s.doc_id = d.doc_id
WHERE d.doc_id NOT IN (SELECT doc_id FROM drops)
  AND s.quality_score >= {quality_min!r}"""

# ------------------------------------------------- stratified sampling ---

#: per-language keep rates (a curation policy: downweight the dominant
#: strata, keep the rare ones whole)
SAMPLE_RATES = {"en": 0.5, "de": 0.75, "fr": 0.75}
SAMPLE_DEFAULT_RATE = 1.0

_HEX_WIDTH = 8          # compare the first 8 md5 hex chars (32 bits)


def _rate_to_hex(rate: float) -> str:
    """Map a keep-rate to the lexicographic hex threshold such that
    P[bucket < threshold] = rate for a uniform 32-bit bucket. The
    threshold must be exactly _HEX_WIDTH chars for the string compare to
    order like the integer; rate >= 1 uses 'g', which sorts above every
    hex string (keep everything)."""
    if rate >= 1.0:
        return "g"
    return format(int(rate * 16 ** _HEX_WIDTH), f"0{_HEX_WIDTH}x")


def _rate_case(d: str) -> str:
    arms = " ".join(
        f"WHEN lang = '{lang}' THEN '{_rate_to_hex(r)}'"
        for lang, r in sorted(SAMPLE_RATES.items()))
    return f"CASE {arms} ELSE '{_rate_to_hex(SAMPLE_DEFAULT_RATE)}' END"


def stratified_sample(docs: DataFrame) -> DataFrame:
    """Deterministic stratified sample: keep a doc iff the first 8 hex
    chars of ``md5(doc_id)`` fall under its language's threshold.

    The hash-bucket predicate is the scale-correct sampler: it is a pure
    narrow filter over the scan (no shuffle, no RNG state, no seed
    coordination across executors), reproducible run-to-run, and
    consistent under re-partitioning — the same doc is always in or out.
    Lexicographic hex comparison avoids hex→int conversion (exact and
    identical in both engines)."""
    bucket = "substring(md5(CAST(doc_id AS STRING)), 1, 8)"
    return (docs
            .withColumn("bucket", F.expr(bucket))
            .withColumn("threshold", F.expr(_rate_case("spark")))
            .filter(F.col("bucket") < F.col("threshold"))
            .select("doc_id", "lang", "source", "bucket"))


def stratified_sample_oracle_sql() -> str:
    return f"""
SELECT doc_id, lang, source,
       substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS bucket
FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < ({_rate_case('duck')})"""


PRIORITY_SAMPLE_K = 50


def weighted_sample(docs: DataFrame,
                    k: int = PRIORITY_SAMPLE_K) -> DataFrame:
    """T20 — deterministic weighted sampling without replacement
    (priority sampling, Duffield/Lund/Thorup JACM'07): each document
    draws a reproducible pseudo-uniform ``u`` from md5(doc_id) and gets
    priority ``u / w`` with weight = document length; the k smallest
    priorities form the sample, so long documents are proportionally
    favored but every document keeps a nonzero chance.

    Determinism: u is the exact integer hash fraction (the sketch
    family's hex fold / 2^32 — one exact-rounded division), the
    priority is one more exact-rounded division, and the top-k is a
    rank with doc_id tie-break — all bit-identical cross-engine, unlike
    engine RNG sampling (``TABLESAMPLE``/``rand()`` are not
    reproducible across engines or even partitionings).

    Scale shape: a narrow projection plus one global top-k — rank via
    window over the k-filterable aggregate; at 100 TB you'd replace the
    single window with a per-partition top-k + merge (the classic
    distributed selection), which AQE's partial TakeOrdered already
    approximates for plain ORDER BY LIMIT."""
    from pyspark.sql import Window
    from birli_spark.operators.sketches import _HEX32_SPACE, _hex32
    u = (f"CAST({_hex32(X.SPARK, 'md5(CAST(doc_id AS STRING))')} AS DOUBLE)"
         f" / {_HEX32_SPACE!r}")
    prio = f"({u}) / CAST(n_chars AS DOUBLE)"
    w = Window.orderBy(F.asc("priority"), F.asc("doc_id"))
    return (docs
            # zero-weight rows have zero inclusion probability by
            # definition (and a NULL priority would rank NULLS FIRST in
            # Spark but NULLS LAST in DuckDB)
            .filter(F.col("n_chars") > 0)
            .select("doc_id", "source", "n_chars",
                    F.expr(prio).alias("priority"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("doc_id", "source", "n_chars", "priority",
                    F.col("rank").cast("int").alias("rank")))


def weighted_sample_oracle_sql(k: int = PRIORITY_SAMPLE_K) -> str:
    from birli_spark.operators.sketches import _HEX32_SPACE, _hex32
    u = (f"CAST({_hex32(X.DUCK, 'md5(CAST(doc_id AS VARCHAR))')} AS DOUBLE)"
         f" / {_HEX32_SPACE!r}")
    return f"""
WITH scored AS (
  SELECT doc_id, source, n_chars,
    ({u}) / CAST(n_chars AS DOUBLE) AS priority
  FROM documents WHERE n_chars > 0)
SELECT doc_id, source, n_chars, priority,
  CAST(ROW_NUMBER() OVER (ORDER BY priority ASC, doc_id ASC) AS INT)
    AS rank
FROM scored
QUALIFY rank <= {k}"""


# ------------------------------------------------- classifier filter (T21) ---

CLF_BIAS = 2
CLF_RANGE = 17          # weights live in [-8, 8]


def _clf_weight(d: str, tok: str) -> str:
    """Deterministic per-token weight in [-8, 8]: two md5 hex digits →
    0..255, mod 17, minus 8 — the stand-in for a trained linear model's
    quantized weight table (the md5 IS the feature hasher, so there is
    no weight table to ship: the "model" evaluates in-row)."""
    h = f"md5({tok})"
    d1 = X._hexdigit(d, h, "1")
    d2 = X._hexdigit(d, h, "2")
    return f"(({d1} * 16 + {d2}) % {CLF_RANGE} - 8)"


def classifier_score(docs: DataFrame) -> DataFrame:
    """T21 — fasttext-style linear quality classifier: score =
    bias + Σ weight(hash(token)), keep = score > 0.

    This is the quality-classifier-filter stage of an LLM data pipeline
    (e.g. the CCNet/GPT-3 reproduction recipe: a linear model over
    hashed bag-of-words features gates every document). The Spark shape
    is the ideal one: a pure in-row array fold — no explode, no join, no
    shuffle; the classifier rides the corpus scan inside codegen, and at
    100 TB adds zero network cost. Integer weights make the score — and
    the keep/drop decision — bit-exact across engines."""
    d = X.SPARK
    toks = X.lfilter(d, X.toks(d), "t -> t <> ''")
    score = (f"aggregate({toks}, CAST({CLF_BIAS} AS BIGINT), "
             f"(acc, t) -> acc + {_clf_weight(d, 't')})")
    return docs.select(
        "doc_id",
        F.expr(f"CAST({X.size(d, toks)} AS BIGINT)").alias("n_toks"),
        F.expr(score).alias("clf_score"),
        F.expr(f"{score} > 0").alias("keep"))


def classifier_score_oracle_sql() -> str:
    d = X.DUCK
    toks = X.lfilter(d, X.toks(d), "t -> t <> ''")
    # integer weight sums commute, so transform→sum equals the Spark
    # fold exactly; COALESCE guards list_sum's NULL on empty lists
    score = (f"(CAST({CLF_BIAS} AS BIGINT) + COALESCE(list_sum("
             f"{X.ltransform(d, toks, f'''t -> {_clf_weight(d, 't')}''')}"
             f"), 0))")
    return f"""
SELECT doc_id,
  CAST({X.size(d, toks)} AS BIGINT) AS n_toks,
  CAST({score} AS BIGINT) AS clf_score,
  {score} > 0 AS keep
FROM documents"""


# --------------------------------------------------- domain mix plan (T22) ---

MIX_SCALE = 1_000_000    # parts-per-million fixed point


def domain_mix_plan(docs: DataFrame) -> DataFrame:
    """T22 — training-mix planner: allocate a corpus budget across
    sources by **square-root temperature sampling** (the multilingual /
    multi-domain rebalancing rule: weight ∝ √n dampens head domains and
    boosts the tail). Emits, per source: its document count, √n weight,
    exact ppm share of the plan, the planned document quota, and the
    per-source sampling rate to hit it.

    Scale shape: one map-side-combined groupBy(source) — domain
    cardinality, not corpus size, crosses the shuffle — then a broadcast
    of the one-row total. All outputs are integers (floor-√ and
    floor-division fixed point), so the plan is hash-exact."""
    per = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    per = per.withColumn("weight", F.expr(
        "CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE))) AS BIGINT)"))
    tot = per.agg(F.sum("weight").alias("sum_w"),
                  F.sum("n_docs").alias("total_docs"))
    j = per.crossJoin(F.broadcast(tot))
    return j.select(
        "source", "n_docs", "weight",
        F.expr(f"({MIX_SCALE} * weight) div sum_w").alias("mix_ppm"),
        F.expr(f"(total_docs * (({MIX_SCALE} * weight) div sum_w)) "
               f"div {MIX_SCALE}").alias("planned_docs"),
        F.expr(f"LEAST(CAST({MIX_SCALE} AS BIGINT), "
               f"({MIX_SCALE} * ((total_docs * "
               f"(({MIX_SCALE} * weight) div sum_w)) div {MIX_SCALE})) "
               f"div n_docs)").alias("rate_ppm"))


def domain_mix_plan_oracle_sql() -> str:
    return f"""
WITH per AS (
  SELECT source, COUNT(*) AS n_docs,
    CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS weight
  FROM documents GROUP BY source),
tot AS (SELECT SUM(weight) AS sum_w, SUM(n_docs) AS total_docs FROM per)
SELECT source, n_docs, weight,
  CAST(({MIX_SCALE} * weight) // sum_w AS BIGINT) AS mix_ppm,
  CAST((total_docs * (({MIX_SCALE} * weight) // sum_w)) // {MIX_SCALE}
    AS BIGINT) AS planned_docs,
  CAST(LEAST(CAST({MIX_SCALE} AS BIGINT),
    ({MIX_SCALE} * ((total_docs * (({MIX_SCALE} * weight) // sum_w))
     // {MIX_SCALE})) // n_docs) AS BIGINT) AS rate_ppm
FROM per CROSS JOIN tot"""


SEG_LEN = 4            #: tokens per non-overlapping segment
SEG_DUP_MIN_DOCS = 2   #: a segment in >= this many distinct docs is boilerplate


def segment_dedup(docs: DataFrame, seg_len: int = SEG_LEN,
                  min_docs: int = SEG_DUP_MIN_DOCS) -> DataFrame:
    """T23 — line/paragraph-level exact dedup (the C4 / RefinedWeb
    boilerplate-removal recipe, adapted to newline-free docs): split
    every document into non-overlapping ``seg_len``-token segments, drop
    any segment whose exact text occurs in ≥ ``min_docs`` distinct
    documents corpus-wide, and reassemble the survivors in original
    order. → (doc_id, n_segs, n_kept, clean_n_tokens, clean_md5).

    Scale shape: posexplode is a narrow per-row transform; the global
    segment-frequency aggregate groups on **md5(segment)** with map-side
    partials (segment-vocabulary cardinality crosses the shuffle, not
    corpus token volume); membership returns to the exploded table as a
    **left join on the same hash key** (co-partitioned with the
    aggregate output — one shuffle reused); reassembly is one
    groupBy(doc_id) whose order key rides inside a sortable struct. No
    UDFs anywhere — the whole plan is codegen + two hash shuffles.

    The per-document segmenter mirrors the reference's fixed-block
    averaging semantics (A1's ``t div avg_time`` bucketing,
    src/cli.rs:1171-1258): trailing partial blocks are real segments."""
    segs = docs.select(
        "doc_id",
        F.posexplode(F.expr(
            f"transform("
            f"  IF(size({X.toks(X.SPARK)}) >= 1,"
            f"     sequence(0, CAST(floor((size({X.toks(X.SPARK)}) - 1)"
            f"                            / {seg_len}) AS INT)),"
            f"     CAST(array() AS ARRAY<INT>)),"
            f"  i -> concat_ws(' ', slice({X.toks(X.SPARK)},"
            f"                            i * {seg_len} + 1, {seg_len})))"
        )).alias("pos", "seg"))
    segs = segs.withColumn("seg_h", F.md5("seg"))
    freq = (segs.groupBy("seg_h")
            .agg(F.countDistinct("doc_id").alias("seg_docs")))
    marked = (segs.join(freq, "seg_h")
              .withColumn("keep", F.col("seg_docs") < min_docs))
    return (marked.groupBy("doc_id")
            .agg(F.count("*").alias("n_segs"),
                 F.sum(F.expr("CAST(keep AS BIGINT)")).alias("n_kept"),
                 F.expr(
                     "aggregate(array_sort(collect_list("
                     "  IF(keep, struct(pos, seg), NULL))), "
                     "CAST(0 AS BIGINT), "
                     "(acc, s) -> acc + size(split(s.seg, ' ')))")
                 .alias("clean_n_tokens"),
                 F.md5(F.expr(
                     "concat_ws(' ', transform(array_sort(collect_list("
                     "  IF(keep, struct(pos, seg), NULL))), s -> s.seg))"))
                 .alias("clean_md5")))


def segment_dedup_oracle_sql(seg_len: int = SEG_LEN,
                             min_docs: int = SEG_DUP_MIN_DOCS) -> str:
    toks = X.toks(X.DUCK)
    return f"""
WITH segs AS (
  SELECT doc_id, i AS pos,
    array_to_string(({toks})[(i * {seg_len} + 1):(i * {seg_len} + {seg_len})],
                    ' ') AS seg
  FROM documents,
  LATERAL unnest(generate_series(
    0, CAST(floor((len({toks}) - 1) / {seg_len}) AS INT))) AS u(i)
  WHERE len({toks}) >= 1),
freq AS (
  SELECT md5(seg) AS seg_h, COUNT(DISTINCT doc_id) AS seg_docs
  FROM segs GROUP BY 1),
marked AS (
  SELECT s.doc_id, s.pos, s.seg, f.seg_docs < {min_docs} AS keep
  FROM segs s JOIN freq f ON md5(s.seg) = f.seg_h)
SELECT doc_id, COUNT(*) AS n_segs,
  CAST(SUM(CAST(keep AS BIGINT)) AS BIGINT) AS n_kept,
  CAST(COALESCE(SUM(CASE WHEN keep THEN len(string_split(seg, ' ')) END),
                0) AS BIGINT) AS clean_n_tokens,
  md5(COALESCE(string_agg(CASE WHEN keep THEN seg END, ' ' ORDER BY pos),
               '')) AS clean_md5
FROM marked GROUP BY doc_id"""


SEQ_LEN_TOKENS = 64    #: tokens per packed training sequence


def sequence_packing(docs: DataFrame,
                     seq_len: int = SEQ_LEN_TOKENS) -> DataFrame:
    """T24 — training-sequence packing plan ("concat then chop"): within
    each source shard, documents concatenate in doc_id order into one
    token stream that is chopped into fixed ``seq_len`` sequences; each
    document is assigned to the sequence (bin) where it *starts*.
    → (source, bin, n_docs, n_tokens, first_doc, last_doc) — the packing
    manifest an LLM data loader consumes.

    Scale shape: the running token count is a window cumsum partitioned
    by **source shard**, never a single global ordering — each shard's
    window sorts independently (the 100 TB packing recipe: shard first,
    pack within shards). One narrow projection (token count), one
    window, one partial-aggregated groupBy."""
    from pyspark.sql import Window
    n_tok = docs.select(
        "source", "doc_id",
        F.expr(X.size(X.SPARK, X.toks(X.SPARK))).alias("n_tokens"))
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    binned = n_tok.withColumn(
        "bin",
        ((F.sum("n_tokens").over(w) - F.col("n_tokens"))
         / seq_len).cast("bigint"))
    return (binned.groupBy("source", "bin")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"),
                 F.min("doc_id").alias("first_doc"),
                 F.max("doc_id").alias("last_doc")))


def sequence_packing_oracle_sql(seq_len: int = SEQ_LEN_TOKENS) -> str:
    toks = X.toks(X.DUCK)
    return f"""
WITH n_tok AS (
  SELECT source, doc_id, len({toks}) AS n_tokens FROM documents),
binned AS (
  SELECT source, doc_id, n_tokens,
    CAST((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          - n_tokens) // {seq_len} AS BIGINT) AS bin
  FROM n_tok)
SELECT source, bin, COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM binned GROUP BY source, bin"""


# -------------------------------------------- T26: exact substring dedup ---

SUBSTR_WINDOW = 20   #: duplicated-span detection granularity (tokens)


def substring_dedup(docs: DataFrame,
                    window: int = SUBSTR_WINDOW) -> DataFrame:
    """T26 — exact duplicated-substring detection (the windowed-hash
    approximation of Lee et al. 2022's suffix-array "Deduplicating
    Training Data" recipe): hash every overlapping ``window``-token
    span, mark spans whose exact text occurs more than once corpus-wide
    (within-doc repeats count), merge each document's marked windows
    into maximal duplicated spans, and report per-document span stats →
    (doc_id, n_tokens, n_dup_windows, n_spans, dup_tokens, max_span,
    dup_frac).

    Scale shape: the window table is corpus-token-scale — inherent to
    the algorithm (the suffix array it approximates is too) — but each
    row is only (doc_id, pos, md5): the frequency aggregate groups on
    the hash with map-side partials, and duplicate membership returns as
    a **left-semi join on the same hash key**, so the one expensive
    shuffle is reused co-partitioned. The island merge (window lag +
    running sum) runs per document over *duplicated* positions only —
    sparse on a clean corpus. All outputs are integers except dup_frac
    (one IEEE division of exact BIGINTs)."""
    from pyspark.sql import Window as W

    toks = X.toks(X.SPARK)
    sh = (docs.select(
            "doc_id",
            F.posexplode(F.expr(X.shingles(X.SPARK, toks, window)))
            .alias("pos", "win"))
          .select("doc_id", "pos", F.md5("win").alias("h")))
    dup_h = (sh.groupBy("h").agg(F.count("*").alias("cnt"))
             .filter(F.col("cnt") > 1))
    dup = sh.join(dup_h, "h", "left_semi")
    ordw = W.partitionBy("doc_id").orderBy("pos")
    runw = ordw.rowsBetween(W.unboundedPreceding, W.currentRow)
    isl = (dup
           .withColumn("brk", F.expr(
               f"CASE WHEN lag(pos) OVER (PARTITION BY doc_id "
               f"ORDER BY pos) IS NULL OR pos - lag(pos) OVER ("
               f"PARTITION BY doc_id ORDER BY pos) > {window} "
               f"THEN 1 ELSE 0 END"))
           .withColumn("island", F.sum("brk").over(runw)))
    spans = (isl.groupBy("doc_id", "island")
             .agg(F.count("*").alias("n_wins"),
                  (F.max("pos") + window - F.min("pos")).alias("span_len")))
    per_doc = (spans.groupBy("doc_id")
               .agg(F.sum("n_wins").alias("n_dup_windows"),
                    F.count("*").alias("n_spans"),
                    F.sum("span_len").alias("dup_tokens"),
                    F.max("span_len").alias("max_span")))
    base = docs.select("doc_id", F.expr(f"size({toks})").alias("n_tokens"))
    return (base.join(per_doc, "doc_id", "left")
            .select("doc_id", "n_tokens",
                    F.coalesce("n_dup_windows", F.lit(0)).cast("bigint")
                    .alias("n_dup_windows"),
                    F.coalesce("n_spans", F.lit(0)).cast("bigint")
                    .alias("n_spans"),
                    F.coalesce("dup_tokens", F.lit(0)).cast("bigint")
                    .alias("dup_tokens"),
                    F.coalesce("max_span", F.lit(0)).cast("bigint")
                    .alias("max_span"),
                    F.expr("CASE WHEN n_tokens = 0 THEN 0.0 ELSE "
                           "CAST(COALESCE(dup_tokens, 0) AS DOUBLE) / "
                           "CAST(n_tokens AS DOUBLE) END")
                    .alias("dup_frac")))


def substring_dedup_oracle_sql(window: int = SUBSTR_WINDOW) -> str:
    toks = X.toks(X.DUCK)
    return f"""
WITH sh AS (
  SELECT doc_id, u.i AS pos,
    md5(array_to_string(({toks})[(u.i + 1):(u.i + {window})], ' ')) AS h
  FROM documents,
  LATERAL unnest(generate_series(0, len({toks}) - {window})) AS u(i)),
dup AS (
  SELECT doc_id, pos FROM sh
  WHERE h IN (SELECT h FROM sh GROUP BY h HAVING COUNT(*) > 1)),
isl AS (
  SELECT doc_id, pos,
    SUM(CASE WHEN prev IS NULL OR pos - prev > {window} THEN 1 ELSE 0 END)
      OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM (SELECT doc_id, pos,
          lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM dup)),
spans AS (
  SELECT doc_id, island, COUNT(*) AS n_wins,
    MAX(pos) + {window} - MIN(pos) AS span_len
  FROM isl GROUP BY doc_id, island),
per_doc AS (
  SELECT doc_id, SUM(n_wins) AS n_dup_windows, COUNT(*) AS n_spans,
    SUM(span_len) AS dup_tokens, MAX(span_len) AS max_span
  FROM spans GROUP BY doc_id),
base AS (SELECT doc_id, len({toks}) AS n_tokens FROM documents)
SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
  CAST(COALESCE(n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
  CAST(COALESCE(n_spans, 0) AS BIGINT) AS n_spans,
  CAST(COALESCE(dup_tokens, 0) AS BIGINT) AS dup_tokens,
  CAST(COALESCE(max_span, 0) AS BIGINT) AS max_span,
  CASE WHEN b.n_tokens = 0 THEN 0.0 ELSE
    CAST(COALESCE(dup_tokens, 0) AS DOUBLE) / CAST(b.n_tokens AS DOUBLE)
  END AS dup_frac
FROM base b LEFT JOIN per_doc p ON b.doc_id = p.doc_id"""


# --------------------------------------- T28: leakage-safe dataset split ---

SPLIT_TRAIN_HEX = "c0000000"   # 0.75 of the 32-bit hash space
SPLIT_VAL_HEX = "e0000000"     # next 0.125; remainder = test


def leakage_safe_split(docs: DataFrame,
                       threshold: float = 0.5) -> DataFrame:
    """T28 — leakage-safe train/val/test split: assign each document a
    split by hashing its **near-dup cluster id** (D6's transitive
    MinHash-LSH components), never its own id — so a document and its
    near-duplicates can never straddle train and test (the eval-leakage
    failure mode a doc-id hash split silently has).
    → (doc_id, cluster_id, split).

    Scale shape: the expensive part IS D6 (dup-subgraph label
    propagation); the split itself is a pure projection on the
    assignment — deterministic md5 bucketing, no RNG, reproducible
    under repartitioning. Fractions are hex-space thresholds
    (0.75 / 0.125 / 0.125)."""
    asg = dedup.neardup_clusters(docs, threshold) \
               .select("doc_id", "cluster_id")
    bucket = "substring(md5(CAST(cluster_id AS STRING)), 1, 8)"
    return asg.select(
        "doc_id", "cluster_id",
        F.expr(f"CASE WHEN {bucket} < '{SPLIT_TRAIN_HEX}' THEN 'train' "
               f"WHEN {bucket} < '{SPLIT_VAL_HEX}' THEN 'val' "
               f"ELSE 'test' END").alias("split"))


def leakage_safe_split_oracle_sql(threshold: float = 0.5) -> str:
    bucket = "substring(md5(CAST(cluster_id AS VARCHAR)), 1, 8)"
    return f"""
SELECT doc_id, cluster_id,
  CASE WHEN {bucket} < '{SPLIT_TRAIN_HEX}' THEN 'train'
       WHEN {bucket} < '{SPLIT_VAL_HEX}' THEN 'val'
       ELSE 'test' END AS split
FROM ({dedup.neardup_clusters_oracle_sql(threshold)})"""
