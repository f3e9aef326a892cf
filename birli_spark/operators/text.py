"""Text-analysis operators for the training-data pipeline (beyond the
reference's operator set; north-star requirement): token statistics /
quality scoring, language identification, and document fingerprinting over
the ``documents`` table.

All three are **pure per-row projections** built from
:mod:`birli_spark.functions.textsql` fragments — no UDF, no shuffle; at
100 TB they pipeline inside whole-stage codegen directly over the parquet
scan with column pruning (only ``doc_id``/``text``/``lang`` are read).
Each has an exact DuckDB oracle built from the same expression tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from birli_spark.functions import textsql as X
from birli_spark.functions.complex import f32

#: stopword marker lists per language for the n-gram/stopword heuristic
#: language ID. Order = argmax tie-break precedence.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "les", "des", "une", "et"),
    "de": ("der", "die", "das", "und", "ist"),
    "zh": ("shi", "zai", "he", "wo", "ni"),
}

EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def _in_list(var: str, words: tuple[str, ...]) -> str:
    lits = ", ".join(f"'{w}'" for w in words)
    return f"{var} IN ({lits})"


def _stats_exprs(d: str) -> dict[str, str]:
    t = X.toks(d)
    n = X.size(d, t)
    n_uniq = X.size(d, X.distinct(d, t))
    n_stop = X.size(d, X.lfilter(d, t, f"t -> {_in_list('t', EN_STOPWORDS)}"))
    stop_ratio = f"CAST({n_stop} AS DOUBLE) / {n}"
    uniq_ratio = f"CAST({n_uniq} AS DOUBLE) / {n}"
    # single-space-joined text: total token chars = len - (n-1) separators
    mean_len = f"CAST(length(trim(text)) - ({n}) + 1 AS DOUBLE) / {n}"
    # BPE-ish subtoken estimate: ceil(len/4) pieces per word (~4 chars per
    # merged piece, the usual BPE average) — integer-exact in both engines
    piece = "x -> CAST(FLOOR((length(x) + 3) / 4) AS INT)"
    pieces = X.ltransform(d, t, piece)
    if d == X.SPARK:
        n_sub = f"aggregate({pieces}, 0, (a, x) -> a + x)"
    else:
        n_sub = f"CAST(list_sum({pieces}) AS INT)"
    quality = f32(
        f"CAST(0.4 AS DOUBLE) * ({uniq_ratio}) "
        f"+ CAST(0.4 AS DOUBLE) * (CAST(1 AS DOUBLE) - ({stop_ratio})) "
        f"+ CAST(0.2 AS DOUBLE) * LEAST(CAST({n} AS DOUBLE) / CAST(100 AS DOUBLE), CAST(1 AS DOUBLE))")
    return {
        "n_tokens": f"CAST({n} AS INT)",
        "n_subtokens": n_sub,
        "n_unique": f"CAST({n_uniq} AS INT)",
        "stopword_ratio": stop_ratio,
        "uniq_ratio": uniq_ratio,
        "mean_token_len": mean_len,
        "quality_score": quality,
    }


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-document token counts + quality score (length/stopword/diversity
    mix — the standard pretraining-corpus quality heuristics)."""
    ex = _stats_exprs(X.SPARK)
    return docs.select(
        "doc_id", *[F.expr(e).alias(c) for c, e in ex.items()])


def token_stats_oracle_sql() -> str:
    ex = _stats_exprs(X.DUCK)
    cols = ",\n  ".join(f"{e} AS {c}" for c, e in ex.items())
    return f"SELECT doc_id,\n  {cols}\nFROM documents"


def _lang_exprs(d: str) -> dict[str, str]:
    t = X.toks(d)
    out: dict[str, str] = {}
    for lang, words in LANG_MARKERS.items():
        cnt = X.size(d, X.lfilter(d, t, f"t -> {_in_list('t', words)}"))
        out[f"score_{lang}"] = f"CAST({cnt} AS INT)"
    scores = [f"score_{lang}" for lang in LANG_MARKERS]
    best = f"GREATEST({', '.join(scores)})"
    pred = "CASE "
    for lang in LANG_MARKERS:  # dict order = precedence on ties
        pred += f"WHEN score_{lang} = {best} AND score_{lang} > 0 THEN '{lang}' "
    pred += "ELSE 'und' END"
    out["pred_lang"] = pred
    return out


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-marker language ID: count per-language marker tokens,
    predict the argmax (ties broken by fixed precedence, zero evidence →
    'und'). A charset rule (CJK/accents) would extend this for non-Latin
    corpora; the synthetic corpus is ASCII so marker counts decide."""
    ex = _lang_exprs(X.SPARK)
    score_cols = [c for c in ex if c.startswith("score_")]
    scored = docs.select(
        "doc_id", "lang", *[F.expr(ex[c]).alias(c) for c in score_cols])
    return scored.select(
        "doc_id", "lang", *score_cols, F.expr(ex["pred_lang"]).alias("pred_lang"))


def lang_id_oracle_sql() -> str:
    ex = _lang_exprs(X.DUCK)
    score_cols = [c for c in ex if c.startswith("score_")]
    inner = ",\n    ".join(f"{ex[c]} AS {c}" for c in score_cols)
    return (f"WITH scored AS (\n  SELECT doc_id, lang,\n    {inner}\n"
            f"  FROM documents)\n"
            f"SELECT doc_id, lang, {', '.join(score_cols)},\n"
            f"  {ex['pred_lang']} AS pred_lang\nFROM scored")


SHINGLE_N = 3
_RH_BASE = 131
_RH_MOD = 1_000_000_007


def _rolling_hash(d: str, col: str = "text") -> str:
    """Rabin-Karp polynomial rolling hash over the character codes:
    ``h = (h * 131 + code) mod 1e9+7`` — a sequential integer fold,
    bit-identical across engines. (DuckDB's list_reduce has no init
    argument; prepending 0 makes the first element the seed.)"""
    if d == X.SPARK:
        codes = f"transform(split({col}, ''), c -> CAST(ascii(c) AS BIGINT))"
        return (f"aggregate({codes}, CAST(0 AS BIGINT), "
                f"(acc, c) -> (acc * {_RH_BASE} + c) % {_RH_MOD})")
    codes = (f"list_transform(string_split({col}, ''), "
             f"c -> CAST(ascii(c) AS BIGINT))")
    return (f"list_reduce(list_prepend(CAST(0 AS BIGINT), {codes}), "
            f"(acc, c) -> (acc * {_RH_BASE} + c) % {_RH_MOD})")


def _fp_exprs(d: str) -> dict[str, str]:
    sh = X.shingles(d, X.toks(d), SHINGLE_N)
    hashed = X.ltransform(d, sh, f"s -> {X.minhash16('s', 0)}")
    return {
        "n_shingles": f"CAST({X.size(d, sh)} AS INT)",
        "fingerprint": X.arr_min(d, hashed),
        "rolling_hash": _rolling_hash(d),
    }


def fingerprint(docs: DataFrame) -> DataFrame:
    """Rolling-window document fingerprint: the minimum seeded hash over
    all 3-token shingles (= the seed-0 MinHash signature). Equal
    fingerprints ⇒ high shingle overlap; used as a cheap first-pass
    near-dup key. Fixed-width hex keeps MIN() order-correct."""
    ex = _fp_exprs(X.SPARK)
    return docs.select("doc_id", *[F.expr(e).alias(c) for c, e in ex.items()])


def fingerprint_oracle_sql() -> str:
    ex = _fp_exprs(X.DUCK)
    cols = ",\n  ".join(f"{e} AS {c}" for c, e in ex.items())
    return f"SELECT doc_id,\n  {cols}\nFROM documents"


def source_quality_rollup(docs: DataFrame) -> DataFrame:
    """Per-(source, lang) corpus quality rollup: doc counts, char sums,
    f32 mean quality, median doc length — the dataset-curation dashboard
    aggregate. One partial-aggregating groupBy; the quality score is the
    same per-row projection as :func:`token_stats`, fused into the scan."""
    q = _stats_exprs(X.SPARK)["quality_score"]
    # AVG over doubles is partial-merge-order dependent (flaky vs the
    # oracle); sum integer ticks instead — BIGINT addition commutes.
    qt = f"CAST(round(({q}) * CAST(1000000000 AS DOUBLE)) AS BIGINT)"
    scored = docs.select("source", "lang", "n_chars", F.expr(qt).alias("qt"))
    return (scored.groupBy("source", "lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 F.expr(f32("CAST(SUM(qt) AS DOUBLE) / COUNT(*) "
                            "/ CAST(1000000000 AS DOUBLE)"))
                  .alias("avg_quality"),
                 F.expr(f32("CAST(percentile(n_chars, 0.5) AS DOUBLE)"))
                  .alias("median_chars")))


def source_quality_rollup_oracle_sql() -> str:
    q = _stats_exprs(X.DUCK)["quality_score"]
    qt = f"CAST(round(({q}) * CAST(1000000000 AS DOUBLE)) AS BIGINT)"
    return f"""
WITH scored AS (SELECT source, lang, n_chars, {qt} AS qt FROM documents)
SELECT source, lang, COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  {f32('CAST(SUM(qt) AS DOUBLE) / COUNT(*) / CAST(1000000000 AS DOUBLE)')} AS avg_quality,
  {f32('CAST(quantile_cont(n_chars, 0.5) AS DOUBLE)')} AS median_chars
FROM scored GROUP BY source, lang"""


VOCAB_TOP_N = 200


def vocab_stats(docs: DataFrame, top_n: int = VOCAB_TOP_N) -> DataFrame:
    """Corpus vocabulary table: per-term total frequency, document
    frequency, and frequency rank — the vocabulary-building aggregate of
    a tokenizer-training pipeline.

    Scale shape: one explode over the scan (narrow), one
    partial-aggregated groupBy(term) — term cardinality, not corpus
    size, crosses the shuffle — then the rank window runs on the tiny
    aggregated term table. All-integer outputs make the oracle exact."""
    from pyspark.sql import Window
    tok = docs.select(
        "doc_id", F.explode(F.expr(X.toks(X.SPARK))).alias("term"))
    agg = (tok.filter(F.col("term") != "")
           .groupBy("term")
           .agg(F.count("*").alias("tf_total"),
                F.countDistinct("doc_id").alias("df")))
    w = Window.orderBy(F.desc("tf_total"), F.asc("term"))
    return (agg.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_n))


def vocab_stats_oracle_sql(top_n: int = VOCAB_TOP_N) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({X.toks(X.DUCK)}) AS term
  FROM documents),
agg AS (
  SELECT term, COUNT(*) AS tf_total, COUNT(DISTINCT doc_id) AS df
  FROM tok WHERE term <> '' GROUP BY term),
ranked AS (
  SELECT term, tf_total, df,
         ROW_NUMBER() OVER (ORDER BY tf_total DESC, term ASC) AS rank
  FROM agg)
SELECT term, tf_total, df, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {top_n}"""


def rarity_stats(docs: DataFrame) -> DataFrame:
    """T13 — per-document token-rarity profile against the corpus
    vocabulary: how many token instances are hapax (df = 1), the summed
    and maximum document frequency, and the distinct-token count. The
    rare-token signal curation pipelines use next to length/stopword
    quality scores — and all-integer outputs, so the oracle is exact
    with no float-accumulation exposure.

    Scale shape: explode tokens (narrow) → groupBy(term) df (term
    cardinality crosses the shuffle, with map-side partials) → join the
    df table back to the token stream on term → per-doc aggregate. The
    vocabulary of a 100 TB corpus is *not* broadcast-sized, so the
    term join is a correctly big-big sort-merge/AQE join; the per-doc
    aggregate reuses nothing wider than (doc_id, df) rows."""
    tok = (docs.select(
        "doc_id", F.explode(F.expr(X.toks(X.SPARK))).alias("term"))
        .filter(F.col("term") != ""))
    df_tab = tok.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"))
    return (tok.join(df_tab, "term")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.countDistinct("term").alias("n_distinct"),
                 F.sum(F.expr("CAST(df = 1 AS BIGINT)")).alias("n_hapax"),
                 F.sum("df").alias("sum_df"),
                 F.max("df").alias("max_df")))


def rarity_stats_oracle_sql() -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({X.toks(X.DUCK)}) AS term
  FROM documents),
t AS (SELECT doc_id, term FROM tok WHERE term <> ''),
dfs AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY term)
SELECT doc_id, COUNT(*) AS n_tokens,
  COUNT(DISTINCT t.term) AS n_distinct,
  CAST(SUM(CAST(df = 1 AS BIGINT)) AS BIGINT) AS n_hapax,
  CAST(SUM(df) AS BIGINT) AS sum_df, MAX(df) AS max_df
FROM t JOIN dfs ON t.term = dfs.term
GROUP BY doc_id"""


TFIDF_TOP_K = 3


def tfidf_top_terms(docs: DataFrame, k: int = TFIDF_TOP_K) -> DataFrame:
    """Per-document top-k TF-IDF terms — the classic relevance/keyword
    feature of a curation pipeline: ``tfidf = tf * ln(N / df)``.

    Scale shape: one explode over the scan (narrow), a partial-aggregated
    groupBy(doc_id, term) for tf, a partial-aggregated groupBy(term) for
    df (term-cardinality sized — broadcast back onto tf), the corpus
    count N folded in as a literal, and the top-k window partitioned by
    doc_id. The float product is demoted through f32 so
    the score (and its ORDER BY) is bit-identical across engines; ties
    break on the term string."""
    from pyspark.sql import Window
    tok = (docs.select("doc_id",
                       F.explode(F.expr(X.toks(X.SPARK))).alias("term"))
           .filter(F.col("term") != ""))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dft = tf.groupBy("term").agg(F.count("*").alias("df"))
    # corpus size resolved up front (a parquet-metadata-cheap count) and
    # folded in as a literal — keeps the scoring plan free of the
    # single-row nested-loop cross a scalar-subquery join would add
    n_docs = docs.count()
    scored = (tf.join(F.broadcast(dft), "term")
              .withColumn("tfidf", F.expr(f32(
                  f"CAST(tf AS DOUBLE) * LN(CAST({n_docs} AS DOUBLE) / df)"))))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("doc_id", "term", "tf", "df", "tfidf", "rnk"))


def tfidf_oracle_sql(k: int = TFIDF_TOP_K) -> str:
    score = f32("CAST(tf AS DOUBLE) * LN(CAST(n_docs AS DOUBLE) / df)")
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({X.toks(X.DUCK)}) AS term
  FROM documents),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM tok WHERE term <> '' GROUP BY 1, 2),
dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf, d.df, {score} AS tfidf
  FROM tf t JOIN dft d USING (term) CROSS JOIN n),
ranked AS (
  SELECT doc_id, term, tf, df, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC) AS rnk
  FROM scored)
SELECT doc_id, term, tf, df, tfidf, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= {k}"""


QUANTILE_PS = (0.25, 0.5, 0.9)


def length_quantiles(docs: DataFrame) -> DataFrame:
    """Exact per-language document-length quantiles (p25/p50/p90 of
    ``n_chars``) — the length-distribution profile a curation pipeline
    checks before choosing truncation budgets.

    Uses Spark's exact ``percentile`` (linear interpolation, identical to
    DuckDB ``quantile_cont``; sort-based within each group). At 100 TB
    the exact sort is the correctness reference; the production path
    swaps in ``percentile_approx`` (mergeable KLL-style sketch, pure
    partial aggregation) when per-group sorts dominate.
    """
    ps = ", ".join(f"CAST({p} AS DOUBLE)" for p in QUANTILE_PS)
    return (docs.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.expr(f"percentile(n_chars, array({ps}))").alias("q"))
            .select("lang", "n_docs",
                    F.expr("q[0]").alias("p25_chars"),
                    F.expr("q[1]").alias("p50_chars"),
                    F.expr("q[2]").alias("p90_chars")))


def length_quantiles_oracle_sql() -> str:
    cols = ",\n  ".join(
        f"quantile_cont(n_chars, CAST({p} AS DOUBLE)) AS p{int(p * 100)}_chars"
        for p in QUANTILE_PS)
    return f"""
SELECT lang, COUNT(*) AS n_docs,
  {cols}
FROM documents GROUP BY lang"""


BIGRAM_TOP_K = 5


def top_bigrams(docs: DataFrame, k: int = BIGRAM_TOP_K) -> DataFrame:
    """Top-k adjacent token bigrams per language — the collocation
    profile of a tokenizer/quality pipeline.

    Bigrams come from zipping the token array with its tail (a pure
    projection, no UDF); the count is one partial-aggregating shuffle on
    (lang, bigram); the top-k is a per-lang window over the (small)
    distinct-bigram aggregate. Ties break lexicographically so ranks are
    deterministic cross-engine.
    """
    from pyspark.sql import Window
    counted = (docs
               .select("lang", F.explode(F.expr(
                   X.bigrams(X.SPARK, X.toks(X.SPARK)))).alias("bigram"))
               .groupBy("lang", "bigram")
               .agg(F.count("*").alias("n_occurrences")))
    w = Window.partitionBy("lang").orderBy(
        F.desc("n_occurrences"), F.asc("bigram"))
    return (counted.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("lang", "bigram", "n_occurrences",
                    F.col("rank").cast("int").alias("rank")))


def top_bigrams_oracle_sql(k: int = BIGRAM_TOP_K) -> str:
    return f"""
WITH bigrams AS (
  SELECT lang, unnest({X.bigrams(X.DUCK, X.toks(X.DUCK))}) AS bigram
  FROM documents),
counted AS (
  SELECT lang, bigram, COUNT(*) AS n_occurrences
  FROM bigrams GROUP BY lang, bigram),
ranked AS (
  SELECT lang, bigram, n_occurrences,
    ROW_NUMBER() OVER (PARTITION BY lang
                       ORDER BY n_occurrences DESC, bigram ASC) AS rank
  FROM counted)
SELECT lang, bigram, n_occurrences, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}"""


#: denylist for the redaction pass — stands in for PII patterns (emails,
#: phone numbers), which the synthetic corpus doesn't contain; the
#: pattern machinery (regexp_count + global regexp_replace, both
#: JVM-side) is exactly what a real PII scrub uses.
REDACT_TOKENS = ("the", "and", "of", "to", "in")
REDACT_PATTERN = r"\b(" + "|".join(REDACT_TOKENS) + r")\b"
REDACT_WITH = "<REDACTED>"


def redact(docs: DataFrame) -> DataFrame:
    """T11 — redaction pass: replace every denylisted-token occurrence,
    reporting the per-document match count and the content hash of the
    scrubbed text. Pure narrow projection (two regex expressions fused
    into the scan) — zero shuffle; a PII scrub at 100 TB is exactly this
    shape with heavier patterns.
    """
    # Column-API regex calls (not F.expr): a SQL string literal would
    # eat the \b escapes
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(REDACT_PATTERN)).cast("int")
         .alias("n_redacted"),
        F.md5(F.regexp_replace("text", REDACT_PATTERN, REDACT_WITH))
         .alias("redacted_md5"))


def redact_oracle_sql() -> str:
    return f"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{REDACT_PATTERN}')) AS INT)
    AS n_redacted,
  md5(regexp_replace(text, '{REDACT_PATTERN}', '{REDACT_WITH}', 'g'))
    AS redacted_md5
FROM documents"""


#: real PII pattern classes (t30) — deliberately lookahead-free so the
#: same text compiles identically under Java regex (Spark) and RE2
#: (DuckDB): emails, dotted-quad IPv4, and international-ish phone
#: numbers (8+ digits with separators)
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"),
    ("phone", r"\+[0-9][0-9 ()-]{6,}[0-9]"),
)


def pii_scrub(docs: DataFrame) -> DataFrame:
    """T30 — multi-class PII scrub (the production form of T11's
    denylist pass): per-document match counts per class (emails, IPv4
    addresses, phone numbers) and the content hash of the fully
    scrubbed text, each class replaced by its own typed token. Pure
    narrow projection fused into the scan — zero shuffle at any scale;
    the class patterns are lookahead-free so Spark's Java regex and the
    oracle's RE2 agree match-for-match."""
    counts = [
        F.regexp_count("text", F.lit(pat)).cast("int").alias(f"n_{name}")
        for name, pat in PII_PATTERNS]
    scrubbed = F.col("text")
    for name, pat in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    return docs.select("doc_id", *counts,
                       F.md5(scrubbed).alias("scrubbed_md5"))


def pii_scrub_oracle_sql() -> str:
    counts = ",\n  ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS INT) AS n_{name}"
        for name, pat in PII_PATTERNS)
    scrubbed = "text"
    for name, pat in PII_PATTERNS:
        scrubbed = (f"regexp_replace({scrubbed}, '{pat}',"
                    f" '<{name.upper()}>', 'g')")
    return f"""
SELECT doc_id,
  {counts},
  md5({scrubbed}) AS scrubbed_md5
FROM documents"""


def _dup_frac(d: str, n: int) -> str:
    """Fraction of n-token shingles that are repeats of an earlier shingle
    in the same document (Gopher-style repetition signal): 1 − distinct/total,
    0.0 for documents too short to have any shingle."""
    sh = X.shingles(d, X.toks(d), n)
    m = X.size(d, sh)
    uniq = X.size(d, X.distinct(d, sh))
    return (f"CASE WHEN {m} > 0 THEN CAST(1 AS DOUBLE) "
            f"- CAST({uniq} AS DOUBLE) / CAST({m} AS DOUBLE) "
            f"ELSE CAST(0 AS DOUBLE) END")


def _rep_exprs(d: str) -> dict[str, str]:
    t = X.toks(d)
    n = X.size(d, t)
    counts = X.ltransform(
        d, X.distinct(d, t),
        f"x -> {X.size(d, X.lfilter(d, t, 'w -> w = x'))}")
    top_frac = (f"CAST({X.arr_max(d, counts)} AS DOUBLE) "
                f"/ CAST({n} AS DOUBLE)")
    return {
        "n_tokens": f"CAST({n} AS INT)",
        "top_token_frac": f32(top_frac),
        "dup_bigram_frac": f32(_dup_frac(d, 2)),
        "dup_trigram_frac": f32(_dup_frac(d, 3)),
    }


def repetition_stats(docs: DataFrame) -> DataFrame:
    """T12 — within-document repetition signals (the Gopher quality-filter
    family: most-frequent-token share, duplicate bi-/tri-gram share).

    Pure narrow projection over the scan — no shuffle, no UDF; the
    per-row cost is O(distinct_tokens × tokens) string compares, bounded
    by document length, and whole-stage-codegens at 100 TB. Fractions are
    f32-demoted so distributed evaluation hash-matches the oracle.
    """
    e = _rep_exprs(X.SPARK)
    return docs.select(
        "doc_id", *[F.expr(v).alias(k) for k, v in e.items()])


def repetition_oracle_sql() -> str:
    e = _rep_exprs(X.DUCK)
    cols = ",\n  ".join(f"{v} AS {k}" for k, v in e.items())
    return f"SELECT doc_id,\n  {cols}\nFROM documents"


# ------------------------------------- composite quality filter (T14) ---

#: Gopher-style keep/drop thresholds (Rae et al. 2021 table A1 spirit,
#: tuned to the synthetic corpus ranges). Each rule is a named boolean so
#: the output explains WHY a document was dropped.
QF_RULES: tuple[tuple[str, str], ...] = (
    ("ok_min_tokens", "{n_tokens} >= 10"),
    ("ok_max_tokens", "{n_tokens} <= 5000"),
    ("ok_mean_len", "({mean_token_len}) >= CAST(2 AS DOUBLE) "
                    "AND ({mean_token_len}) <= CAST(12 AS DOUBLE)"),
    ("ok_stopwords", "({stopword_ratio}) >= CAST(0.01 AS DOUBLE)"),
    ("ok_uniq", "({uniq_ratio}) >= CAST(0.3 AS DOUBLE)"),
    ("ok_top_token", "({top_token_frac}) <= CAST(0.2 AS DOUBLE)"),
    ("ok_dup_trigram", "({dup_trigram_frac}) <= CAST(0.3 AS DOUBLE)"),
)


def _qf_exprs(d: str) -> dict[str, str]:
    parts = dict(_stats_exprs(d))
    parts.update(_rep_exprs(d))
    out = {name: tmpl.format(**parts) for name, tmpl in QF_RULES}
    out["keep"] = " AND ".join(f"({e})" for e in out.values())
    return out


def quality_filter(docs: DataFrame) -> DataFrame:
    """T14 — the composite Gopher-style document filter: every rule as a
    named boolean plus the conjunction ``keep``.

    Like T1/T12 this is a pure per-row projection (no shuffle, no UDF,
    whole-stage codegen over the scan); at 100 TB the downstream corpus
    write is ``.filter("keep")`` which pushes straight into the scan. The
    rule columns make the filter auditable — per-source drop-reason
    rollups are one groupBy away."""
    e = _qf_exprs(X.SPARK)
    return docs.select(
        "doc_id", *[F.expr(v).alias(k) for k, v in e.items()])


def quality_filter_oracle_sql() -> str:
    e = _qf_exprs(X.DUCK)
    cols = ",\n  ".join(f"{v} AS {k}" for k, v in e.items())
    return f"SELECT doc_id,\n  {cols}\nFROM documents"


# --------------------------------- unigram-LM cross-entropy score (T15) ---

def _tok_table(d: str) -> str:
    """(doc_id, tok) long stream: explode/unnest of the whitespace split."""
    if d == X.SPARK:
        return (f"SELECT doc_id, explode({X.toks(X.SPARK)}) AS tok "
                f"FROM {{docs}}")
    return (f"SELECT doc_id, unnest({X.toks(X.DUCK)}) AS tok "
            f"FROM documents")


#: fractional bits of the fixed-point log2 ticks (X.log2fix_cols)
_LM_NBITS = 24


def _log2fix_ticks(df: DataFrame, cnt: str, out: str,
                   nbits: int = _LM_NBITS) -> DataFrame:
    """Spark-side fixed-point log2 (see X.log2fix_cols for the algorithm
    and the determinism rationale). The oracle's single-SELECT lateral
    chain trips Spark's analyzer iteration cap at 24 bits, so here each
    squaring step is its own projection node; Catalyst's CollapseProject
    keeps non-cheap duplicated refs un-inlined, so the plan stays linear
    and whole-stage codegen fuses the steps anyway."""
    df = (df
          .withColumn("__b", F.expr(f"CAST(length(bin({cnt})) - 1 AS INT)"))
          .withColumn("__m", F.expr(
              f"CAST({cnt} AS DOUBLE) / "
              f"CAST(shiftleft(CAST(1 AS BIGINT), __b) AS DOUBLE)"))
          .withColumn("__a", F.expr("CAST(0 AS BIGINT)")))
    for _ in range(nbits):
        df = (df
              .withColumn("__s", F.expr("__m * __m"))
              .withColumn("__m", F.expr(
                  "CASE WHEN __s >= 2.0 THEN __s * 0.5 ELSE __s END"))
              .withColumn("__a", F.expr(
                  "__a * 2 + CASE WHEN __s >= 2.0 THEN 1 ELSE 0 END")))
    return (df
            .withColumn(out, F.expr(
                f"CAST(__b AS BIGINT) * {1 << nbits} + __a"))
            .drop("__b", "__m", "__a", "__s"))


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """T15 — corpus-unigram cross-entropy per document: train a unigram
    LM on the corpus itself (P(w) = count(w)/total) and score every doc by
    average ``-log2 P(token)`` (bits/token). Low bits = templated/common
    text, high bits = rare-token soup; both tails are the classic
    perplexity-style quality cut.

    Plan shape at 100 TB: the token stream is a narrow flatMap off the
    scan (never materialized); the LM is one map-side-combined groupBy
    down to vocab size (millions of rows, ~MBs — broadcastable); scoring
    re-streams tokens, broadcast-joins the LM, and reduces per doc with a
    partial agg. Two scans of ``text``, one wide shuffle of (vocab) +
    one of (doc_id) partial sums — no row-level state.

    Determinism: libm ``log2`` differs across engines in the last ulps,
    so per-token bits come from the **fixed-point log2**
    (:func:`birli_spark.functions.textsql.log2fix_cols` — IEEE-exact
    squaring, bit-identical everywhere), computed once per vocab row and
    summed per doc as exact BIGINT ticks.
    """
    exploded = docs.select("doc_id", F.explode(F.expr(X.toks(X.SPARK))).alias("tok"))
    lm = _log2fix_ticks(
        exploded.groupBy("tok").agg(F.count("*").alias("cnt")),
        "cnt", "ticks").select("tok", "ticks")
    total = exploded.count()
    total_ticks = X.log2fix_py(total, _LM_NBITS)
    scored = (exploded
              .join(F.broadcast(lm), "tok")
              .groupBy("doc_id")
              .agg(F.count("*").alias("n_tokens"),
                   F.sum("ticks").alias("sum_ticks")))
    bits = (f"(CAST({total_ticks} AS DOUBLE) "
            f"- CAST(sum_ticks AS DOUBLE) / CAST(n_tokens AS DOUBLE)) "
            f"/ CAST({1 << _LM_NBITS} AS DOUBLE)")
    return scored.select(
        "doc_id", F.col("n_tokens").cast("int").alias("n_tokens"),
        F.expr(f32(bits)).alias("bits_per_token"))


def unigram_logprob_oracle_sql() -> str:
    bits = (f"(CAST((SELECT ticks FROM tot) AS DOUBLE) "
            f"- CAST(sum_ticks AS DOUBLE) / CAST(n_tokens AS DOUBLE)) "
            f"/ CAST({1 << _LM_NBITS} AS DOUBLE)")
    lm_sql = X.log2fix_duck_sql(
        "SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok",
        "cnt", "ticks", ["tok"], _LM_NBITS)
    tot_sql = X.log2fix_duck_sql(
        "SELECT COUNT(*) AS c FROM toks", "c", "ticks", [], _LM_NBITS)
    return f"""
WITH toks AS ({_tok_table(X.DUCK)}),
lm AS ({lm_sql}),
tot AS ({tot_sql}),
scored AS (
  SELECT t.doc_id, COUNT(*) AS n_tokens, SUM(lm.ticks) AS sum_ticks
  FROM toks t JOIN lm USING (tok) GROUP BY t.doc_id)
SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
  {f32(bits)} AS bits_per_token
FROM scored"""


BPE_TOP_N = 50


def bpe_pair_stats(docs: DataFrame, top_n: int = BPE_TOP_N) -> DataFrame:
    """T16 — the counting step of BPE tokenizer training: frequency of
    every adjacent character pair, aggregated corpus-wide, top-N merge
    candidates.

    The BPE trick that makes this scale: pair counts are computed over
    the **distinct-word table weighted by word frequency**, never over
    the raw token stream — the corpus collapses to vocab size in one
    map-side-combined groupBy before any character-level work happens.
    At 100 TB the char-pair explode touches millions of vocab rows, not
    trillions of tokens. All-integer output; ties rank by pair text."""
    from pyspark.sql import Window
    words = (docs
             .select(F.explode(F.expr(X.toks(X.SPARK))).alias("word"))
             .filter(F.col("word") != "")
             .groupBy("word").agg(F.count("*").alias("wfreq")))
    pairs = (words
             .select("wfreq", F.explode(F.expr(X.ltransform(
                 X.SPARK, X.seq(X.SPARK, "1", "length(word) - 1"),
                 "i -> substr(word, i, 2)"))).alias("pair"))
             .groupBy("pair")
             .agg(F.count("*").alias("n_words"),
                  F.sum("wfreq").alias("total_count")))
    w = Window.orderBy(F.desc("total_count"), F.asc("pair"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_n))


def bpe_pair_stats_oracle_sql(top_n: int = BPE_TOP_N) -> str:
    return f"""
WITH words AS (
  SELECT word, COUNT(*) AS wfreq FROM (
    SELECT unnest({X.toks(X.DUCK)}) AS word FROM documents)
  WHERE word <> '' GROUP BY word),
pairs AS (
  SELECT pair, COUNT(*) AS n_words,
    CAST(SUM(wfreq) AS BIGINT) AS total_count FROM (
    SELECT wfreq, unnest(list_transform(range(1, length(word)),
                                        i -> substr(word, i, 2))) AS pair
    FROM words)
  GROUP BY pair)
SELECT pair, n_words, total_count,
  CAST(ROW_NUMBER() OVER (ORDER BY total_count DESC, pair ASC)
    AS INT) AS rank
FROM pairs
QUALIFY rank <= {top_n}"""


CHUNK_SIZE = 32
CHUNK_STRIDE = 24


def chunk_documents(docs: DataFrame, spark,
                    size: int = CHUNK_SIZE,
                    stride: int = CHUNK_STRIDE) -> DataFrame:
    """T17 — RAG-style document chunking as a **Python UDTF** (the
    table-function API surface): each document yields overlapping
    token windows of ``size`` tokens every ``stride`` (the final window
    is the first one reaching the document end; short docs yield one).

    The UDTF runs as a lateral join — a controlled explode whose output
    grain is chunks, the same narrow no-shuffle shape as the built-in
    ``explode`` operators; rows never come back to the driver. (The
    built-in-function composition in :func:`fingerprint` shows the
    pure-SQL equivalent; this variant exists to cover the UDTF API with
    an operator whose per-row logic is genuinely iterative.) Chunk text
    hashes (md5) keep the oracle compact."""
    from pyspark.sql.functions import udtf

    @udtf(returnType=("doc_id bigint, chunk_idx int, n_tokens int, "
                      "chunk_md5 string"))
    class ChunkDoc:
        def eval(self, doc_id: int, text: str):
            import hashlib
            toks = [t for t in text.strip().split(" ") if t != ""]
            n = len(toks)
            start = idx = 0
            while True:
                piece = toks[start:start + size]
                yield (doc_id, idx,
                       len(piece),
                       hashlib.md5(" ".join(piece).encode()).hexdigest())
                if start + size >= n:
                    break
                start += stride
                idx += 1

    spark.udtf.register("chunk_doc", ChunkDoc)
    docs.createOrReplaceTempView("__chunk_docs_in")
    return spark.sql(
        "SELECT c.doc_id, c.chunk_idx, c.n_tokens, c.chunk_md5 "
        "FROM __chunk_docs_in, LATERAL chunk_doc(doc_id, text) c")


def chunk_documents_oracle_sql(size: int = CHUNK_SIZE,
                               stride: int = CHUNK_STRIDE) -> str:
    return f"""
WITH t AS (
  SELECT doc_id, list_filter({X.toks(X.DUCK)}, x -> x <> '') AS toks
  FROM documents),
n AS (SELECT doc_id, toks, len(toks) AS n FROM t),
idx AS (
  SELECT doc_id, toks, n,
    unnest(generate_series(0,
      CASE WHEN n <= {size} THEN 0
           ELSE CAST(CEIL(CAST(n - {size} AS DOUBLE) / {stride}) AS INT)
      END)) AS chunk_idx
  FROM n)
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
  CAST(LEAST({size}, n - chunk_idx * {stride}) AS INT) AS n_tokens,
  md5(array_to_string(
    toks[chunk_idx * {stride} + 1 : chunk_idx * {stride} + {size}], ' '))
    AS chunk_md5
FROM idx"""


PMI_MIN_COUNT = 20
PMI_TOP_N = 40
_PMI_NBITS = 24


def pmi_collocations(docs: DataFrame, min_count: int = PMI_MIN_COUNT,
                     top_n: int = PMI_TOP_N) -> DataFrame:
    """T18 — collocation mining by pointwise mutual information:
    ``PMI(a,b) = log2(N·c(ab) / (c(a)·c(b)))`` over adjacent token
    pairs, ranked after a minimum-count cut (the classic phrase-mining
    score; high-PMI pairs become single tokens in phrase-aware
    vocabularies).

    Exactness: every count is an integer, and log2 of a product/ratio
    decomposes into ±fixed-point-log2 of the integer factors —
    ``ticks = lg(c_ab) + lg(N) − lg(c_a) − lg(c_b)`` — so the score is
    a BIGINT, bit-identical across engines, with zero float ops.

    Scale shape: unigram and bigram tables are map-side-combined
    groupBys (vocab- and bigram-vocab-sized); the min-count cut prunes
    the bigram table BEFORE its two broadcast joins against the unigram
    table, and the four log2 chains run only on surviving collocations.
    The rank window sees a filtered aggregate, never the corpus."""
    from pyspark.sql import Window
    t = X.toks(X.SPARK)
    uni = (docs.select(F.explode(F.expr(t)).alias("tok"))
           .filter(F.col("tok") != "")
           .groupBy("tok").agg(F.count("*").alias("c")))
    bi = (docs.select(F.explode(F.expr(
              X.bigrams(X.SPARK, t))).alias("pair"))
          .groupBy("pair").agg(F.count("*").alias("c_ab"))
          .filter(F.col("c_ab") >= min_count))
    # total tokens from the vocab-sized uni aggregate — not a third
    # corpus scan (ReuseExchange shares uni's shuffle)
    n_tot = uni.agg(F.sum("c").alias("n"))
    j = (bi
         .withColumn("a", F.expr("split(pair, ' ')[0]"))
         .withColumn("b", F.expr("split(pair, ' ')[1]"))
         .join(F.broadcast(uni.select(F.col("tok").alias("a"),
                                      F.col("c").alias("c_a"))), "a")
         .join(F.broadcast(uni.select(F.col("tok").alias("b"),
                                      F.col("c").alias("c_b"))), "b")
         .join(F.broadcast(n_tot)))
    j = _log2fix_ticks(j, "c_ab", "lg_ab", _PMI_NBITS)
    j = _log2fix_ticks(j, "n", "lg_n", _PMI_NBITS)
    j = _log2fix_ticks(j, "c_a", "lg_a", _PMI_NBITS)
    j = _log2fix_ticks(j, "c_b", "lg_b", _PMI_NBITS)
    j = j.withColumn("pmi_ticks",
                     F.expr("lg_ab + lg_n - lg_a - lg_b"))
    w = Window.orderBy(F.desc("pmi_ticks"), F.asc("pair"))
    return (j.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_n)
            .select("pair", "c_ab", "c_a", "c_b", "pmi_ticks", "rank"))


def pmi_collocations_oracle_sql(min_count: int = PMI_MIN_COUNT,
                                top_n: int = PMI_TOP_N) -> str:
    t = X.toks(X.DUCK)
    # the log2 chain consumes its cnt column, so counts that must
    # survive to the output ride along under *_k aliases
    base = """
SELECT bi.pair, bi.c_ab, bi.c_ab AS c_ab_k, ua.c AS c_a, ua.c AS c_a_k,
  ub.c AS c_b, ub.c AS c_b_k, nt.n AS n
FROM bi
JOIN uni ua ON string_split(bi.pair, ' ')[1] = ua.tok
JOIN uni ub ON string_split(bi.pair, ' ')[2] = ub.tok
CROSS JOIN ntot nt"""
    q = X.log2fix_duck_sql(
        base, "c_ab", "lg_ab",
        ["pair", "c_ab_k", "c_a", "c_a_k", "c_b", "c_b_k", "n"], _PMI_NBITS)
    q = X.log2fix_duck_sql(
        f"SELECT * FROM ({q})", "n", "lg_n",
        ["pair", "c_ab_k", "c_a", "c_a_k", "c_b", "c_b_k", "lg_ab"],
        _PMI_NBITS)
    q = X.log2fix_duck_sql(
        f"SELECT * FROM ({q})", "c_a", "lg_a",
        ["pair", "c_ab_k", "c_a_k", "c_b", "c_b_k", "lg_ab", "lg_n"],
        _PMI_NBITS)
    q = X.log2fix_duck_sql(
        f"SELECT * FROM ({q})", "c_b", "lg_b",
        ["pair", "c_ab_k", "c_a_k", "c_b_k", "lg_ab", "lg_n", "lg_a"],
        _PMI_NBITS)
    return f"""
WITH tok AS (
  SELECT unnest({t}) AS tok FROM documents),
uni AS (SELECT tok, COUNT(*) AS c FROM tok WHERE tok <> '' GROUP BY tok),
bi AS (
  SELECT pair, COUNT(*) AS c_ab FROM (
    SELECT unnest({X.bigrams(X.DUCK, t)}) AS pair FROM documents)
  GROUP BY pair HAVING COUNT(*) >= {min_count}),
ntot AS (SELECT SUM(c) AS n FROM uni),
scored AS ({q})
SELECT pair, c_ab_k AS c_ab, c_a_k AS c_a, c_b_k AS c_b,
  lg_ab + lg_n - lg_a - lg_b AS pmi_ticks,
  CAST(ROW_NUMBER() OVER (ORDER BY lg_ab + lg_n - lg_a - lg_b DESC,
                          pair ASC) AS INT) AS rank
FROM scored
QUALIFY rank <= {top_n}"""


# ------------------------------------------------- T25: DSIR weights ---

DSIR_BUCKETS = 32
#: synthetic target distribution over hashed-bigram buckets: weight
#: proportional to bucket index + 1 (a fixed curation policy literal);
#: log2 of each weight and of the total are embedded as exact
#: fixed-point ticks so the score is all-integer
_DSIR_TGT_W = [b + 1 for b in range(DSIR_BUCKETS)]


def _dsir_bucket(d: str) -> str:
    """Hashed-bigram bucket: first 2 md5 hex digits mod DSIR_BUCKETS —
    deterministic and identical cross-engine."""
    fn = "instr" if d == X.SPARK else "strpos"
    h = "md5(bg)"
    d1 = f"({fn}('0123456789abcdef', substr({h}, 1, 1)) - 1)"
    d2 = f"({fn}('0123456789abcdef', substr({h}, 2, 1)) - 1)"
    return f"(({d1}) * 16 + ({d2})) % {DSIR_BUCKETS}"


def dsir_weights(docs: DataFrame) -> DataFrame:
    """T25 — DSIR importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023): score every document by how much its
    hashed-bigram distribution looks like a target domain relative to
    the source corpus: ``log w(doc) = Σ_bigrams [log p_target(bucket) −
    log p_source(bucket)]``. High-weight documents are the resampling
    candidates for domain-targeted training mixes.

    → (doc_id, n_bigrams, importance_ticks) with the log-weight in
    exact fixed-point ticks (2^-24), so the oracle hashes bit-exactly.

    Scale shape: bigram hashing is a narrow projection; the source
    distribution is a **32-row aggregate** (bucket counts — nothing
    corpus-sized shuffles); the fixed-point log2 chain runs on those 32
    rows; per-document scores need one groupBy(doc, bucket) partial
    aggregate plus a broadcast join of the 32-row log table."""
    nb = _LM_NBITS
    bg = docs.select(
        "doc_id", F.explode(F.expr(
            X.bigrams(X.SPARK, X.toks(X.SPARK)))).alias("bg"))
    bg = bg.withColumn("bucket",
                       F.expr(_dsir_bucket(X.SPARK)).cast("int"))
    src = bg.groupBy("bucket").agg(F.count("*").alias("n_b"))
    src = _log2fix_ticks(src, "n_b", "lg_nb", nb)
    total = bg.groupBy().agg(F.count("*").alias("n_tot"))
    total = _log2fix_ticks(total, "n_tot", "lg_tot", nb).select("lg_tot")
    # exact target log2 ticks as a literal 32-row table
    tgt_tot = X.log2fix_py(sum(_DSIR_TGT_W), nb)
    tgt_rows = ", ".join(
        f"({b}, {X.log2fix_py(w, nb)} - {tgt_tot})"
        for b, w in enumerate(_DSIR_TGT_W))
    tgt = docs.sparkSession.sql(
        f"SELECT CAST(bucket AS INT) AS bucket, "
        f"CAST(lg_pt AS BIGINT) AS lg_pt "
        f"FROM (VALUES {tgt_rows}) AS t(bucket, lg_pt)")
    per_bucket = (bg.groupBy("doc_id", "bucket")
                  .agg(F.count("*").alias("c")))
    scored = (per_bucket
              .join(F.broadcast(src.select("bucket", "lg_nb")), "bucket")
              .join(F.broadcast(tgt), "bucket")
              .join(F.broadcast(total))
              .groupBy("doc_id")
              .agg(F.sum("c").alias("n_bigrams"),
                   F.sum(F.expr(
                       "c * (lg_pt - (lg_nb - lg_tot))"))
                   .alias("importance_ticks")))
    # docs with < 2 tokens have no bigrams: weight 0 by definition
    return (docs.select("doc_id")
            .join(scored, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    F.coalesce("importance_ticks", F.lit(0))
                    .alias("importance_ticks")))


def dsir_weights_oracle_sql() -> str:
    nb = _LM_NBITS
    tgt_tot = X.log2fix_py(sum(_DSIR_TGT_W), nb)
    tgt_rows = ", ".join(
        f"({b}, {X.log2fix_py(w, nb)} - {tgt_tot})"
        for b, w in enumerate(_DSIR_TGT_W))
    src_lg = X.log2fix_duck_sql(
        "SELECT bucket, n_b FROM src", "n_b", "lg_nb", ["bucket"], nb)
    tot_lg = X.log2fix_duck_sql(
        "SELECT n_tot FROM tot", "n_tot", "lg_tot", [], nb)
    return f"""
WITH bg AS (
  SELECT doc_id, {_dsir_bucket(X.DUCK)} AS bucket
  FROM (SELECT doc_id, unnest({X.bigrams(X.DUCK, X.toks(X.DUCK))}) AS bg
        FROM documents)),
src AS (SELECT bucket, COUNT(*) AS n_b FROM bg GROUP BY bucket),
tot AS (SELECT COUNT(*) AS n_tot FROM bg),
src_lg AS ({src_lg}),
tot_lg AS ({tot_lg}),
tgt(bucket, lg_pt) AS (VALUES {tgt_rows}),
per_bucket AS (
  SELECT doc_id, bucket, COUNT(*) AS c FROM bg GROUP BY doc_id, bucket),
scored AS (
  SELECT p.doc_id, CAST(SUM(p.c) AS BIGINT) AS n_bigrams,
    CAST(SUM(p.c * (t.lg_pt - (s.lg_nb - g.lg_tot))) AS BIGINT)
      AS importance_ticks
  FROM per_bucket p
  JOIN src_lg s ON p.bucket = s.bucket
  JOIN tgt t ON p.bucket = t.bucket
  CROSS JOIN tot_lg g
  GROUP BY p.doc_id)
SELECT d.doc_id,
  CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
  CAST(COALESCE(s.importance_ticks, 0) AS BIGINT) AS importance_ticks
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id"""


def bigram_lm_bits(docs: DataFrame) -> DataFrame:
    """T27 — corpus-bigram conditional cross-entropy per document
    (the CCNet-style LM-perplexity quality signal, one modeling step up
    from T15's unigram): train an add-one-smoothed bigram LM on the
    corpus itself — ``P(w2|w1) = (c(w1 w2)+1) / (c(w1·)+V)`` — and score
    every doc by average ``-log2 P`` over its bigrams (bits/bigram).
    → (doc_id, n_bigrams, bits_per_bigram).

    Plan shape at 100 TB: the bigram stream is a narrow flatMap off the
    scan; the LM is one map-side-combined groupBy down to **bigram-vocab**
    cardinality; the history counts ``c(w1·)`` re-aggregate FROM the
    bigram table (vocab-scale, never a second corpus shuffle); scoring
    re-streams doc bigrams against the broadcast model. Docs with < 2
    tokens score 0 over 0 bigrams.

    Determinism: both log2s run through the fixed-point chain, per-doc
    sums are exact BIGINT tick sums, and ``-log2 P`` decomposes as
    ``ticks(c1+V) − ticks(c2+1)`` — integer subtraction, no float until
    the final per-doc division."""
    bg = docs.select(
        "doc_id",
        F.explode(F.expr(X.bigrams(X.SPARK, X.toks(X.SPARK)))).alias("bg"))
    vocab = (docs.select(
        F.explode(F.expr(X.toks(X.SPARK))).alias("tok"))
        .filter(F.col("tok") != "").distinct().count())
    c2 = bg.groupBy("bg").agg(F.count("*").alias("cnt2"))
    c1 = (c2.withColumn("w1", F.expr("split_part(bg, ' ', 1)"))
          .groupBy("w1").agg(F.sum("cnt2").alias("cnt1")))
    t2 = (_log2fix_ticks(c2.withColumn("__c", F.expr("cnt2 + 1")),
                         "__c", "ticks2")
          .select("bg", "ticks2"))
    t1 = (_log2fix_ticks(c1.withColumn("__c", F.expr(f"cnt1 + {vocab}")),
                         "__c", "ticks1")
          .select("w1", "ticks1"))
    model = (t2.withColumn("w1", F.expr("split_part(bg, ' ', 1)"))
             .join(t1, "w1")
             .select("bg", (F.col("ticks1") - F.col("ticks2"))
                     .alias("ticks")))
    scored = (bg.join(F.broadcast(model), "bg")
              .groupBy("doc_id")
              .agg(F.count("*").alias("n_bigrams"),
                   F.sum("ticks").alias("sum_ticks")))
    bits = (f"CAST(sum_ticks AS DOUBLE) / CAST(n_bigrams AS DOUBLE) "
            f"/ CAST({1 << _LM_NBITS} AS DOUBLE)")
    return (docs.select("doc_id").join(scored, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_bigrams", F.lit(0)).cast("int")
                    .alias("n_bigrams"),
                    F.expr(f"CASE WHEN n_bigrams IS NULL THEN "
                           f"CAST(0.0 AS FLOAT) ELSE {f32(bits)} END")
                    .alias("bits_per_bigram")))


def bigram_lm_bits_oracle_sql() -> str:
    d = X.DUCK
    t2_sql = X.log2fix_duck_sql(
        "SELECT bg, cnt2 + 1 AS c FROM c2", "c", "ticks2", ["bg"],
        _LM_NBITS)
    t1_sql = X.log2fix_duck_sql(
        "SELECT w1, cnt1 + (SELECT v FROM vocab) AS c FROM c1",
        "c", "ticks1", ["w1"], _LM_NBITS)
    bits = (f"CAST(sum_ticks AS DOUBLE) / CAST(n_bigrams AS DOUBLE) "
            f"/ CAST({1 << _LM_NBITS} AS DOUBLE)")
    return f"""
WITH bg AS (
  SELECT doc_id, unnest({X.bigrams(d, X.toks(d))}) AS bg FROM documents),
vocab AS (
  SELECT COUNT(DISTINCT t) AS v
  FROM (SELECT unnest({X.toks(d)}) AS t FROM documents) WHERE t <> ''),
c2 AS (SELECT bg, COUNT(*) AS cnt2 FROM bg GROUP BY bg),
c1 AS (SELECT split_part(bg, ' ', 1) AS w1, SUM(cnt2) AS cnt1
       FROM c2 GROUP BY 1),
t2 AS ({t2_sql}),
t1 AS ({t1_sql}),
model AS (
  SELECT t2.bg, t1.ticks1 - t2.ticks2 AS ticks
  FROM t2 JOIN t1 ON split_part(t2.bg, ' ', 1) = t1.w1),
scored AS (
  SELECT b.doc_id, COUNT(*) AS n_bigrams, SUM(m.ticks) AS sum_ticks
  FROM bg b JOIN model m USING (bg) GROUP BY b.doc_id)
SELECT d.doc_id,
  CAST(COALESCE(n_bigrams, 0) AS INT) AS n_bigrams,
  CASE WHEN n_bigrams IS NULL THEN CAST(CAST(0.0 AS FLOAT) AS DOUBLE)
       ELSE {f32(bits)} END AS bits_per_bigram
FROM (SELECT doc_id FROM documents) d LEFT JOIN scored s USING (doc_id)"""


NOVELTY_SHINGLE_N = 8


def novelty_stats(docs: DataFrame,
                  n: int = NOVELTY_SHINGLE_N) -> DataFrame:
    """T29 — crawl-order novelty: for every document, the fraction of
    its distinct n-token shingles whose FIRST corpus occurrence (minimum
    doc_id = ingestion order) is this document. The marginal-value
    signal crawl curation uses to decide whether a later dump still adds
    content — redundant documents score near 0, fresh ones near 1.
    → (doc_id, n_shingles, n_novel, novelty).

    Scale shape: one (doc, shingle-md5) distinct projection; the
    first-seen table is a groupBy(hash) MIN with map-side partials
    (shingle-vocabulary cardinality crosses the shuffle, not corpus
    volume); membership returns on the same hash key — one shuffle
    reused co-partitioned. novelty is one IEEE division of exact
    BIGINTs."""
    sh = X.distinct(X.SPARK, X.shingles(X.SPARK, X.toks(X.SPARK), n))
    per = (docs.select("doc_id", F.explode(F.expr(sh)).alias("s"))
           .select("doc_id", F.md5("s").alias("h")))
    first = per.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    scored = (per.join(first, "h")
              .groupBy("doc_id")
              .agg(F.count("*").alias("n_shingles"),
                   F.sum(F.expr(
                       "CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END"))
                   .alias("n_novel")))
    return (docs.select("doc_id").join(scored, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_shingles", F.lit(0)).cast("bigint")
                    .alias("n_shingles"),
                    F.coalesce("n_novel", F.lit(0)).cast("bigint")
                    .alias("n_novel"),
                    F.expr("CASE WHEN n_shingles IS NULL THEN 0.0 ELSE "
                           "CAST(n_novel AS DOUBLE) / "
                           "CAST(n_shingles AS DOUBLE) END")
                    .alias("novelty")))


def novelty_stats_oracle_sql(n: int = NOVELTY_SHINGLE_N) -> str:
    sh = X.distinct(X.DUCK, X.shingles(X.DUCK, X.toks(X.DUCK), n))
    return f"""
WITH per AS (
  SELECT doc_id, md5(s) AS h
  FROM (SELECT doc_id, unnest({sh}) AS s FROM documents)),
first AS (SELECT h, MIN(doc_id) AS first_doc FROM per GROUP BY h),
scored AS (
  SELECT p.doc_id, COUNT(*) AS n_shingles,
    SUM(CASE WHEN f.first_doc = p.doc_id THEN 1 ELSE 0 END) AS n_novel
  FROM per p JOIN first f USING (h) GROUP BY p.doc_id)
SELECT d.doc_id,
  CAST(COALESCE(n_shingles, 0) AS BIGINT) AS n_shingles,
  CAST(COALESCE(n_novel, 0) AS BIGINT) AS n_novel,
  CASE WHEN n_shingles IS NULL THEN 0.0 ELSE
    CAST(n_novel AS DOUBLE) / CAST(n_shingles AS DOUBLE) END AS novelty
FROM (SELECT doc_id FROM documents) d
LEFT JOIN scored s USING (doc_id)"""
