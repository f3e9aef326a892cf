"""Mergeable sketches for corpus-scale statistics — the "novel sketch"
north-star operator family (the reference has none; SURVEY.md §2.8 lists
no distinct aggregates at all).

SK1: **KMV (k-minimum-values) distinct-count sketch** per group. The
classic mergeable cardinality estimator (Bar-Yossef et al. 2002;
Beyer et al. "On Synopses for Distinct-Value Estimation Under Multiset
Operations", SIGMOD 2007): hash every element to [0, 1), keep the k
smallest distinct hashes; with fewer than k values seen the sketch IS the
exact distinct set, otherwise estimate D ≈ (k-1) / h_(k) where h_(k) is
the k-th smallest hash.

Why this instead of ``approx_count_distinct``: Spark's HLL++ estimate is
engine-internal (not reproducible in DuckDB), so it can only be
rows-only-checked. KMV over md5 is **deterministic and engine-agnostic**
— both engines compute the identical k-minima and the identical
estimate, so the oracle validates the sketch math itself, not just row
counts. (``approx_count_distinct`` remains the right call when you don't
need cross-engine determinism; this operator demonstrates the mergeable
two-level-aggregation shape any such sketch uses.)

Scale shape (100 TB): NO global distinct — that is the whole point.

- stage 0: narrow projection (group, md5(token)) over the scan;
- stage 1: ``groupBy(group, bucket)`` where bucket = first hex nibble —
  ``collect_set`` dedups map-side (partial aggregation), per-bucket set
  size ≈ D/16 per map partition; raise the bucket fan-out to bound
  memory on hotter groups. Only per-bucket k-minima cross the shuffle;
- stage 2: ``groupBy(group)`` merges bucket sketches: flatten, sort,
  slice k — the canonical sketch-merge (associative, order-insensitive).

Fixed-width lowercase md5 hex makes lexicographic order = numeric order,
so ``array_sort`` + ``slice`` is the k-minima selection, and the
estimate's hash fraction is the first 8 hex chars folded to an int64
(identical folds in both dialects; one exact IEEE division each side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from birli_spark.functions import textsql as X

KMV_K = 64
#: 2^32 — first-8-hex-chars hash space, as an exact double
_HEX32_SPACE = 4294967296.0

_HEXDIGITS = "0123456789abcdef"


def _hex32(d: str, col: str) -> str:
    """First 8 hex chars of ``col`` as an int64. Spark has a native
    base-16 ``conv`` (one codegen call; equality with the digit fold is
    asserted in tests); DuckDB lacks a clean hex→int, so its side stays
    the explicit digit fold — the VALUES are identical either way, which
    is all cross-engine hashing needs."""
    if d == X.SPARK:
        return f"CAST(conv(substr({col}, 1, 8), 16, 10) AS BIGINT)"
    return (f"list_reduce(list_prepend(0, list_transform("
            f"generate_series(1, 8), i -> strpos('{_HEXDIGITS}', "
            f"substr({col}, i, 1)) - 1)), (a, b) -> a * 16 + b)")


def _estimate(d: str, merged: str, k: int) -> str:
    """KMV estimate from the merged k-minima array: exact size when the
    sketch saw everything, else (k-1) / h_(k)."""
    nth = (f"element_at({merged}, {k})" if d == X.SPARK
           else f"{merged}[{k}]")
    sz = X.size(d, merged)
    return (f"CASE WHEN {sz} < {k} THEN CAST({sz} AS DOUBLE) "
            f"ELSE {k - 1} * {_HEX32_SPACE!r} / "
            f"GREATEST({_hex32(d, nth)}, 1) END")


def kmv_distinct_tokens(docs: DataFrame, k: int = KMV_K) -> DataFrame:
    """SK1 — per-source distinct-token cardinality: KMV estimate next to
    the exact count (the exact side is the validation baseline; at real
    scale you ship only the sketch and skip its corpus-wide shuffle)."""
    tok = (docs
           .select("source", F.explode(F.expr(X.toks(X.SPARK))).alias("t"))
           .filter(F.col("t") != "")
           .select("source", F.md5("t").alias("h"),
                   (F.expr(f"instr('{_HEXDIGITS}', substr(md5(t), 1, 1))")
                    - F.lit(1)).alias("bucket")))
    stage1 = (tok.groupBy("source", "bucket")
              .agg(F.expr(f"slice(array_sort(collect_set(h)), 1, {k})")
                   .alias("ks")))
    merged = (stage1.groupBy("source")
              .agg(F.expr(
                  f"slice(array_sort(flatten(collect_list(ks))), 1, {k})")
                  .alias("kmins")))
    exact = (tok.groupBy("source")
             .agg(F.countDistinct("h").alias("exact_distinct")))
    return (merged
            .join(F.broadcast(exact), "source")
            .select("source", "exact_distinct",
                    F.expr(_estimate(X.SPARK, "kmins", k))
                    .alias("kmv_distinct")))


CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_TOP_K = 20


def _cms_bucket(d: str, seed: str, tok: str, width: int) -> str:
    """Counter column for (seed, token): md5 of "seed:token" folded to
    int64, modulo the row width — identical arithmetic both dialects."""
    concat = (f"concat(CAST({seed} AS STRING), ':', {tok})" if d == X.SPARK
              else f"CAST({seed} AS VARCHAR) || ':' || {tok}")
    return f"({_hex32(d, f'md5({concat})')} % {width})"


def cms_heavy_hitters(docs: DataFrame, depth: int = CMS_DEPTH,
                      width: int = CMS_WIDTH,
                      top_k: int = CMS_TOP_K) -> DataFrame:
    """SK2 — count-min sketch (Cormode & Muthukrishnan 2005) estimates
    for the corpus's exact top-k tokens, next to their true counts.

    The sketch is a depth×width counter matrix: every token increments
    one counter per row (row = seed, column = hash(seed, token) mod
    width); a point estimate is the MIN over rows, an overestimate by
    construction (collisions only add). md5-derived buckets make every
    counter — and therefore every estimate — bit-identical in DuckDB.

    Scale shape: the token stream fans out ×depth (narrow explode), then
    one partial-aggregated groupBy collapses to ≤ depth·width counter
    rows per map partition before the shuffle — the sketch, not the
    corpus, crosses the wire. The exact top-k side is the validation
    baseline (same vocab-aggregate as T5); the estimate lookup joins the
    tiny candidate×depth table to the broadcast counter matrix."""
    seeds = f"sequence(0, {depth - 1})"
    tok = (docs
           .select(F.explode(F.expr(X.toks(X.SPARK))).alias("t"))
           .filter(F.col("t") != ""))
    fan = (f"transform({seeds}, s -> named_struct("
           f"'seed', s, 'bucket', {_cms_bucket(X.SPARK, 's', 't', width)}))")
    cms = (tok
           .select(F.explode(F.expr(fan)).alias("sb"))
           .groupBy(F.col("sb.seed").alias("seed"),
                    F.col("sb.bucket").alias("bucket"))
           .agg(F.count("*").alias("c")))
    w = Window.orderBy(F.desc("tf"), F.asc("t"))
    top = (tok.groupBy("t").agg(F.count("*").alias("tf"))
           .withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= top_k))
    probes = (top
              .select("t", "tf", "rank", F.explode(F.expr(seeds)).alias("seed"))
              .withColumn("bucket", F.expr(
                  _cms_bucket(X.SPARK, "seed", "t", width))))
    return (probes
            .join(F.broadcast(cms), ["seed", "bucket"])
            .groupBy(F.col("t").alias("term"))
            .agg(F.min("tf").alias("tf_exact"),
                 F.min("rank").alias("rank"),
                 F.min("c").alias("cms_estimate")))


def cms_heavy_hitters_oracle_sql(depth: int = CMS_DEPTH,
                                 width: int = CMS_WIDTH,
                                 top_k: int = CMS_TOP_K) -> str:
    d = X.DUCK
    return f"""
WITH tok AS (
  SELECT t FROM (SELECT unnest({X.toks(d)}) AS t FROM documents)
  WHERE t <> ''),
fan AS (
  SELECT t, unnest(generate_series(0, {depth - 1})) AS seed FROM tok),
cms AS (
  SELECT seed, {_cms_bucket(d, 'seed', 't', width)} AS bucket,
    COUNT(*) AS c
  FROM fan GROUP BY 1, 2),
top AS (
  SELECT t, COUNT(*) AS tf,
    ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, t ASC) AS rank
  FROM tok GROUP BY t
  QUALIFY rank <= {top_k}),
probes AS (
  SELECT top.t, top.tf, top.rank, f.seed,
    {_cms_bucket(d, 'f.seed', 'top.t', width)} AS bucket
  FROM top, (SELECT unnest(generate_series(0, {depth - 1})) AS seed) f)
SELECT p.t AS term, MIN(p.tf) AS tf_exact, MIN(p.rank) AS rank,
  MIN(c.c) AS cms_estimate
FROM probes p JOIN cms c ON c.seed = p.seed AND c.bucket = p.bucket
GROUP BY p.t"""


HLL_M = 256                      # 2^8 buckets (p = 8)
#: alpha_256 = 0.7213 / (1 + 1.079/256) (Flajolet et al. 2007, HLL paper)
_HLL_ALPHA = repr(0.7213 / (1 + 1.079 / 256))
_HLL_RHO_CAP = 54               # 256 buckets x 2^54 max = 2^62 < int64 max
#: 2^54 as an exact double literal (empty-bucket register contribution)
_HLL_UNIT = float(1 << _HLL_RHO_CAP)


def _hll_bucket(d: str, h: str) -> str:
    """First two hex chars of the md5 → bucket 0..255."""
    fn = "instr" if d == X.SPARK else "strpos"
    d1 = f"({fn}('{_HEXDIGITS}', substr({h}, 1, 1)) - 1)"
    d2 = f"({fn}('{_HEXDIGITS}', substr({h}, 2, 1)) - 1)"
    return f"({d1} * 16 + {d2})"


def _hll_rho(d: str, h: str) -> str:
    """rho = 1 + number of leading zero BITS of the remaining 120 hash
    bits (hex chars 3..32). Zero hex digits are stripped with an anchored
    regexp (identical regex semantics both engines); the first nonzero
    digit's leading zeros come from a 4-way CASE. All-integer."""
    fn = "instr" if d == X.SPARK else "strpos"
    nz = f"regexp_replace(substr({h}, 3, 30), '^0+', '')"
    zeros = f"(30 - length({nz}))"
    lead = f"({fn}('{_HEXDIGITS}', substr({nz}, 1, 1)) - 1)"
    lz = (f"CASE WHEN length({nz}) = 0 THEN 4 WHEN {lead} >= 8 THEN 0 "
          f"WHEN {lead} >= 4 THEN 1 WHEN {lead} >= 2 THEN 2 ELSE 3 END")
    return f"LEAST(4 * {zeros} + {lz} + 1, {_HLL_RHO_CAP})"


def _hll_estimate(d: str, s: str) -> str:
    """Raw HLL estimate alpha_m * m^2 / sum(2^-rho_j), with the register
    sum carried as the exact BIGINT ``s`` = sum(2^(56 - rho_j)) — integer
    addition commutes, so partial-aggregation order can't flap the hash;
    the only float ops are one division and two multiplications, written
    with the identical expression tree in both dialects."""
    return (f"CAST({_HLL_ALPHA} AS DOUBLE) * {float(HLL_M * HLL_M)!r} * "
            f"({_HLL_UNIT!r} / CAST({s} AS DOUBLE))")


def hll_distinct_tokens(docs: DataFrame) -> DataFrame:
    """SK3 — HyperLogLog distinct-token cardinality per source, next to
    the exact count (Flajolet, Fusy, Gandouet & Meunier, "HyperLogLog:
    the analysis of a near-optimal cardinality estimation algorithm",
    AofA 2007 — the algorithm behind ``approx_count_distinct``).

    Same cross-engine-determinism rationale as SK1: Spark's HLL++ is
    engine-internal, so this md5-derived register file is reproducible in
    DuckDB and the oracle validates the estimates themselves. Differences
    from KMV: O(m) fixed state per group (vs O(k) hashes), registers are
    MAX-mergeable (the canonical union-able sketch), and the estimate
    needs only the register SUM — carried here as exact integers.

    Scale shape (100 TB): stage 1 ``groupBy(source, bucket)`` MAX-reduces
    map-side to ≤ 256 register rows per source per partition; stage 2
    merges registers with another MAX and folds them into one BIGINT.
    Only register rows cross the shuffle. The raw estimate is emitted
    without the small-range linear-counting branch (it needs libm ``ln``;
    ``v_nonempty`` is exposed so a client can apply it) — fine for the
    >2.5m-cardinality regime sources live in."""
    tok = (docs
           .select("source", F.explode(F.expr(X.toks(X.SPARK))).alias("t"))
           .filter(F.col("t") != "")
           .select("source", F.md5("t").alias("h")))
    regs = (tok
            .select("source",
                    F.expr(_hll_bucket(X.SPARK, "h")).alias("bucket"),
                    F.expr(_hll_rho(X.SPARK, "h")).alias("rho"))
            .groupBy("source", "bucket")
            .agg(F.max("rho").alias("mj")))
    merged = (regs.groupBy("source")
              .agg(F.count("*").alias("v_nonempty"),
                   F.sum(F.expr(
                       f"shiftleft(CAST(1 AS BIGINT), {_HLL_RHO_CAP} - mj)"))
                   .alias("s_present")))
    s_total = (f"s_present + CAST({HLL_M} - v_nonempty AS BIGINT) * "
               f"CAST({1 << _HLL_RHO_CAP} AS BIGINT)")
    exact = (tok.groupBy("source")
             .agg(F.countDistinct("h").alias("exact_distinct")))
    return (merged
            .join(F.broadcast(exact), "source")
            .select("source", "exact_distinct",
                    F.col("v_nonempty").cast("int").alias("v_nonempty"),
                    F.expr(_hll_estimate(X.SPARK, f"({s_total})"))
                    .alias("hll_estimate")))


def hll_distinct_tokens_oracle_sql() -> str:
    d = X.DUCK
    s_total = (f"s_present + CAST({HLL_M} - v_nonempty AS BIGINT) * "
               f"CAST({1 << _HLL_RHO_CAP} AS BIGINT)")
    return f"""
WITH tok AS (
  SELECT source, md5(t) AS h
  FROM (SELECT source, unnest({X.toks(d)}) AS t FROM documents)
  WHERE t <> ''),
regs AS (
  SELECT source, {_hll_bucket(d, 'h')} AS bucket,
    MAX({_hll_rho(d, 'h')}) AS mj
  FROM tok GROUP BY 1, 2),
merged AS (
  SELECT source, COUNT(*) AS v_nonempty,
    SUM(CAST(1 AS BIGINT) << ({_HLL_RHO_CAP} - mj)) AS s_present
  FROM regs GROUP BY source),
exact AS (
  SELECT source, COUNT(DISTINCT h) AS exact_distinct FROM tok GROUP BY source)
SELECT m.source, e.exact_distinct,
  CAST(m.v_nonempty AS INT) AS v_nonempty,
  {_hll_estimate(d, f'({s_total})')} AS hll_estimate
FROM merged m JOIN exact e USING (source)"""


def kmv_distinct_tokens_oracle_sql(k: int = KMV_K) -> str:
    d = X.DUCK
    return f"""
WITH tok AS (
  SELECT source, md5(t) AS h,
    strpos('{_HEXDIGITS}', substr(md5(t), 1, 1)) - 1 AS bucket
  FROM (SELECT source, unnest({X.toks(d)}) AS t FROM documents)
  WHERE t <> ''),
stage1 AS (
  SELECT source, bucket, list_sort(list(DISTINCT h))[1:{k}] AS ks
  FROM tok GROUP BY source, bucket),
merged AS (
  SELECT source, list_sort(flatten(list(ks)))[1:{k}] AS kmins
  FROM stage1 GROUP BY source),
exact AS (
  SELECT source, COUNT(DISTINCT h) AS exact_distinct
  FROM tok GROUP BY source)
SELECT m.source, e.exact_distinct,
  {_estimate(d, 'kmins', k)} AS kmv_distinct
FROM merged m JOIN exact e USING (source)"""


# --------------------------------------------- SK4: Bloom membership ---

BLOOM_M = 4096
BLOOM_K = 3


def _bloom_bit(d: str, j: int, key: str, m: int = BLOOM_M) -> str:
    """Bit position of hash function j for an integer key: md5 of
    'b<j>:<key>' folded to int64, modulo the filter width."""
    concat = (f"concat('b{j}:', CAST({key} AS STRING))" if d == X.SPARK
              else f"'b{j}:' || CAST({key} AS VARCHAR)")
    return f"({_hex32(d, f'md5({concat})')} % {m})"


def bloom_membership(orders: DataFrame, customer: DataFrame,
                     m: int = BLOOM_M, kh: int = BLOOM_K) -> DataFrame:
    """SK4 — deterministic Bloom filter per order priority: build one
    m-bit filter over each priority's distinct customer keys, probe ALL
    customers against every filter, and report the exact false-positive
    accounting (possible because the truth set is computable at test
    scale).

    This is the engine's own **runtime-filter** shape (Spark 3.3+ injects
    the same construct as `InjectRuntimeFilter` bloom pruning): at 100 TB
    the filter build is a *bounded-state* aggregation — at most m bit
    positions survive per group no matter how many rows stream in
    (collect_set dedups map-side) — and the probe side is a broadcast of
    ≤ groups × m/8 bytes against the big table, turning a shuffle join
    into a scan-local prefilter with a quantified FP rate.

    md5-derived bit positions are integers, so Spark and DuckDB build
    bit-identical filters and the oracle checks the FP counts themselves.
    """
    bits_arr = ", ".join(
        f"CAST({_bloom_bit(X.SPARK, j, 'o_custkey', m)} AS INT)"
        for j in range(kh))
    # two consumers (filter build + truth join) — persist the distinct
    # member set so the orders scan/shuffle runs once
    from pyspark.storagelevel import StorageLevel
    members = (orders.select("o_orderpriority", "o_custkey").distinct()
               .persist(StorageLevel.MEMORY_AND_DISK))
    filt = (members
            .select("o_orderpriority", F.explode(
                F.expr(f"array({bits_arr})")).alias("bit"))
            .groupBy("o_orderpriority")
            .agg(F.expr("array_sort(collect_set(bit))").alias("bits")))
    # Probe = **equi-join on the bit position** against the exploded
    # filter (broadcast ≤ groups × m rows): each probe row is one O(1)
    # hash lookup, instead of an O(m) array_contains scan per
    # (customer, group) — on a saturated filter that linear scan is
    # billions of comparisons. A key "maybe"-hits a group iff all kh of
    # its probe rows match (each j matches ≤ once: filter bits are
    # distinct within a group).
    probe_rows = customer.select("c_custkey", F.explode(F.expr(
        "array(" + ", ".join(
            f"CAST({_bloom_bit(X.SPARK, j, 'c_custkey', m)} AS INT)"
            for j in range(kh)) + ")")).alias("bit"))
    fbits = filt.select("o_orderpriority", F.explode("bits").alias("bit"))
    maybes = (probe_rows.join(F.broadcast(fbits), "bit")
              .groupBy("o_orderpriority", "c_custkey")
              .agg(F.count("*").alias("n_hit"))
              .filter(F.col("n_hit") == kh)
              .select("o_orderpriority", "c_custkey"))
    # tiny per-group tallies reassemble the same audit row as the
    # row-wise plan: a Bloom filter has no false negatives, so every
    # member that exists in customer is a maybe, and the non-maybe rows
    # contribute only to n_probed (= |customer|, group-independent)
    truth = members.select(
        "o_orderpriority", F.col("o_custkey").alias("c_custkey"))
    n_probed = customer.agg(F.count("*").alias("n_probed"))
    per_group = filt.select(
        "o_orderpriority", F.expr("size(bits)").alias("n_bits_set"))
    n_maybe = (maybes.groupBy("o_orderpriority")
               .agg(F.count("*").alias("n_maybe")))
    n_members = (truth.join(customer.select("c_custkey"), "c_custkey",
                            "left_semi")
                 .groupBy("o_orderpriority")
                 .agg(F.count("*").alias("n_members")))
    member_maybes = (maybes.join(truth, ["o_orderpriority", "c_custkey"],
                                 "left_semi")
                     .groupBy("o_orderpriority")
                     .agg(F.count("*").alias("n_member_maybes")))
    return (per_group
            .crossJoin(F.broadcast(n_probed))
            .join(F.broadcast(n_maybe), "o_orderpriority", "left")
            .join(F.broadcast(n_members), "o_orderpriority", "left")
            .join(F.broadcast(member_maybes), "o_orderpriority", "left")
            .select("o_orderpriority", "n_bits_set", "n_probed",
                    F.coalesce("n_maybe", F.lit(0)).alias("n_maybe"),
                    F.coalesce("n_members", F.lit(0)).alias("n_members"),
                    (F.coalesce("n_maybe", F.lit(0))
                     - F.coalesce("n_member_maybes", F.lit(0)))
                    .alias("false_positives")))


def bloom_membership_oracle_sql(m: int = BLOOM_M, kh: int = BLOOM_K) -> str:
    d = X.DUCK
    bits_rows = " UNION ALL ".join(
        f"SELECT o_orderpriority, o_custkey, "
        f"CAST({_bloom_bit(d, j, 'o_custkey', m)} AS INT) AS bit FROM members"
        for j in range(kh))
    probe_pred = " AND ".join(
        f"list_contains(bits, CAST({_bloom_bit(d, j, 'c_custkey', m)}"
        f" AS INT))" for j in range(kh))
    return f"""
WITH members AS (
  SELECT DISTINCT o_orderpriority, o_custkey FROM orders),
bitrows AS ({bits_rows}),
filt AS (
  SELECT o_orderpriority, list_sort(list(DISTINCT bit)) AS bits
  FROM bitrows GROUP BY o_orderpriority),
probed AS (
  SELECT f.o_orderpriority, c.c_custkey, f.bits,
    ({probe_pred}) AS maybe
  FROM customer c CROSS JOIN filt f),
joined AS (
  SELECT p.*, m.o_custkey IS NOT NULL AS is_member
  FROM probed p LEFT JOIN members m
    ON p.o_orderpriority = m.o_orderpriority
   AND p.c_custkey = m.o_custkey)
SELECT o_orderpriority,
  MAX(len(bits)) AS n_bits_set,
  COUNT(*) AS n_probed,
  CAST(SUM(CAST(maybe AS BIGINT)) AS BIGINT) AS n_maybe,
  CAST(SUM(CAST(is_member AS BIGINT)) AS BIGINT) AS n_members,
  CAST(SUM(CAST(maybe AND NOT is_member AS BIGINT)) AS BIGINT)
    AS false_positives
FROM joined GROUP BY o_orderpriority"""


# ------------------------------------ SK5: histogram quantile sketch ---

HIST_LO = 0
HIST_HI = 4096
HIST_BINS = 64
HIST_PS = (0.5, 0.9, 0.99)


def hist_quantiles(docs: DataFrame, lo: int = HIST_LO, hi: int = HIST_HI,
                   nbins: int = HIST_BINS,
                   ps: tuple = HIST_PS) -> DataFrame:
    """SK5 — fixed-bin histogram quantile sketch over document lengths,
    next to the exact percentile it approximates.

    The histogram is the simplest *mergeable* quantile summary: per-bin
    counts are plain SUMs, so a 100 TB corpus reduces map-side to ≤ nbins
    rows per partition and the estimate runs on a table of nbins rows —
    no corpus-wide sort, unlike the exact percentile computed alongside
    as the error baseline. Estimation: for target rank p·N, find the
    first bin whose cumulative count reaches it and interpolate linearly
    inside the bin (deterministic: one division of identical operands).
    """
    w = (hi - lo) / nbins
    binx = (f"LEAST(CAST({nbins - 1} AS INT), GREATEST(0, "
            f"CAST(FLOOR((CAST(n_chars AS DOUBLE) - {lo}) / {w!r}) AS INT)))")
    bins = (docs.select(F.expr(binx).alias("bin"))
            .groupBy("bin").agg(F.count("*").alias("cnt")))
    wspec = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cum = (bins.withColumn("cum", F.sum("cnt").over(wspec))
           .withColumn("cumb", F.expr("cum - cnt")))
    n_tot = docs.agg(F.count("*").alias("n"))
    pdf_ = ", ".join(f"CAST({p!r} AS DOUBLE)" for p in ps)
    p_rows = (n_tot.select(
        F.explode(F.expr(f"array({pdf_})")).alias("p"), "n")
        .withColumn("target", F.expr("p * CAST(n AS DOUBLE)")))
    est = (f"{lo} + {w!r} * (CAST(bin AS DOUBLE) + "
           f"(target - CAST(cumb AS DOUBLE)) / CAST(cnt AS DOUBLE))")
    picked = (p_rows.join(cum, F.expr("CAST(cum AS DOUBLE) >= target"))
              .groupBy("p", "n", "target")
              .agg(F.expr("MIN(struct(bin, cnt, cum, cumb))").alias("s"))
              .select("p", "n",
                      F.col("s.bin").alias("bin"), "target",
                      F.expr("s.cnt AS cnt"), F.expr("s.cumb AS cumb")))
    from birli_spark.functions.complex import f32
    out = picked.withColumn("hist_q", F.expr(f32(est)))
    exact = docs.agg(*[
        F.expr(f32(f"CAST(percentile(n_chars, {p!r}) AS DOUBLE)"))
        .alias(f"x{i}") for i, p in enumerate(ps)])
    exact_long = exact.select(F.explode(F.expr(
        "array(" + ", ".join(
            f"struct(CAST({p!r} AS DOUBLE) AS p, x{i} AS exact_q)"
            for i, p in enumerate(ps)) + ")")).alias("e")).select("e.*")
    return (out.join(F.broadcast(exact_long), "p")
            .select("p", F.col("bin").cast("int").alias("bin"),
                    "hist_q", "exact_q"))


def hist_quantiles_oracle_sql(lo: int = HIST_LO, hi: int = HIST_HI,
                              nbins: int = HIST_BINS,
                              ps: tuple = HIST_PS) -> str:
    from birli_spark.functions.complex import f32
    w = (hi - lo) / nbins
    binx = (f"LEAST(CAST({nbins - 1} AS INT), GREATEST(0, "
            f"CAST(FLOOR((CAST(n_chars AS DOUBLE) - {lo}) / {w!r}) AS INT)))")
    pvals = ", ".join(f"CAST({p!r} AS DOUBLE)" for p in ps)
    est = (f"{lo} + {w!r} * (CAST(bin AS DOUBLE) + "
           f"(target - CAST(cumb AS DOUBLE)) / CAST(cnt AS DOUBLE))")
    exact_rows = " UNION ALL ".join(
        f"SELECT CAST({p!r} AS DOUBLE) AS p, "
        f"{f32(f'CAST(quantile_cont(n_chars, {p!r}) AS DOUBLE)')} AS exact_q"
        f" FROM documents" for p in ps)
    return f"""
WITH bins AS (
  SELECT {binx} AS bin, COUNT(*) AS cnt FROM documents GROUP BY 1),
cum AS (
  SELECT bin, cnt,
    SUM(cnt) OVER (ORDER BY bin) AS cum,
    SUM(cnt) OVER (ORDER BY bin) - cnt AS cumb
  FROM bins),
ntot AS (SELECT COUNT(*) AS n FROM documents),
prows AS (
  SELECT p, n, p * CAST(n AS DOUBLE) AS target
  FROM (SELECT unnest([{pvals}]) AS p), ntot),
est AS (
  SELECT p, bin, target, cnt, cumb FROM (
    SELECT p, bin, target, cnt, cumb,
      ROW_NUMBER() OVER (PARTITION BY p ORDER BY bin) AS rn
    FROM prows JOIN cum ON CAST(cum AS DOUBLE) >= target)
  WHERE rn = 1),
exact AS ({exact_rows})
SELECT est.p, CAST(bin AS INT) AS bin,
  {f32(est)} AS hist_q, exact.exact_q
FROM est JOIN exact ON est.p = exact.p"""


# ---------------------------- SK6: sliding-window distinct (HLL merge) ---

WIN_HOURS = 6
_US_PER_HOUR = 3_600_000_000
_LC_NBITS = 24
_LC_RSCALE = 1 << 20
#: ln(2) — the same literal parses to the same double in both engines
_LN2 = 0.6931471805599453


def hll_windowed_users(events: DataFrame,
                       win_hours: int = WIN_HOURS) -> DataFrame:
    """SK6 — distinct users over a trailing ``win_hours``-hour window,
    per hour, estimated by **merging per-hour HLL register files** —
    next to the exact windowed distinct it replaces.

    This is the query shape where sketches earn their keep: exact
    sliding-window COUNT(DISTINCT) re-touches every event in the window
    for every window (6× read amplification here, unbounded for long
    windows), while the sketch path reduces each hour once to ≤ m
    register rows and merges trailing windows with a register MAX — the
    mergeability property in action. The hour×register table is tiny, so
    the merge is a broadcast band join (at unbounded history it becomes
    the e6-style bucketed band equi-join).

    Unlike SK3 (whose sources sit in the large-cardinality regime), the
    small hourly windows here need HLL's **linear-counting branch**:
    when the raw estimate falls under 2.5·m, use ``m·ln(m/V₀)`` (V₀ =
    empty buckets). ``ln`` comes from the fixed-point log2 times an
    exact ln2 literal — no libm — so the corrected estimates stay
    bit-identical across engines like everything else here."""
    from birli_spark.operators.text import _log2fix_ticks
    d = X.SPARK
    ev = events.selectExpr(
        f"(ts div 1000) div {_US_PER_HOUR} AS hour",
        "md5(CAST(user_id AS STRING)) AS h")
    regs = (ev
            .select("hour",
                    F.expr(_hll_bucket(d, "h")).alias("bucket"),
                    F.expr(_hll_rho(d, "h")).alias("rho"))
            .groupBy("hour", "bucket")
            .agg(F.max("rho").alias("mj")))
    hours = events.selectExpr(
        f"(ts div 1000) div {_US_PER_HOUR} AS out_hour").distinct()
    merged = (regs.join(F.broadcast(hours),
                        F.expr(f"hour BETWEEN out_hour - {win_hours - 1} "
                               f"AND out_hour"))
              .groupBy("out_hour", "bucket")
              .agg(F.max("mj").alias("mj"))
              .groupBy("out_hour")
              .agg(F.count("*").alias("v_nonempty"),
                   F.sum(F.expr(
                       f"shiftleft(CAST(1 AS BIGINT), {_HLL_RHO_CAP} - mj)"))
                   .alias("s_present")))
    s_total = (f"s_present + CAST({HLL_M} - v_nonempty AS BIGINT) * "
               f"CAST({1 << _HLL_RHO_CAP} AS BIGINT)")
    exact = (ev.join(F.broadcast(hours),
                     F.expr(f"hour BETWEEN out_hour - {win_hours - 1} "
                            f"AND out_hour"))
             .groupBy("out_hour")
             .agg(F.countDistinct("h").alias("exact_distinct")))
    # linear-counting correction: ri = round((m / V0) * 2^20) -> fixed-
    # point log2 -> ln via exact ln2 multiply; guarded for V0 = 0
    withm = merged.withColumn("__ri", F.expr(
        f"CASE WHEN v_nonempty >= {HLL_M} THEN CAST(1 AS BIGINT) "
        f"ELSE CAST(ROUND(CAST({HLL_M} AS DOUBLE) / "
        f"CAST({HLL_M} - v_nonempty AS DOUBLE) * {_LC_RSCALE}.0) "
        f"AS BIGINT) END"))
    withm = _log2fix_ticks(withm, "__ri", "__lg", _LC_NBITS)
    raw = _hll_estimate(d, f"({s_total})")
    lc = (f"CAST({HLL_M} AS DOUBLE) * {_LN2!r} * "
          f"((CAST(__lg AS DOUBLE) / {1 << _LC_NBITS}.0) - 20.0)")
    corrected = (f"CASE WHEN v_nonempty < {HLL_M} "
                 f"AND ({raw}) <= 2.5 * {HLL_M} THEN {lc} "
                 f"ELSE ({raw}) END")
    return (withm
            .join(exact, "out_hour")
            .select(F.col("out_hour").alias("hour"), "exact_distinct",
                    F.col("v_nonempty").cast("int").alias("v_nonempty"),
                    F.expr(corrected).alias("hll_estimate")))


def hll_windowed_users_oracle_sql(win_hours: int = WIN_HOURS) -> str:
    d = X.DUCK
    s_total = (f"s_present + CAST({HLL_M} - v_nonempty AS BIGINT) * "
               f"CAST({1 << _HLL_RHO_CAP} AS BIGINT)")
    return f"""
WITH ev AS (
  SELECT epoch_us(ts) // {_US_PER_HOUR} AS hour,
    md5(CAST(user_id AS VARCHAR)) AS h
  FROM events),
regs AS (
  SELECT hour, {_hll_bucket(d, 'h')} AS bucket,
    MAX({_hll_rho(d, 'h')}) AS mj
  FROM ev GROUP BY 1, 2),
hours AS (SELECT DISTINCT hour AS out_hour FROM ev),
winregs AS (
  SELECT o.out_hour, r.bucket, MAX(r.mj) AS mj
  FROM regs r JOIN hours o
    ON r.hour BETWEEN o.out_hour - {win_hours - 1} AND o.out_hour
  GROUP BY o.out_hour, r.bucket),
merged AS (
  SELECT out_hour, COUNT(*) AS v_nonempty,
    SUM(CAST(1 AS BIGINT) << ({_HLL_RHO_CAP} - mj)) AS s_present
  FROM winregs GROUP BY out_hour),
exact AS (
  SELECT o.out_hour, COUNT(DISTINCT e.h) AS exact_distinct
  FROM ev e JOIN hours o
    ON e.hour BETWEEN o.out_hour - {win_hours - 1} AND o.out_hour
  GROUP BY o.out_hour),
withri AS (
  SELECT *, CASE WHEN v_nonempty >= {HLL_M} THEN CAST(1 AS BIGINT)
    ELSE CAST(ROUND(CAST({HLL_M} AS DOUBLE) /
         CAST({HLL_M} - v_nonempty AS DOUBLE) * {_LC_RSCALE}.0) AS BIGINT)
    END AS __ri
  FROM merged),
withlg AS ({X.log2fix_duck_sql(
    "SELECT out_hour, v_nonempty, s_present, __ri FROM withri",
    "__ri", "__lg", ["out_hour", "v_nonempty", "s_present"], _LC_NBITS)})
SELECT m.out_hour AS hour, e.exact_distinct,
  CAST(m.v_nonempty AS INT) AS v_nonempty,
  CASE WHEN m.v_nonempty < {HLL_M}
    AND ({_hll_estimate(d, f'({s_total})')}) <= 2.5 * {HLL_M}
  THEN CAST({HLL_M} AS DOUBLE) * {_LN2!r} *
    ((CAST(m.__lg AS DOUBLE) / {1 << _LC_NBITS}.0) - 20.0)
  ELSE ({_hll_estimate(d, f'({s_total})')}) END AS hll_estimate
FROM withlg m JOIN exact e USING (out_hour)"""


# ----------------------------------- SK7: theta-sketch set algebra ---

THETA_K = 256
THETA_SHINGLE = 3   #: sketch 3-token shingles (unigram vocab is degenerate)


def _theta_hex(d: str, kmins: str, k: int) -> str:
    """θ of a KMV sketch as a hex string: the k-th minimum hash, or NULL
    when the sketch holds the entire distinct set (θ = 1)."""
    nth = (f"element_at({kmins}, {k})" if d == X.SPARK
           else f"({kmins})[{k}]")
    return f"CASE WHEN {X.size(d, kmins)} < {k} THEN NULL ELSE {nth} END"


def theta_sketch_pairs(docs: DataFrame, k: int = THETA_K) -> DataFrame:
    """SK7 — pairwise **theta-sketch set algebra** over per-source KMV
    sketches (the Dasgupta et al. / DataSketches framework): for every
    source pair, estimate distinct-shingle |A∪B|, |A∩B|, and Jaccard from
    the two k-minima sketches alone. θ = min(θ_A, θ_B); every retained
    hash below θ is a uniform sample of the union, so
    ``est = n_below · SPACE / θ``; when both sketches are exhaustive
    (fewer than k distinct values), the estimates are exact counts.

    Scale shape: the corpus is touched ONCE to build the per-source
    sketches (same two-level bucket merge as SK1 — only k-minima cross
    the shuffle); all pairwise algebra then runs on the |sources|²-row
    sketch table, i.e. set intersections over 100 TB cost one scan plus
    a driver-trivial pair join — the exact-side alternative
    (`d8_cross_source_overlap`) re-shuffles corpus-scale digests per
    pair family. md5-deterministic, so the oracle checks the estimates
    themselves."""
    sh3 = X.shingles(X.SPARK, X.toks(X.SPARK), THETA_SHINGLE)
    tok = (docs
           .select("source", F.explode(F.expr(sh3)).alias("t"))
           .select("source", F.md5("t").alias("h"),
                   (F.expr(f"instr('{_HEXDIGITS}', substr(md5(t), 1, 1))")
                    - F.lit(1)).alias("bucket")))
    stage1 = (tok.groupBy("source", "bucket")
              .agg(F.expr(f"slice(array_sort(collect_set(h)), 1, {k})")
                   .alias("ks")))
    sk = (stage1.groupBy("source")
          .agg(F.expr(
              f"slice(array_sort(flatten(collect_list(ks))), 1, {k})")
              .alias("kmins"))
          .withColumn("theta", F.expr(_theta_hex(X.SPARK, "kmins", k))))
    a = sk.select(F.col("source").alias("source_a"),
                  F.col("kmins").alias("ka"), F.col("theta").alias("ta"))
    b = sk.select(F.col("source").alias("source_b"),
                  F.col("kmins").alias("kb"), F.col("theta").alias("tb"))
    pairs = (a.join(F.broadcast(b),
                    F.col("source_a") < F.col("source_b"))
             .withColumn("theta", F.least("ta", "tb")))
    below = ("CASE WHEN theta IS NULL THEN {arr} "
             "ELSE filter({arr}, x -> x < theta) END")
    est = (f"CASE WHEN theta IS NULL THEN CAST({{n}} AS DOUBLE) "
           f"ELSE CAST({{n}} AS DOUBLE) * {_HEX32_SPACE!r} / "
           f"GREATEST({_hex32(X.SPARK, 'substr(theta, 1, 8)')}, 1) END")
    return (pairs
            .withColumn("ba", F.expr(below.format(arr="ka")))
            .withColumn("bb", F.expr(below.format(arr="kb")))
            .withColumn("n_inter", F.expr(
                "size(filter(ba, x -> array_contains(bb, x)))"))
            .withColumn("n_union", F.expr(
                "size(array_distinct(concat(ba, bb)))"))
            .select("source_a", "source_b", "n_inter", "n_union",
                    F.expr(est.format(n="n_inter")).alias("est_intersect"),
                    F.expr(est.format(n="n_union")).alias("est_union"),
                    F.expr("CASE WHEN n_union = 0 THEN 0.0 ELSE "
                           "CAST(n_inter AS DOUBLE) / "
                           "CAST(n_union AS DOUBLE) END")
                    .alias("est_jaccard")))


def theta_sketch_pairs_oracle_sql(k: int = THETA_K) -> str:
    d = X.DUCK
    below_a = ("CASE WHEN theta IS NULL THEN ka "
               "ELSE list_filter(ka, x -> x < theta) END")
    below_b = ("CASE WHEN theta IS NULL THEN kb "
               "ELSE list_filter(kb, x -> x < theta) END")
    est = (f"CASE WHEN theta IS NULL THEN CAST({{n}} AS DOUBLE) "
           f"ELSE CAST({{n}} AS DOUBLE) * {_HEX32_SPACE!r} / "
           f"GREATEST({_hex32(d, 'substr(theta, 1, 8)')}, 1) END")
    return f"""
WITH tok AS (
  SELECT source, md5(t) AS h,
    strpos('{_HEXDIGITS}', substr(md5(t), 1, 1)) - 1 AS bucket
  FROM (SELECT source,
          unnest({X.shingles(d, X.toks(d), THETA_SHINGLE)}) AS t
        FROM documents)),
stage1 AS (
  SELECT source, bucket, list_sort(list(DISTINCT h))[1:{k}] AS ks
  FROM tok GROUP BY source, bucket),
sk AS (
  SELECT source, list_sort(flatten(list(ks)))[1:{k}] AS kmins
  FROM stage1 GROUP BY source),
sk2 AS (
  SELECT source, kmins, {_theta_hex(d, 'kmins', k)} AS theta0 FROM sk),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
    a.kmins AS ka, b.kmins AS kb, LEAST(a.theta0, b.theta0) AS theta
  FROM sk2 a JOIN sk2 b ON a.source < b.source),
filtered AS (
  SELECT source_a, source_b, theta,
    {below_a} AS ba, {below_b} AS bb
  FROM pairs),
counted AS (
  SELECT source_a, source_b, theta,
    len(list_filter(ba, x -> list_contains(bb, x))) AS n_inter,
    len(list_distinct(list_concat(ba, bb))) AS n_union
  FROM filtered)
SELECT source_a, source_b,
  CAST(n_inter AS INT) AS n_inter, CAST(n_union AS INT) AS n_union,
  {est.format(n='n_inter')} AS est_intersect,
  {est.format(n='n_union')} AS est_union,
  CASE WHEN n_union = 0 THEN 0.0 ELSE
    CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE) END AS est_jaccard
FROM counted"""
