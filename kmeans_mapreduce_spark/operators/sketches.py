"""Distributed cardinality sketches (HyperLogLog), oracle-replayable.

The reference has no sketches at all (SURVEY §2.2); at 100 TB a
training-data pipeline constantly needs "how many distinct users /
URLs / fingerprints per group" without a COUNT(DISTINCT) shuffle of
every key. Spark's built-in ``approx_count_distinct`` is a HLL too,
but its hash is engine-internal and cannot be replayed by the DuckDB
oracle — so this module implements HLL from scratch on the portable
md5-derived :func:`~kmeans_mapreduce_spark.functions.hashing.h64`,
with **all-integer bucket/rank math** so both engines produce
bit-identical registers and (up to a final 4-digit rounding of the
libm ``ln`` in the linear-counting branch) identical estimates.

Flajolet et al., "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm" (AofA 2007):

- bucket  = low ``p`` bits of the hash          (m = 2^p registers)
- w       = next 32 bits of the hash
- rho(w)  = position of the leftmost 1-bit of w in 32 bits
            (= 32 - floor(log2 w); 33 when w = 0)
- register M_j = max rho over the bucket's values
- E = alpha_m * m^2 / sum_j 2^-M_j   (absent buckets contribute 2^0)
- small-range correction: E <= 2.5m and V empty buckets > 0
  -> linear counting m * ln(m / V)

Scale shape: ``groupBy(groups, bucket).max(rho)`` is map-side
combinable, so the only shuffle carries at most ``groups x m`` rows
regardless of input size — the whole point of a sketch. The register
table is itself mergeable across datasets (max is associative), which
is what makes HLL union-able across partitions/days at 100 TB.

Float discipline for the oracle (why this hash-matches): 2^-M_j is an
exact power of two, and a sum of <= 256 terms each in {2^0..2^-33}
needs 42 significand bits < 53, so the denominator is EXACT and
order-independent; alpha is one shared Python double literal; the
floor(log2) is corrected with exact integer pow-of-two comparisons so
a 1-ulp libm difference can never flip a register.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.functions.hashing import h64, h64_sql
from kmeans_mapreduce_spark.barrier import narrow_barrier

HLL_P = 8  # bucket bits
HLL_M = 1 << HLL_P  # 256 registers
HLL_W_BITS = 32  # rank field width
# alpha_256 from the HLL paper; ONE Python double shared by both
# engines (repr round-trips exactly).
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def _rho(w: Column) -> Column:
    """Leftmost-1-bit position of a 32-bit value, exact in both engines.

    ``k0 = floor(log2 w)`` is libm-computed, then corrected with exact
    integer comparisons against 2^k (exact doubles for k <= 32), so the
    result is the true integer log regardless of ulp error; rho = 32-k.
    """
    k0 = F.floor(F.log2(w)).cast("long")
    k = (
        F.when(F.pow(F.lit(2.0), k0 + 1).cast("long") <= w, k0 + 1)
        .when(F.pow(F.lit(2.0), k0).cast("long") > w, k0 - 1)
        .otherwise(k0)
    )
    return F.when(w == 0, F.lit(HLL_W_BITS + 1)).otherwise(F.lit(HLL_W_BITS) - k)


def hll_registers(
    df: DataFrame, key: str, groups: Sequence[str]
) -> DataFrame:
    """Per-group HLL register table: (groups..., bucket, m_j).

    This is the mergeable sketch state — union register tables from
    several datasets and re-``max`` to sketch their union.
    """
    h = h64(F.col(key).cast("string"))
    bucket = (h % HLL_M).alias("bucket")
    w = (F.shiftright(h, HLL_P) % F.lit(1 << HLL_W_BITS)).alias("w")
    # NULL keys are excluded, matching COUNT(DISTINCT) semantics — an
    # unfiltered NULL would add a phantom NULL-bucket register counted
    # in n_buckets but skipped by the s_present SUM, biasing V
    return (
        df.filter(F.col(key).isNotNull())
        .select(*groups, bucket, w)
        .withColumn("rho", _rho(F.col("w")))
        .groupBy(*groups, "bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_estimate(
    registers: DataFrame, groups: Sequence[str], out: str = "hll_est"
) -> DataFrame:
    """Collapse a register table to one rounded estimate per group."""
    m = float(HLL_M)
    agg = registers.groupBy(*groups).agg(
        F.sum(F.pow(F.lit(0.5), F.col("m_j"))).alias("s_present"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    v = F.lit(HLL_M) - F.col("n_buckets")
    denom = F.col("s_present") + v.cast("double")
    e_raw = F.lit(HLL_ALPHA) * F.lit(m * m) / denom
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(m) * F.log(F.lit(m) / v.cast("double")),
    ).otherwise(e_raw)
    return agg.select(*groups, F.round(est, 4).alias(out))


def hll_distinct(
    df: DataFrame, key: str, groups: Sequence[str], out: str = "hll_est"
) -> DataFrame:
    """Estimate COUNT(DISTINCT key) per group via the portable HLL."""
    return hll_estimate(hll_registers(df, key, groups), groups, out)


CMS_DEPTH = 4  # hash rows (independent seeded members of the md5 family)
CMS_WIDTH = 1024  # counters per row


def cms_hash_cols(key: Column) -> Column:
    """Array of CMS_DEPTH (row, column) structs for one key — the d
    seeded-hash bucket coordinates, computed narrow per row."""
    from kmeans_mapreduce_spark.functions.hashing import h64_seeded

    return F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (h64_seeded(key, j) % CMS_WIDTH).alias("col"),
            )
            for j in range(CMS_DEPTH)
        ]
    )


def cms_sketch(df: DataFrame, key: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan, J.Alg 2005) of a key
    column's frequencies: a (j, col, cnt) table of d x w counters.

    All-integer, so the DuckDB oracle replays it exactly. Mergeable by
    summing counters. Scale shape: one narrow explode (d rows per
    input row) into a groupBy over at most d*w = 4096 keys — map-side
    combine collapses each partition to <= 4096 partial counters, so
    the exchange is constant-size regardless of input rows, same story
    as the HLL registers."""
    return (
        df.filter(F.col(key).isNotNull())
        .select(F.explode(cms_hash_cols(F.col(key))).alias("p"))
        .select(F.col("p.j").alias("j"), F.col("p.col").alias("col"))
        .groupBy("j", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, probes: DataFrame, key: str) -> DataFrame:
    """Point-query the sketch: est(key) = min over rows j of the
    counter at (j, h_j(key)) — an upper bound on the true count that is
    exact when the key collides with nothing in some row. The probe
    side is tiny (candidate heavy hitters) and the sketch is 4096 rows,
    so the join broadcasts."""
    coords = probes.filter(F.col(key).isNotNull()).select(
        key, F.explode(cms_hash_cols(F.col(key))).alias("p")
    ).select(key, F.col("p.j").alias("j"), F.col("p.col").alias("col"))
    return (
        coords.join(F.broadcast(sketch), ["j", "col"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def cms_sql(key_expr: str, relation: str) -> str:
    """DuckDB twin CTEs: ``cms_all`` (per-row hash coordinates) and
    ``cms_sketch`` (j, col, cnt). Probe queries build their own
    coordinate CTE with the same ``h64_seeded_sql`` calls (see
    analytics._cms_oracle). NULL keys are excluded, mirroring
    cms_sketch (Spark's concat_ws would otherwise hash the bare seed
    string into a real counter while DuckDB's ``||`` yields NULL —
    divergent and both wrong)."""
    from kmeans_mapreduce_spark.functions.hashing import h64_seeded_sql

    rows = " UNION ALL ".join(
        f"SELECT {j} AS j, ({h64_seeded_sql(key_expr, j)}) % {CMS_WIDTH} AS col"
        f" FROM {relation} WHERE ({key_expr}) IS NOT NULL"
        for j in range(CMS_DEPTH)
    )
    return f"cms_all AS ({rows}),\ncms_sketch AS (SELECT j, col, COUNT(*) AS cnt FROM cms_all GROUP BY j, col)"


HIST_NBINS = 64


def hist_sketch(
    df: DataFrame,
    value: str,
    groups: Sequence[str],
    lo: float,
    hi: float,
    nbins: int = HIST_NBINS,
) -> DataFrame:
    """Equi-width histogram sketch: (groups..., bin, cnt) with values
    clamped into [lo, hi). The third mergeable-sketch family next to
    HLL (distinct) and CMS (frequency): quantiles/distribution shape.

    Counts are sum-mergeable and the exchange is bounded by
    groups x nbins after map-side combine — vs exact percentiles,
    which shuffle every value to its group. Bin assignment is one
    IEEE-exact division + floor (division is correctly rounded, not
    libm), so both engines bin identically."""
    width = (hi - lo) / nbins
    raw = F.floor((F.col(value) - F.lit(lo)) / F.lit(width)).cast("long")
    b = F.greatest(F.lit(0), F.least(F.lit(nbins - 1), raw))
    # NULLs would slip past least/greatest into the top bin (Spark's
    # least/greatest skip NULL operands); NaN bins at 0 Spark-side but
    # crashes DuckDB's CAST — observations must be real numbers
    return (
        df.filter(F.col(value).isNotNull() & ~F.isnan(F.col(value)))
        .select(*groups, b.alias("bin"))
        .groupBy(*groups, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_quantiles(
    hist: DataFrame,
    groups: Sequence[str],
    qs: Sequence[float],
    lo: float,
    hi: float,
    nbins: int = HIST_NBINS,
    digits: int = 6,
) -> DataFrame:
    """Interpolated quantile estimates from a histogram sketch.

    For each q: rank r = q·(n−1); the unique bin with
    cum_prev <= r < cum_incl (empty bins can't match) yields
    est = lo + width·(bin + (r − cum_prev)/cnt) — linear interpolation
    within the bin. One row per (group, q), value rounded.
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(*groups)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    width = (hi - lo) / nbins
    cum = hist.withColumn("cum_incl", F.sum("cnt").over(w)).withColumn(
        "cum_prev", F.col("cum_incl") - F.col("cnt")
    )
    totals = hist.groupBy(*groups).agg(F.sum("cnt").alias("n"))
    qdf = F.array(*[F.lit(float(q)) for q in qs])
    probe = (
        cum.join(totals, list(groups))
        .select(*groups, "bin", "cnt", "cum_prev", "cum_incl", "n",
                F.explode(qdf).alias("q"))
        .withColumn("r", F.col("q") * (F.col("n") - 1).cast("double"))
        .filter(
            (F.col("cum_prev").cast("double") <= F.col("r"))
            & (F.col("r") < F.col("cum_incl").cast("double"))
        )
    )
    est = F.lit(lo) + F.lit(width) * (
        F.col("bin").cast("double")
        + (F.col("r") - F.col("cum_prev").cast("double"))
        / F.col("cnt").cast("double")
    )
    return probe.select(
        *groups, "q", F.round(est, digits).alias("quantile_est")
    )


def hist_sql(
    value_expr: str,
    group_expr: str,
    relation: str,
    qs: Sequence[float],
    lo: float,
    hi: float,
    nbins: int = HIST_NBINS,
    gname: str = "g",
) -> str:
    """DuckDB twin of hist_sketch |> hist_quantiles (single group col).

    Output: (gname, q, quantile_est)."""
    width = (hi - lo) / nbins
    q_rows = ", ".join(f"({float(q)!r}::DOUBLE)" for q in qs)
    return f"""
hb AS (
  SELECT {group_expr} AS g,
         GREATEST(0, LEAST({nbins - 1},
           CAST(floor(({value_expr} - {float(lo)!r}::DOUBLE) / {width!r}::DOUBLE) AS BIGINT)
         )) AS bin
  FROM {relation}
  WHERE ({value_expr}) IS NOT NULL AND NOT isnan({value_expr})
),
hist AS (SELECT g, bin, COUNT(*) AS cnt FROM hb GROUP BY g, bin),
cum AS (
  SELECT g, bin, cnt,
         SUM(cnt) OVER (PARTITION BY g ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_incl,
         SUM(cnt) OVER (PARTITION BY g ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt AS cum_prev
  FROM hist
),
tot AS (SELECT g, SUM(cnt) AS n FROM hist GROUP BY g),
qv(q) AS (VALUES {q_rows}),
probe AS (
  SELECT c.g, qv.q, c.bin, c.cnt, c.cum_prev,
         qv.q * (t.n - 1)::DOUBLE AS r
  FROM cum c JOIN tot t ON c.g = t.g CROSS JOIN qv
  WHERE c.cum_prev::DOUBLE <= qv.q * (t.n - 1)::DOUBLE
    AND qv.q * (t.n - 1)::DOUBLE < c.cum_incl::DOUBLE
)
SELECT g AS {gname}, q,
       ROUND({float(lo)!r}::DOUBLE + {width!r}::DOUBLE *
             (bin::DOUBLE + (r - cum_prev::DOUBLE) / cnt::DOUBLE), 6) AS quantile_est
FROM probe"""


def hll_sql(key_expr: str, group_expr: str, relation: str, out: str) -> str:
    """DuckDB twin of :func:`hll_distinct` (one grouping column)."""
    h = h64_sql(key_expr)
    return f"""
hx_{out} AS (
  SELECT {group_expr} AS g, {h} AS h FROM {relation}
  WHERE ({key_expr}) IS NOT NULL
),
wb_{out} AS (
  SELECT g, h % {HLL_M} AS bucket, (h >> {HLL_P}) % {1 << HLL_W_BITS} AS w
  FROM hx_{out}
),
rho_{out} AS (
  SELECT g, bucket,
    CASE WHEN w = 0 THEN {HLL_W_BITS + 1} ELSE {HLL_W_BITS} - (
      CASE
        WHEN CAST(pow(2.0::DOUBLE, CAST(floor(log2(w)) AS BIGINT) + 1) AS BIGINT) <= w
          THEN CAST(floor(log2(w)) AS BIGINT) + 1
        WHEN CAST(pow(2.0::DOUBLE, CAST(floor(log2(w)) AS BIGINT)) AS BIGINT) > w
          THEN CAST(floor(log2(w)) AS BIGINT) - 1
        ELSE CAST(floor(log2(w)) AS BIGINT)
      END) END AS rho
  FROM wb_{out}
),
reg_{out} AS (
  SELECT g, bucket, MAX(rho) AS m_j FROM rho_{out} GROUP BY g, bucket
),
est_{out} AS (
  SELECT g,
    ROUND(
      CASE
        WHEN {HLL_ALPHA!r}::DOUBLE * {float(HLL_M) * HLL_M!r}::DOUBLE
               / (SUM(pow(0.5::DOUBLE, m_j)) + ({HLL_M} - COUNT(*))::DOUBLE)
             <= {2.5 * HLL_M!r}::DOUBLE
         AND {HLL_M} - COUNT(*) > 0
        THEN {float(HLL_M)!r}::DOUBLE
               * ln({float(HLL_M)!r}::DOUBLE / ({HLL_M} - COUNT(*))::DOUBLE)
        ELSE {HLL_ALPHA!r}::DOUBLE * {float(HLL_M) * HLL_M!r}::DOUBLE
               / (SUM(pow(0.5::DOUBLE, m_j)) + ({HLL_M} - COUNT(*))::DOUBLE)
      END, 4) AS {out}
  FROM reg_{out} GROUP BY g
)"""


# ---------------------------------------------------------------------------
# Bloom filter — semi-join reduction (runtime filter), oracle-replayable
# ---------------------------------------------------------------------------

BLOOM_WORDS = 128  # default bitmap size in long words (oracle twin pins this)
BLOOM_WORD_BITS = 62  # bits used per word (shift <= 61 never overflows
#                       a signed 64-bit value in either engine)
BLOOM_K = 3  # hash functions (20-bit slices of one 60-bit hash)
BLOOM_BITS_PER_KEY = 10  # sizing target for the auto-sized semi-join filter
BLOOM_MAX_WORDS = 16384  # 1,015,808 bits <= 2^20 (slice width); ~100k keys


def _bloom_hash(key: Column, native: bool) -> Column:
    """Base hash. ``native=False`` -> portable md5 (DuckDB-replayable,
    used by the register math-check); ``native=True`` -> xxhash64
    (JVM-fast, ~6× cheaper per probe row — fine whenever the filter's
    bits never need replaying, i.e. the semi-join path, whose oracle is
    the plain semi-join)."""
    from kmeans_mapreduce_spark.functions.hashing import h64

    if native:
        return F.xxhash64(key)
    return h64(key)


def bloom_positions(
    key: Column, words: int = BLOOM_WORDS, native: bool = False
) -> Column:
    """Array of the K bit positions one key sets. ONE hash per key (not
    K seeded hashes): the hash is sliced into K 20-bit fields, each
    reduced mod the bitmap size — the slice-one-hash trick the HLL
    uses, so the (huge) probe side hashes each fact row once."""
    bits = words * BLOOM_WORD_BITS
    assert bits <= 1 << 20, "bitmap exceeds the 20-bit slice space"
    h = _bloom_hash(key, native)
    return F.array(
        *[
            (
                F.shiftrightunsigned(h, 20 * j)
                .bitwiseAND(F.lit((1 << 20) - 1))  # sign-safe slice
                % bits
            ).cast("long")
            for j in range(BLOOM_K)
        ]
    )


def bloom_registers(
    df: DataFrame, key: str, words: int = BLOOM_WORDS, native: bool = False
) -> DataFrame:
    """Build-side sketch: ``(word, bits)`` rows, ``bit_or``-merged.

    Bloom (CACM 1970). Scale shape mirrors the HLL/CMS registers: one
    narrow explode (K rows per input row) into a groupBy over at most
    ``words`` keys — map-side combine collapses every partition to
    constant-size partials, so the exchange is constant however large
    the build side is, and register tables from different datasets
    merge with another ``bit_or``."""
    return (
        df.select(
            F.explode(
                bloom_positions(F.col(key).cast("string"), words, native)
            ).alias("pos")
        )
        .select(
            F.expr(f"pos div {BLOOM_WORD_BITS}").alias("word"),
            F.expr(f"shiftleft(1L, cast(pos % {BLOOM_WORD_BITS} as int))").alias(
                "mask"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_filter_words(
    registers: DataFrame, words: int = BLOOM_WORDS
) -> list[int]:
    """Collect the register table into a dense bitmap list (absent
    words are 0). The collect moves at most ``words`` rows — the whole
    point: a KB-scale summary of an arbitrarily large key set."""
    got = {r["word"]: r["bits"] for r in registers.collect()}
    return [got.get(w, 0) for w in range(words)]


def _bloom_cond(
    key: Column, bitmap: Column, n_words: int, native: bool
) -> Column:
    """Membership conjunction against an array-typed bitmap column."""
    bits = n_words * BLOOM_WORD_BITS
    h = _bloom_hash(key, native)
    conds = []
    for j in range(BLOOM_K):
        pos = (
            F.shiftrightunsigned(h, 20 * j).bitwiseAND(F.lit((1 << 20) - 1))
            % bits
        )
        word = F.floor(pos / F.lit(BLOOM_WORD_BITS)).cast("int")
        bit = (pos % BLOOM_WORD_BITS).cast("int")
        mask = F.pow(F.lit(2.0), bit).cast("long")  # 2^b <= 2^61, exact
        conds.append(F.element_at(bitmap, word + 1).bitwiseAND(mask) != 0)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def bloom_might_contain(
    key: Column, words: list[int], native: bool = False
) -> Column:
    """Membership predicate over the driver-collected bitmap, inlined
    as a literal array so Catalyst constant-folds it — the probe side
    is a pure narrow filter (scan → filter, no join, no shuffle),
    exactly the shape of Spark's own runtime bloom pruning. False
    positives possible, false negatives impossible.

    Expression-literal form: fine for the default 128-word bitmap; for
    the auto-sized thousands-of-words filter the expression tree makes
    analysis/codegen the bottleneck (measured 12-20 s at 8192 words) —
    :func:`bloom_semi_join` ships the bitmap as a broadcast 1-row
    dataset instead."""
    arr = F.array(*[F.lit(int(w)).cast("long") for w in words])
    return _bloom_cond(key, arr, len(words), native)


def bloom_semi_join(
    fact: DataFrame,
    build: DataFrame,
    fact_key: str,
    build_key: str,
    bits_per_key: int = BLOOM_BITS_PER_KEY,
) -> DataFrame:
    """Exact semi-join with a bloom pre-filter on the fact side.

    At 100 TB this is the classic semi-join reduction: the bloom filter
    (built with one constant-size-shuffle pass over the small side and
    shipped to every executor as a literal bitmap) drops most
    non-matching fact rows *before* any exchange, so the exact join —
    broadcast here; a shuffle join when the build side is huge — only
    sees survivors. The trailing exact join removes bloom false
    positives, so the result is identical to a plain semi-join, which
    is what the DuckDB oracle checks.

    The bitmap is SIZED from the build cardinality (~10 bits/key →
    ~1% false positives), capped at ~1 Mbit / ~128 KB of literals;
    beyond ~100k build keys a literal-expression filter stops making
    sense — switch to Spark's built-in runtime row filters or accept
    the shuffle. Hashing is native xxhash64 (the filter's bits are
    internal here; only the md5 register QUERY needs cross-engine
    replay)."""
    keys = build.select(F.col(build_key).alias(fact_key)).distinct()
    keys = keys.transform(narrow_barrier)
    n = keys.count()
    need = max(BLOOM_WORDS, (n * bits_per_key + BLOOM_WORD_BITS - 1) // BLOOM_WORD_BITS)
    words_n = min(BLOOM_MAX_WORDS, 1 << (need - 1).bit_length())
    words = bloom_filter_words(
        bloom_registers(keys, fact_key, words_n, native=True), words_n
    )
    # bitmap rides a broadcast 1-row dataset, NOT a literal expression:
    # a KB-scale array literal makes analysis/codegen the bottleneck
    bitmap_df = fact.sparkSession.createDataFrame(
        [([int(w) for w in words],)], "_bloom_bitmap array<bigint>"
    )
    pruned = (
        fact.crossJoin(F.broadcast(bitmap_df))
        .filter(
            _bloom_cond(
                F.col(fact_key).cast("string"),
                F.col("_bloom_bitmap"),
                words_n,
                native=True,
            )
        )
        .drop("_bloom_bitmap")
    )
    return pruned.join(F.broadcast(keys), fact_key, "left_semi")


def bloom_sql(key_expr: str, relation: str) -> str:
    """DuckDB twin CTE ``bloom_registers(word, bits)`` — identical
    integer math (md5 base hash, 20-bit slices, default 128 words), so
    registers hash-match Spark's bit for bit."""
    from kmeans_mapreduce_spark.functions.hashing import h64_sql

    bits = BLOOM_WORDS * BLOOM_WORD_BITS
    rows = " UNION ALL ".join(
        f"SELECT (({h64_sql(key_expr)} >> {20 * j}) % {1 << 20})"
        f" % {bits} AS pos FROM {relation}"
        for j in range(BLOOM_K)
    )
    return (
        f"bloom_pos AS ({rows}),\n"
        f"bloom_registers AS (SELECT pos // {BLOOM_WORD_BITS} AS word,"
        f" bit_or(1::BIGINT << CAST(pos % {BLOOM_WORD_BITS} AS INT)) AS bits"
        f" FROM bloom_pos GROUP BY 1)"
    )


# ---------------------------------------------------------------------------
# Order-independent table digest (replica / migration verification)
# ---------------------------------------------------------------------------

DIGEST_MOD = 16 ** 15  # 2^60 — keeps the summed digest in BIGINT range


def table_digest(df: DataFrame, row_str: Column, bucket: Column) -> DataFrame:
    """Per-bucket order-independent content digest — the cheap way to
    verify a 100 TB replica, migration, or backfill: each side runs ONE
    narrow scan and compares O(buckets) digest rows instead of shipping
    or sorting data. ``row_str`` is the caller's canonical row
    rendering (exact-integer fields only — float text formatting is not
    portable across engines); ``bucket`` is the partition key the
    comparison is reported at (e.g. the ingest day).

    Two digests per bucket, both commutative/associative and therefore
    map-side combinable and partition-mergeable:

    - ``digest_sum``: Σ h64(row) mod 2^60 — multiset-sensitive, so a
      row duplicated on one side (which XOR silently cancels at even
      counts) still shifts the sum;
    - ``digest_xor``: XOR of h64(row) — any single-row content
      difference flips it with certainty.

    With ``n_rows`` alongside, the triple detects every practical
    divergence class (missing, extra, corrupted, duplicated rows). The
    sum accumulates in DECIMAL(38,0) before the mod — Spark 4 runs
    ANSI mode, where a raw BIGINT SUM over 2^60-sized values would
    overflow-throw at scale (DuckDB widens to HUGEINT; the decimal
    route is the portable one).
    """
    h = h64(row_str)
    return (
        df.select(bucket.alias("bucket"), h.alias("h"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr(
                f"cast(sum(cast(h as decimal(38,0))) % {DIGEST_MOD} as long)"
            ).alias("digest_sum"),
            F.bit_xor("h").alias("digest_xor"),
        )
    )
