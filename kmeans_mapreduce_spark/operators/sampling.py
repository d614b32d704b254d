"""Reproducible corpus sampling + distribution statistics (north-star
training-data-pipeline operators; the reference has no sampling at all
— its only randomness is centroid init, SURVEY §2.1 O11).

Hash-based stratified sampling is the scale-correct way to subsample a
100 TB corpus: membership is a pure function of the row key (no RNG
state, no per-partition seed coupling, stable across reruns and task
retries — ``F.rand`` sampling is none of those), the predicate is a
narrow map evaluated inside the scan stage with zero shuffle, and the
per-stratum rate is a literal CASE chain. The same definition runs
verbatim in the DuckDB oracle because the hash is the portable md5-
based ``h64``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.functions.hashing import HASH_SPACE, h64
from kmeans_mapreduce_spark.functions.text import n_tokens
from kmeans_mapreduce_spark.barrier import narrow_barrier

SAMPLE_BUCKETS = 10_000  # rate resolution: 1 bucket = 0.01%
SAMPLE_SALT = "sample"  # decorrelates the sample hash from other h64 uses


def round_half_up(x: float) -> int:
    """The ONE rate→threshold rule every sampler (and every DuckDB twin
    generator) shares: floor(x + 0.5). Python ``round()`` is banker's
    half-even, ``weighted_sample``'s SQL expression is floor(+0.5) —
    mixing the two makes the samplers disagree at any rate whose
    w·SAMPLE_BUCKETS lands exactly on .5 (e.g. 0.00025 → 2.5: round
    gives 2, half-up gives 3)."""
    import math

    return int(math.floor(x + 0.5))


def sample_bucket(doc_id: Column, salt: str = SAMPLE_SALT) -> Column:
    """Uniform bucket in [0, SAMPLE_BUCKETS) from the salted row key."""
    return F.pmod(
        # NULL-propagating concat (NOT concat_ws, which skips null
        # operands: every NULL id would hash to the bare salt and be
        # kept/dropped as one block) — also matches the twins' '||'
        h64(F.concat(F.lit(salt), F.lit(":"), doc_id.cast("string"))),
        F.lit(SAMPLE_BUCKETS),
    )


def hash_sample_stratified(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float,
    stratum_col: str = "lang",
) -> DataFrame:
    """Deterministic stratified sample: keep a row iff its hash bucket
    falls under its stratum's threshold. Rates are per-stratum keep
    fractions (e.g. ``{"en": 0.5}`` with ``default_rate=0.1`` keeps
    ~50% of English docs and ~10% of everything else).

    Plan shape: scan → narrow filter. No shuffle, no RNG, no driver
    state; re-running on the same data always returns the same rows
    (what a training-data pipeline needs for auditable subsampling).
    """
    # round (half-up), don't truncate: 0.1 * 10000 is 999.999... in
    # binary — int() would keep 999 buckets for a requested 10% (off
    # by one bucket for many exact decimal rates). Half-up rather than
    # Python round()'s half-even so this sampler and weighted_sample's
    # floor(w*B + 0.5) expression agree at every representable rate.
    threshold = F.lit(round_half_up(default_rate * SAMPLE_BUCKETS))
    for stratum, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(stratum_col) == stratum,
            F.lit(round_half_up(rate * SAMPLE_BUCKETS)),
        ).otherwise(threshold)
    return docs.filter(sample_bucket(F.col("doc_id")) < threshold)


TEMP_SALT = "tempmix"  # decorrelated from the plain sample hash


def temperature_sample(
    docs: DataFrame, stratum_col: str = "lang", salt: str = TEMP_SALT
) -> DataFrame:
    """Temperature-rebalanced corpus mix (the mT5/ROOTS recipe at
    α = 0.5): per-stratum keep rate ``r_s = sqrt(n_min / n_s)``, so the
    rarest stratum keeps everything and high-resource strata are
    downsampled toward a flattened distribution (expected counts
    ∝ sqrt(n_s)).

    α is pinned to 0.5 deliberately: the rate is then one division and
    one square root — both IEEE correctly-rounded operations — so the
    DuckDB oracle computes the bit-identical threshold with no libm
    ``pow`` drift and no float-summation-order dependence (there is no
    sum at all).

    Plan shape: one K-row count aggregate (K = #strata, collected to
    the driver), then a narrow hash filter with literal integer
    thresholds — the 100 TB corpus is never joined or shuffled.
    Membership is a pure function of (salt, doc_id): retry-stable,
    auditable, re-runnable.
    """
    import math

    # NULL strata are excluded (cannot be compared in the CASE chain
    # below; the DuckDB twin's inner join on the stratum drops them the
    # same way) — a NULL-stratum row is never sampled
    counts = {
        r[0]: r[1]
        for r in docs.filter(F.col(stratum_col).isNotNull())
        .groupBy(stratum_col)
        .count()
        .collect()
    }
    if not counts:
        return docs.filter(F.lit(False)).select("doc_id", stratum_col)
    n_min = min(counts.values())
    threshold = F.lit(0)
    for stratum, n in sorted(counts.items()):
        thr = math.floor(SAMPLE_BUCKETS * math.sqrt(n_min / n))
        threshold = F.when(
            F.col(stratum_col) == stratum, F.lit(thr)
        ).otherwise(threshold)
    return docs.filter(
        sample_bucket(F.col("doc_id"), salt=salt) < threshold
    ).select("doc_id", stratum_col)


SHUFFLE_SALT = "shuffle-epoch0"  # new salt per epoch = fresh permutation


def global_shuffle(
    docs: DataFrame, n_shards: int = 32, salt: str = SHUFFLE_SALT
) -> DataFrame:
    """Deterministic global corpus shuffle for training-epoch
    materialization: each doc gets a salted 60-bit ``shuffle_key`` and
    a ``shard`` (key mod n_shards). Writing partitionBy(shard) with a
    per-shard ORDER BY shuffle_key materializes a full pseudo-random
    permutation of the corpus — without a single-partition global
    window (row_number over an unpartitioned window is the classic
    driver-chokepoint anti-pattern) and without RNG (``F.rand`` order
    is retry-unstable, so a task retry under speculation would emit a
    DIFFERENT epoch). A new salt per epoch gives an independent
    permutation. Plan shape: pure narrow map; the sort happens in the
    sharded write, range-partitioned per shard."""
    key = h64(F.concat(F.lit(salt), F.lit(":"), F.col("doc_id").cast("string")))
    return docs.select(
        "doc_id",
        key.alias("shuffle_key"),
        F.pmod(key, F.lit(n_shards)).cast("int").alias("shard"),
    )


WEIGHTED_SALT = "weighted"  # decorrelated: composing with the
# stratified sampler must multiply keep probabilities, not min() them
# (the same bucket under one shared salt makes membership fully
# correlated)


def weighted_sample(
    docs: DataFrame, weight: Column, salt: str = WEIGHTED_SALT
) -> DataFrame:
    """Per-ROW-weighted deterministic Bernoulli sample: keep a row with
    probability ``weight`` (a [0,1] column, e.g. a quality score) — the
    quality-proportional subsampling step of a training-data mix, with
    the same retry-stable, shuffle-free properties as the stratified
    form (membership is a pure function of the row key).

    The keep threshold is ``floor(weight * SAMPLE_BUCKETS + 0.5)``
    compared against the salted hash bucket — integer vs integer, so
    the DuckDB oracle reproduces membership exactly (the float
    multiply and the +0.5 are shared IEEE ops; floor of an identical
    double is identical). Half-up, not truncation: the stratified
    sampler's "round, don't truncate" rule — bare floor under-keeps
    every rate whose binary double rounds down (0.3·10000 =
    2999.999…), making the two samplers disagree at the same nominal
    rate.
    """
    threshold = F.floor(
        F.least(F.lit(1.0), F.greatest(F.lit(0.0), weight))
        * F.lit(float(SAMPLE_BUCKETS))
        + F.lit(0.5)
    ).cast("long")
    return docs.filter(sample_bucket(F.col("doc_id"), salt) < threshold)


def pack_sequences(
    docs_with_tokens: DataFrame,
    budget_tokens: int,
    stratum_col: str = "lang",
    order_col: str = "doc_id",
) -> DataFrame:
    """Greedy sequence PACKING: assign documents (in a deterministic
    per-stratum order) to consecutive token-budget bins — the step a
    training pipeline runs to pack documents into fixed context
    windows. Bin id = floor(prefix_tokens_before_doc / budget): a doc
    opens a new bin when the running total crosses the budget (next-fit
    packing — bins may overflow by at most one document, a doc spanning
    several budget widths skips the intervening bin ids, and a doc
    starting just under a boundary can leave a short bin; the standard
    streaming approximation. Optimal bin packing is NP-hard and
    order-dependent, which a distributed engine should not promise).

    One window per stratum (running sum over a deterministic order) —
    a single shuffle keyed by stratum; everything else is narrow.
    Input needs (stratum, order, n_tokens); output adds bin_id.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(stratum_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return docs_with_tokens.withColumn(
        "bin_id",
        F.floor((cum - F.col("n_tokens")) / F.lit(budget_tokens)).cast("long"),
    )


def token_quantiles(
    docs: DataFrame, probs: tuple[float, ...], digits: int = 6
) -> DataFrame:
    """Per-language exact token-count quantiles (linear interpolation,
    the shared type-7 definition of Spark ``percentile`` and DuckDB
    ``quantile_cont``) — the corpus length-distribution profile a
    pipeline uses to pick truncation/packing budgets.

    Exact order statistics are deterministic (no summation-order noise;
    only the interpolation arithmetic needs rounding), so the oracle
    matches at 6 digits. One shuffle keyed by stratum; at real scale
    swap in ``approx_percentile`` for the sketch-merge form (excluded
    from the oracle gate by design — sketches are engine-specific).

    Output long format: (lang, q_idx, q_value).
    """
    g = (
        docs.select(
            "lang", n_tokens(F.col("text")).cast("double").alias("nt")
        )
        .groupBy("lang")
        .agg(
            F.percentile(F.col("nt"), F.array(*[F.lit(p) for p in probs])).alias(
                "qs"
            )
        )
    )
    return g.select(
        "lang",
        F.posexplode("qs").alias("q_idx", "qv"),
    ).select(
        "lang",
        F.col("q_idx").cast("int").alias("q_idx"),
        F.round(F.col("qv"), digits).alias("q_value"),
    )


SPLIT_SALT = "split"  # decorrelates split membership from sample hashes
SPLIT_TRAIN_PCT = 90


def leakage_safe_split(
    docs: DataFrame,
    dup_pairs: DataFrame,
    train_pct: int = SPLIT_TRAIN_PCT,
    salt: str = SPLIT_SALT,
) -> DataFrame:
    """Group-aware train/eval split: every member of a near-duplicate
    cluster lands on the SAME side, so eval can never contain a near-
    copy of a training document (the standard leakage control when
    splitting a deduplicated-but-not-pruned corpus; composes the
    dedup family's connected components with the hash-split sampler).

    ``dup_pairs`` is any (doc_a, doc_b) near-dup edge set (minhash-LSH
    verified pairs here). The split key is the cluster's canonical id
    (min reachable doc_id; a doc outside every cluster is its own
    canonical), hashed with the portable h64 — membership is a pure
    function of the data, stable across reruns and engines.

    Scale shape: connected components runs on the EDGE set (≪ corpus);
    the canonical map — one row per *clustered* doc only — is
    broadcast to the corpus scan, so the corpus side never shuffles:
    scan → broadcast left join → narrow projection. At 100 TB with an
    unusually dup-heavy corpus the broadcast would be swapped for a
    shuffle join on doc_id; the semantics don't change.
    """
    from kmeans_mapreduce_spark.operators.dedup import connected_components

    cc = connected_components(dup_pairs)
    bucket = F.pmod(
        h64(
            F.concat(
                F.lit(salt), F.lit(":"), F.col("canonical_id").cast("string")
            )
        ),
        F.lit(100),
    )
    return (
        docs.select("doc_id")
        .join(F.broadcast(cc), "doc_id", "left")
        .withColumn(
            "canonical_id", F.coalesce(F.col("cluster_rep"), F.col("doc_id"))
        )
        .withColumn(
            "split",
            F.when(bucket < train_pct, F.lit("train")).otherwise(F.lit("eval")),
        )
        .select("doc_id", "canonical_id", "split")
    )


def snapshot_diff(snap_a: DataFrame, snap_b: DataFrame) -> DataFrame:
    """Corpus snapshot diff — the dataset-versioning primitive a
    training pipeline needs between crawl refreshes: classify every
    doc_id as added / removed / changed / unchanged by comparing
    content fingerprints across two snapshots.

    Inputs are any (doc_id, text) frames. Scale shape: fingerprint is
    a narrow md5 projection computed inside each scan; the full outer
    join shuffles both sides once, co-partitioned on doc_id (bucketed
    snapshot storage makes it exchange-free); the status CASE is a
    narrow map. Nothing is collected; output is one row per doc_id in
    either snapshot.
    """
    # presence is tracked with indicator columns, NOT fingerprint
    # nullability: a doc PRESENT with NULL text would otherwise be
    # misread as absent; the fingerprint comparison is null-safe for
    # the same reason
    a = snap_a.select(
        "doc_id", F.md5("text").alias("fp_a"), F.lit(True).alias("in_a")
    )
    b = snap_b.select(
        "doc_id", F.md5("text").alias("fp_b"), F.lit(True).alias("in_b")
    )
    j = a.join(b, "doc_id", "full_outer")
    return j.select(
        "doc_id",
        F.when(F.col("in_a").isNull(), F.lit("added"))
        .when(F.col("in_b").isNull(), F.lit("removed"))
        .when(~F.col("fp_a").eqNullSafe(F.col("fp_b")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


SNAPSHOT_ADD_SHIFT = 1 << 40  # re-key offset for simulated 'added'
# docs: far above any real doc_id vintage (and any packed id), so a
# shifted id can never collide with a kept row — a +1e6 shift silently
# duplicated ids once the corpus contained doc_id >= 1e6


def simulate_next_snapshot(docs: DataFrame) -> DataFrame:
    """Deterministic 'next crawl' twin of the documents table for the
    snapshot-diff query (the testdata ships one snapshot): drops
    doc_id % 13 == 0, edits the text of doc_id % 11 == 0, and adds a
    re-keyed copy of doc_id % 17 == 0 (shifted by SNAPSHOT_ADD_SHIFT,
    collision-free by construction) — pure column expressions, so
    the DuckDB oracle regenerates the identical snapshot."""
    kept = docs.filter(F.col("doc_id") % 13 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" v2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    added = docs.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + F.lit(SNAPSHOT_ADD_SHIFT)).alias("doc_id"),
        "text",
    )
    return kept.unionByName(added)


CURRICULUM_SALT = "curriculum"
CURRICULUM_PROBS = (0.25, 0.5, 0.75)


def curriculum_phases(
    docs: DataFrame,
    probs: tuple[float, ...] = CURRICULUM_PROBS,
    digits: int = 6,
) -> DataFrame:
    """Curriculum ordering: (doc_id, phase, order_key) where phase 1..4
    is the document's quality quartile (phase 1 = lowest — train
    easy-to-score-high data last or first, the caller's curriculum
    policy) and order_key is a salted hash giving a deterministic,
    retry-stable shuffle WITHIN each phase.

    Scale shape: the three quantile thresholds are ONE 1-row exact
    percentile aggregate broadcast back onto the scan (the same
    threshold-broadcast trick as temperature_sample) — phase assignment
    is then a narrow comparison, never a global NTILE sort, which would
    funnel the corpus through one partition. At real scale swap the
    exact percentile for approx_percentile; the plan shape is
    unchanged."""
    from kmeans_mapreduce_spark.operators.textops import quality

    q = quality(docs).select("doc_id", "quality_score").transform(
        narrow_barrier
    )  # threshold agg AND the projection both consume it: one scoring pass
    th = q.agg(
        F.percentile(
            F.col("quality_score"), F.array(*[F.lit(p) for p in probs])
        ).alias("qs")
    ).select(
        *[
            F.round(F.element_at("qs", i + 1), digits).alias(f"__t{i}")
            for i in range(len(probs))
        ]
    )
    phase = F.lit(1)
    for i in range(len(probs)):
        phase = phase + (F.col("quality_score") > F.col(f"__t{i}")).cast("int")
    return q.crossJoin(F.broadcast(th)).select(
        "doc_id",
        phase.cast("int").alias("phase"),
        h64(
            F.concat(
                F.lit(CURRICULUM_SALT + ":"), F.col("doc_id").cast("string")
            )
        ).alias("order_key"),
    )


FIXED_SAMPLE_SALT = "fixed"
FIXED_SAMPLE_N = 100


def fixed_size_sample(docs: DataFrame, n: int = FIXED_SAMPLE_N) -> DataFrame:
    """Deterministic fixed-SIZE sample: exactly ``n`` rows (not a
    rate) — the fixed-budget eval-set / human-review primitive. Rows
    are ranked by a salted hash of their id (uniform, RNG-free, stable
    under retries and data reordering; ties impossible modulo 60-bit
    collisions, broken by doc_id anyway), so the same n docs come back
    every run and adding new docs only displaces border cases.

    Scale shape: TakeOrderedAndProject — per-partition top-n heaps
    merged on the driver, never a global sort-shuffle (same contract as
    text_top_quality, plan-asserted there)."""
    key = h64(
        F.concat(F.lit(FIXED_SAMPLE_SALT + ":"), F.col("doc_id").cast("string"))
    )
    return (
        docs.select("doc_id", "lang", key.alias("sample_key"))
        .orderBy(F.asc("sample_key"), F.asc("doc_id"))
        .limit(n)
    )


SOURCE_CAP = 15  # max docs retained per source (binds at sf>=0.01)
SOURCE_CAP_SALT = "source-cap"  # decorrelated from sample/shuffle salts


def source_cap(
    docs: DataFrame, cap: int = SOURCE_CAP, salt: str = SOURCE_CAP_SALT
) -> DataFrame:
    """Per-source document cap: keep at most ``cap`` docs from each
    source, chosen by salted-hash rank — the domain-cap curation rule
    every crawl pipeline applies (no single domain/template farm may
    dominate the training mix; cf. C4's per-domain limits and Gopher's
    'disproportionately large sources' rule). Nothing like it exists
    in the reference (north-star surface, SURVEY §2.2).

    Hash-rank selection (not F.rand, not first-N-in-file-order) keeps
    the usual guarantees: membership is a pure function of (salt,
    doc_id) — retry-stable, rerun-stable, and unbiased w.r.t. storage
    order (first-N would keep whatever happened to sort first).

    Scale shape: one shuffle keyed by source for the row_number window.
    A pathologically hot source makes one fat window partition; that is
    exactly the skew AQE's skew-split cannot fix for windows, so at
    100 TB pre-filter hot sources with the two-pass trick: count per
    source (map-side combined), broadcast the hot-source list, and
    pre-thin those with the stratified hash sampler to ~2×cap before
    ranking — the final window then sees bounded partitions. At bench
    scale the single window is the right plan.

    Output: (doc_id, source, cap_rank) for kept docs only.
    """
    from pyspark.sql.window import Window

    key = sample_bucket(F.col("doc_id"), salt)
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy(key.asc(), F.col("doc_id").asc())
    )
    return (
        docs.select("doc_id", "source", key.alias("_k"))
        .withColumn("cap_rank", rn)
        .filter(F.col("cap_rank") <= cap)
        .drop("_k")
    )


SHARD_TOKENS = 4_000  # token budget per training shard
SHARD_PLAN_BUCKETS = 64  # order-preserving range buckets for the scan


def token_shard_plan(
    docs: DataFrame,
    shard_tokens: int = SHARD_TOKENS,
    n_buckets: int = SHARD_PLAN_BUCKETS,
    salt: str = SHUFFLE_SALT,
) -> DataFrame:
    """Token-budgeted shard plan: lay the deterministically-shuffled
    corpus out into consecutive shards of ~``shard_tokens`` tokens
    each — the tokenize→shuffle→shard materialization step at the end
    of every training-data pipeline (equal-TOKEN shards feed fixed
    token-budget training steps; :func:`global_shuffle`'s mod-sharding
    gives equal COUNTS, which skews step sizes when doc lengths skew).

    shard(doc) = floor(cum_tokens_before(doc) / shard_tokens) in
    shuffle-key order — a global prefix sum. The classic scale trap is
    computing it with one unpartitioned window (single-reducer
    chokepoint); this uses the two-level scan instead: the 60-bit
    shuffle key is range-bucketed (order-preserving integer divide),
    each bucket prefix-sums IN PARALLEL (window partitioned by
    bucket), and the per-bucket totals — ``n_buckets`` rows — roll up
    through one tiny window and broadcast back as offsets. Exact
    integer arithmetic end-to-end, so the DuckDB twin (one flat global
    window) matches bit-for-bit.

    Output: (doc_id, shuffle_key, n_tok, cum_before, shard).
    """
    from pyspark.sql.window import Window

    key = h64(F.concat(F.lit(salt), F.lit(":"), F.col("doc_id").cast("string")))
    base = (
        docs.select(
            "doc_id",
            key.alias("shuffle_key"),
            n_tokens(F.coalesce(F.col("text"), F.lit(""))).cast("long").alias(
                "n_tok"
            ),
        )
        .withColumn(
            # `div` = exact int64 division: float `/` rounds 60-bit keys
            # through a 53-bit mantissa and could mis-bucket boundary
            # keys, silently breaking the order-preservation the scan
            # relies on
            "_bucket",
            F.expr(f"shuffle_key div {HASH_SPACE // n_buckets}"),
        )
        # materialized ONCE: base feeds the within-bucket prefix window
        # AND the per-bucket totals — without the barrier each consumer
        # re-runs the corpus scan + md5 + tokenization (the anomaly_mad
        # multi-consumer lesson; on a cluster, persist instead)
        .transform(narrow_barrier)
    )
    in_bucket = Window.partitionBy("_bucket").orderBy(
        F.col("shuffle_key").asc(), F.col("doc_id").asc()
    )
    within = base.withColumn(
        "_cum_in",
        F.sum("n_tok").over(
            in_bucket.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - F.col("n_tok"),
    )
    totals = base.groupBy("_bucket").agg(F.sum("n_tok").alias("_tot"))
    off = totals.withColumn(
        "_offset",
        F.coalesce(
            F.sum("_tot").over(
                Window.orderBy("_bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("_bucket", "_offset")
    return (
        within.join(F.broadcast(off), "_bucket")
        .withColumn("cum_before", F.col("_offset") + F.col("_cum_in"))
        .withColumn(
            "shard", F.expr(f"cum_before div {shard_tokens}").cast("int")
        )
        .select("doc_id", "shuffle_key", "n_tok", "cum_before", "shard")
    )


PACK_FRAG_BUDGET = 512  # tokens per fixed context window


def pack_fragments(
    docs: DataFrame,
    budget_tokens: int = PACK_FRAG_BUDGET,
    stratum_col: str = "lang",
    order_col: str = "doc_id",
) -> DataFrame:
    """FRAGMENTING sequence packer: lay documents end-to-end (in a
    deterministic per-stratum order) and cut every exact
    ``budget_tokens`` boundary, splitting documents that straddle it —
    the exact-budget packing a training pipeline uses when every
    context window must be FULL (next-fit :func:`pack_sequences` keeps
    docs whole but lets bins over/under-fill; this form trades a split
    doc for bit-perfect window occupancy, the "document packing with
    truncation across rows" recipe of GPT-style pretraining).

    A doc occupying corpus-token interval [cum_before, cum_before +
    n_tok) fragments into one row per budget window it touches:
    fragment f of doc d covers doc-token offsets [frag_start,
    frag_start + frag_len). Every step is int64 arithmetic (`div`,
    greatest/least) — no floats anywhere, so the DuckDB twin is
    bit-exact and fragment lengths per (stratum, bin) sum to EXACTLY
    the budget for every non-final bin (property-tested).

    Scale shape: one per-stratum window (running sum in a
    deterministic order — same single shuffle as pack_sequences), then
    a narrow explode of size ceil(n_tok / budget) per doc. For a
    global (unstratified) layout at 100 TB, swap the window for the
    two-level range-bucket scan of :func:`token_shard_plan`.

    Output: (doc_id, <stratum>, bin_id, frag_start, frag_len).
    """
    from pyspark.sql import Window

    base = docs.select(
        order_col,
        stratum_col,
        n_tokens(F.coalesce(F.col("text"), F.lit(""))).cast("long").alias(
            "n_tok"
        ),
    )
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = base.withColumn("cb", F.sum("n_tok").over(w) - F.col("n_tok"))
    e = c.withColumn(
        "bin_id",
        F.explode(
            F.sequence(
                F.expr(f"cb div {budget_tokens}"),
                F.expr(f"(cb + n_tok - 1) div {budget_tokens}"),
            )
        ),
    )
    b = F.lit(budget_tokens)
    return e.select(
        order_col,
        stratum_col,
        "bin_id",
        F.greatest(F.col("bin_id") * b - F.col("cb"), F.lit(0)).alias(
            "frag_start"
        ),
        (
            F.least((F.col("bin_id") + 1) * b, F.col("cb") + F.col("n_tok"))
            - F.greatest(F.col("bin_id") * b, F.col("cb"))
        ).alias("frag_len"),
    )
