"""Hypothesis property tests — invariants that hold for ALL inputs,
not just the fixtures (SURVEY §5.2 item 2's strategy, generalized to
the round-3 operators)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st


@given(
    st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=50,
    ),
    st.integers(min_value=0, max_value=8),
)
@settings(max_examples=200, deadline=None)
def test_round_half_up_always_matches_duckdb(vals, digits):
    """Driver-side rounding ≡ DuckDB ROUND for arbitrary doubles and
    scales (the oracle-gate contract, fuzzed) — EXCEPT the one case
    where Spark and DuckDB themselves disagree: when the double's
    SHORTEST repr lands exactly on a decimal half-tie at this scale
    but the binary value sits on the other side of it (hypothesis
    found 524288.626390965 at 8 digits: binary ≈ …96497 < the .965
    tie, so DuckDB's value-based ROUND gives …96 while Spark's
    BigDecimal-of-toString HALF_UP — which round_half_up mirrors, by
    contract — gives …97). round_half_up must side with SPARK there;
    the carve-out below excludes exactly those repr-ties, and the
    oracle discipline (round aggregate means, ≤8 digits) makes a real
    mean landing on one a measure-zero event."""
    import decimal

    import duckdb

    from kmeans_mapreduce_spark.operators.kmeans import round_half_up

    con = duckdb.connect()
    for v in vals:
        srepr = decimal.Decimal(repr(v))
        exact = decimal.Decimal(v)  # full binary expansion
        scaled = srepr.scaleb(digits)
        # abs(): Decimal % carries the dividend's sign, so a negative
        # repr-tie lands on -0.5 (review fix — the carve-out must
        # exclude -524288.626390965 exactly like its positive twin)
        if abs(scaled % 1) == decimal.Decimal("0.5") and exact != srepr:
            # repr-tie the binary value doesn't confirm: Spark and
            # DuckDB legitimately differ by one unit in the last
            # rounded digit; round_half_up is defined to match Spark
            continue
        duck = con.execute(
            f"SELECT ROUND(CAST(? AS DOUBLE), {digits})", [v]
        ).fetchone()[0]
        assert round_half_up(v, digits) == duck


def test_round_half_up_sides_with_spark_on_repr_ties(spark):
    """The carve-out above, pinned from the other side: on the
    hypothesis-found repr-tie, round_half_up equals Spark's F.round
    (the value that re-enters gated loop plans), not DuckDB's."""
    from pyspark.sql import functions as F

    from kmeans_mapreduce_spark.operators.kmeans import round_half_up

    v = 524288.626390965
    spark_val = (
        spark.range(1)
        .select(F.round(F.lit(v), 8).alias("r"))
        .collect()[0]["r"]
    )
    assert round_half_up(v, 8) == spark_val == 524288.62639097


@given(
    st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=60),
    st.integers(min_value=10, max_value=1000),
)
@settings(max_examples=15, deadline=None)
def test_pack_sequences_matches_sequential_replay(token_counts, budget):
    """For any doc stream, the distributed window form must equal the
    sequential spec replayed in pure Python — bin = floor(prefix-sum-
    before-doc / budget) — and bin ids must be monotone over the
    packing order. (Hypothesis found during development that stronger
    claims — contiguous bin ids, every non-tail bin full — are NOT
    invariants: one doc spanning several budget widths skips ids, and
    a doc starting just under a boundary leaves a short bin.)"""
    from kmeans_mapreduce_spark.operators import sampling as sp
    from kmeans_mapreduce_spark.session import get_spark

    spark = get_spark("prop-tests")
    rows = [(i, "en", int(nt)) for i, nt in enumerate(token_counts)]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING, n_tokens LONG")
    got = {
        r["doc_id"]: r["bin_id"]
        for r in sp.pack_sequences(df, budget_tokens=budget).collect()
    }
    prefix = 0
    prev_bin = 0
    for i, nt in enumerate(token_counts):
        want = prefix // budget
        assert got[i] == want
        assert want >= prev_bin  # monotone over the packing order
        prev_bin = want
        prefix += nt


@given(st.sampled_from([0.0, 0.1, 0.3, 0.5, 0.9, 1.0]))
@settings(max_examples=6, deadline=None)
def test_hash_sample_rate_monotone(rate):
    """A lower-rate hash sample is always a SUBSET of a higher-rate one
    (thresholds nest), and both are deterministic — the property that
    makes hash sampling auditable where rand() sampling is not."""
    from pyspark.sql import functions as F

    from kmeans_mapreduce_spark.operators import sampling as sp
    from kmeans_mapreduce_spark.session import get_spark
    from kmeans_mapreduce_spark.sources.loaders import load_table

    spark = get_spark("prop-tests")
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "lang"
    )
    low = {
        r["doc_id"]
        for r in sp.hash_sample_stratified(docs, {}, rate).collect()
    }
    high = {
        r["doc_id"]
        for r in sp.hash_sample_stratified(docs, {}, min(1.0, rate + 0.1)).collect()
    }
    assert low <= high
    again = {
        r["doc_id"]
        for r in sp.hash_sample_stratified(docs, {}, rate).collect()
    }
    assert low == again


@given(
    st.lists(
        st.lists(
            st.sampled_from(
                ["the", "a", "of", "fox", "run", "w1", "w2", "spam", "@@!", "x9"]
            ),
            min_size=1,
            max_size=60,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=15, deadline=None)
def test_rule_filter_matches_python_reference(docs_words):
    """The Catalyst rule verdicts must equal a pure-Python replay of
    the same Gopher bounds for ANY token stream — the engine-vs-spec
    parity the oracle fuzzes from the DuckDB side."""
    import re

    from kmeans_mapreduce_spark.functions.text import STOPWORDS
    from kmeans_mapreduce_spark.operators import selection as sel
    from kmeans_mapreduce_spark.session import get_spark

    spark = get_spark("prop-tests")
    rows = [(i, " ".join(ws), "en", "s", 0) for i, ws in enumerate(docs_words)]
    df = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    got = {r["doc_id"]: r for r in sel.rule_filter_report(df).collect()}
    alnum = re.compile(sel.ALNUM_RE)
    for i, ws in enumerate(docs_words):
        n = len(ws)
        mwl = sum(len(w) for w in ws) / n
        sw = sum(w in STOPWORDS for w in ws)
        sym = sum(not alnum.match(w) for w in ws) / n
        ttr = len(set(ws)) / n
        r = got[i]
        assert r["pass_words"] == (sel.RULE_MIN_WORDS <= n <= sel.RULE_MAX_WORDS)
        assert r["pass_word_len"] == (sel.RULE_MWL_LO <= mwl <= sel.RULE_MWL_HI)
        assert r["pass_stopwords"] == (sw >= sel.RULE_MIN_STOPWORD_HITS)
        assert r["pass_symbols"] == (sym <= sel.RULE_MAX_SYMBOL_RATIO)
        assert r["pass_ttr"] == (ttr >= sel.RULE_MIN_TTR)
        assert r["pass_all"] == all(
            r[c] for c in (
                "pass_words", "pass_word_len", "pass_stopwords",
                "pass_symbols", "pass_ttr",
            )
        )


@given(
    st.lists(
        st.text(alphabet="abcz", min_size=1, max_size=8),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=10),
)
@settings(max_examples=15, deadline=None)
def test_bpe_merges_match_counter_reference(words, k):
    """BPE pair counts + (count DESC, pair ASC) top-k must equal a
    Counter replay for ANY vocabulary, including 1-char words."""
    from collections import Counter

    from kmeans_mapreduce_spark.operators import textops as tx
    from kmeans_mapreduce_spark.session import get_spark

    spark = get_spark("prop-tests")
    df = spark.createDataFrame(
        [(0, " ".join(words), "en", "s", 0)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    got = [(r["pair"], r["n"]) for r in tx.bpe_merge_candidates(df, k).collect()]
    ref = Counter(
        w[i : i + 2] for w in words for i in range(len(w) - 1)
    )
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert got == want


@given(
    st.lists(
        st.lists(
            st.text(alphabet="abz", min_size=1, max_size=6),
            min_size=1,
            max_size=10,
        ),
        min_size=1,
        max_size=5,
    ),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=10, deadline=None)
def test_bpe_train_and_segment_match_python_replay(doc_words, m):
    """Full BPE train (scan-once weighted vocab loop) + segment apply
    must equal a pure-Python replay for ANY corpus: train with a
    Counter over word instances, apply the merge list with
    str.replace (identical leftmost-nonoverlapping semantics to
    Spark's F.replace)."""
    from collections import Counter

    from kmeans_mapreduce_spark.operators import textops as tx
    from kmeans_mapreduce_spark.session import get_spark

    spark = get_spark("prop-tests")
    texts = [" ".join(ws) for ws in doc_words]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )

    # pure-Python trainer: instance-weighted pair counts, same
    # tie-break, same markers
    vocab = Counter(w for ws in doc_words for w in ws)
    ref_merges = []
    for i in range(m):
        pairs: Counter = Counter()
        for w, n in vocab.items():
            for j in range(len(w) - 1):
                pairs[w[j : j + 2]] += n
        if not pairs:
            break
        pair = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        marker = chr(tx.BPE_MARKER_BASE + i)
        ref_merges.append((pair, marker))
        # rebuild the vocab from scratch with all merges so far (same
        # result as applying the new merge to the current vocab)
        nv: Counter = Counter()
        for w, n in Counter(w2 for ws in doc_words for w2 in ws).items():
            cur = w
            for p, mk in ref_merges:
                cur = cur.replace(p, mk)
            nv[cur] += n
        vocab = nv

    # the driver fast path (default at this vocab size) AND the
    # distributed rounds (forced via driver_vocab_max=0) must both
    # equal the reference replay — the two paths can never drift
    got = tx.bpe_train_merges(df, m)
    assert got == ref_merges
    got_dist = tx.bpe_train_merges(df, m, driver_vocab_max=0)
    assert got_dist == ref_merges

    seg_rows = {
        r["doc_id"]: r for r in tx.bpe_segment_stats(df, got).collect()
    }
    for i, t in enumerate(texts):
        cur = t
        for p, mk in got:
            cur = cur.replace(p, mk)
        n_words = len(t.split(" "))
        r = seg_rows[i]
        assert r["n_words"] == n_words
        assert r["n_units0"] == len(t) - (n_words - 1)
        assert r["n_units"] == len(cur) - (n_words - 1)
        assert r["n_merged"] == len(t) - len(cur)


@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e"]),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=15, deadline=None)
def test_span_dedup_matches_sequential_replay(docs_words, span_words):
    """For ANY corpus and span width, span_dedup must equal the
    sequential spec: walk docs in (doc_id, pos) order, keep a span the
    first time its text is seen, drop it afterwards; cleaned text is
    the kept spans joined in order. Also pins the global invariant the
    fixtures can't: every distinct span survives exactly once."""
    from kmeans_mapreduce_spark.operators import dedup as dd
    from kmeans_mapreduce_spark.session import get_spark

    spark = get_spark("prop-tests")
    texts = [" ".join(ws) for ws in docs_words]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["n_removed"], r["cleaned_text"])
        for r in dd.span_dedup(df, span_words=span_words).collect()
    }

    seen: set[str] = set()
    for i, t in enumerate(texts):
        words = t.split(" ")  # '' splits to [''] — same as the engine
        spans = [
            " ".join(words[p : p + span_words])
            for p in range(0, len(words), span_words)
        ]
        kept = []
        for s in spans:
            if s in seen:
                continue
            seen.add(s)
            kept.append(s)
        assert got[i] == (len(spans), len(spans) - len(kept), " ".join(kept))
    # global invariant the fixtures can't pin: total survivors equal
    # the count of distinct spans — each survives exactly once
    assert sum(n - r for n, r, _ in got.values()) == len(seen)


@given(
    st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=60),
    st.integers(min_value=5, max_value=200),
    st.sampled_from([1, 2, 7, 64]),
)
@settings(max_examples=10, deadline=None)
def test_token_shard_plan_matches_flat_replay(tok_counts, budget, n_buckets):
    """The two-level prefix-sum must equal the flat sequential replay
    for ANY doc set, budget, and bucket count — including n_buckets=1
    (degenerate single bucket) and 64 (many empty buckets)."""
    from kmeans_mapreduce_spark.operators import sampling as sp
    from kmeans_mapreduce_spark.session import get_spark

    spark = get_spark("prop-tests")
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * c) if c else "") for i, c in enumerate(tok_counts)],
        "doc_id LONG, text STRING",
    )
    rows = sp.token_shard_plan(
        docs, shard_tokens=budget, n_buckets=n_buckets
    ).collect()
    # '' tokenizes to one empty token — n_tok 1, same as the engine
    expect_tok = {i: max(c, 1) for i, c in enumerate(tok_counts)}
    rows.sort(key=lambda r: (r["shuffle_key"], r["doc_id"]))
    cum = 0
    for r in rows:
        assert r["n_tok"] == expect_tok[r["doc_id"]]
        assert r["cum_before"] == cum
        assert r["shard"] == cum // budget
        cum += r["n_tok"]
    assert len(rows) == len(tok_counts)


@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=40),
    st.integers(min_value=3, max_value=100),
)
@settings(max_examples=10, deadline=None)
def test_pack_fragments_tiles_exactly(tok_counts, budget):
    """For ANY doc set and budget: (a) each doc's fragments tile its
    token interval [0, n_tok) contiguously in bin order, (b) every
    non-final bin holds EXACTLY budget tokens, (c) total fragment
    tokens equal total corpus tokens — the exact-occupancy contract
    the next-fit packer cannot give."""
    from kmeans_mapreduce_spark.operators import sampling as sp
    from kmeans_mapreduce_spark.session import get_spark

    spark = get_spark("prop-tests")
    docs = spark.createDataFrame(
        [
            (i, "xx", " ".join(["w"] * c) if c else "")
            for i, c in enumerate(tok_counts)
        ],
        "doc_id LONG, lang STRING, text STRING",
    )
    rows = sp.pack_fragments(docs, budget_tokens=budget).collect()
    n_tok = {i: max(c, 1) for i, c in enumerate(tok_counts)}  # '' -> ['']
    frags: dict[int, list] = {}
    bins: dict[int, int] = {}
    for r in rows:
        frags.setdefault(r["doc_id"], []).append(
            (r["bin_id"], r["frag_start"], r["frag_len"])
        )
        bins[r["bin_id"]] = bins.get(r["bin_id"], 0) + r["frag_len"]
    for i, fl in frags.items():
        fl.sort()
        pos = 0
        for _, start, ln in fl:
            assert start == pos and ln >= 1
            pos += ln
        assert pos == n_tok[i]
    last_bin = max(bins)
    for b, total in bins.items():
        assert total == budget or (b == last_bin and total <= budget)
    assert sum(bins.values()) == sum(n_tok.values())


@given(
    st.integers(min_value=-(10**8), max_value=10**8),
    st.integers(min_value=-3, max_value=3),
)
@settings(max_examples=300, deadline=None)
def test_ieee_round_pos_matches_duckdb_even_at_boundaries(k, ulps):
    """The round-6 rounding discipline, fuzzed ADVERSARIALLY: values
    constructed within a few ulps of an exact x.xxxxxx5 boundary — the
    region where Spark F.round (exact-decimal HALF_UP) and DuckDB's
    float ROUND disagree (the sf0.1 quality-score flip). The IEEE
    floor(x·1e6 + ½)/1e6 form must agree between a pure-Python replay
    and DuckDB's identical expression for EVERY such value, because
    both run the same float ops. (Plain random floats never land near
    a boundary, which is why the older ROUND fuzz test above never
    caught the divergence.)"""
    import math

    import duckdb
    from hypothesis import assume

    x = (k + 0.5) / 1e6
    for _ in range(abs(ulps)):
        x = math.nextafter(x, math.inf if ulps > 0 else -math.inf)
    # discipline is pinned for non-negative inputs; assume (not an
    # early return) so hypothesis regenerates instead of counting a
    # vacuous pass
    assume(x >= 0)
    py = math.floor(x * 1e6 + 0.5) / 1e6
    duck = duckdb.connect().execute(
        "SELECT floor(CAST(? AS DOUBLE) * CAST(1000000.0 AS DOUBLE)"
        " + CAST(0.5 AS DOUBLE)) / CAST(1000000.0 AS DOUBLE)",
        [x],
    ).fetchone()[0]
    assert py == duck


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500_000),   # ts_sec
            st.integers(min_value=1, max_value=49_000),    # cents
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=10, deadline=None)
def test_twa_of_constant_series_is_the_constant_and_bounded(series):
    """TWA invariants for arbitrary irregular series: a constant-value
    series averages to exactly that constant (whatever the gaps), and
    any series' TWA lies within [min, max] of its values."""
    from kmeans_mapreduce_spark.operators import events as ev
    from kmeans_mapreduce_spark.session import get_spark

    spark = get_spark("prop-tests")
    S = 1_000_000_000
    const_cents = series[0][1]
    rows = []
    for i, (ts, cents) in enumerate(series):
        rows.append((2 * i, ts * S, 1, "x", const_cents / 100.0, ""))
        rows.append((2 * i + 1, ts * S, 2, "x", cents / 100.0, ""))
    df = spark.createDataFrame(
        rows,
        "event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING",
    )
    got = {r["user_id"]: r for r in ev.time_weighted_avg(df).collect()}
    dur = max(t for t, _ in series) - min(t for t, _ in series)
    if dur == 0:
        assert got[1]["twa"] is None and got[2]["twa"] is None
        return
    assert abs(got[1]["twa"] - const_cents / 100.0) < 1e-6
    # the last observation carries no hold time, so the bound is over
    # the values that DO get weight (every non-final one in ts order)
    # ordered[:-1] is non-empty here: a 1-row series has dur == 0 and
    # returned above
    ordered = sorted(series, key=lambda p: p[0])
    weighted = [c / 100.0 for _, c in ordered[:-1]]
    assert min(weighted) - 1e-6 <= got[2]["twa"] <= max(weighted) + 1e-6


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50_000),  # ts_sec
            st.integers(min_value=1, max_value=49_000),  # cents
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=10, deadline=None)
def test_m4_bounds_and_membership(series):
    """M4 invariants: per bucket, min ≤ first/last ≤ max, every
    reported value is an actual member of the bucket, and bucket
    counts sum to the row count."""
    from collections import defaultdict

    from kmeans_mapreduce_spark.operators import events as ev
    from kmeans_mapreduce_spark.session import get_spark

    spark = get_spark("prop-tests")
    S = 1_000_000_000
    rows = [
        (i, ts * S, 1, "x", cents / 100.0, "")
        for i, (ts, cents) in enumerate(series)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING",
    )
    got = {r["bucket"]: r for r in ev.m4_downsample(df).collect()}
    buckets = defaultdict(list)
    for ts, cents in series:
        buckets[ts // 3600].append(cents / 100.0)
    assert set(got) == set(buckets)
    assert sum(r["n_events"] for r in got.values()) == len(series)
    for b, vals in buckets.items():
        r = got[b]
        assert r["v_min"] == min(vals) and r["v_max"] == max(vals)
        for c in ("v_first", "v_last"):
            assert r["v_min"] <= r[c] <= r["v_max"]
            assert any(abs(r[c] - v) < 1e-9 for v in vals)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),    # day
            st.integers(min_value=1, max_value=25),    # user
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=10, deadline=None)
def test_rolling_active_matches_bruteforce_window(pairs):
    """rolling_active_users ≡ the brute-force definition (distinct
    users over the trailing 7 days) for arbitrary (day, user)
    activity."""
    from kmeans_mapreduce_spark.operators import events as ev
    from kmeans_mapreduce_spark.session import get_spark

    spark = get_spark("prop-tests")
    D = 86400 * 1_000_000_000
    rows = [
        (i, d * D, u, "click", 1.0, "") for i, (d, u) in enumerate(pairs)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING",
    )
    got = {
        r["day"]: r["n_active"]
        for r in ev.rolling_active_users(df).collect()
    }
    days = sorted({d for d, _ in pairs})
    want = {
        d: len({u for dd, u in pairs if d - 6 <= dd <= d}) for d in days
    }
    assert got == want


@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.binary(min_size=16, max_size=16),
    st.booleans(),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_roundtrip_property(w, h, seed, gray):
    """Baseline JPEG encode→decode with all-ones quant tables is
    near-lossless for ANY geometry — including sub-block and
    non-multiple-of-8 sizes where MCU edge padding + crop must be
    exact — and always reports the true dimensions. Tolerance ±4:
    each of the 64 DCT coefficients is rounded within ±0.5 and those
    errors can align in one pixel (hypothesis found a ±3 example at
    19×7), then the YCbCr→RGB transform scales Cr by up to 1.772 —
    ±4 bounds the worst case while still pinning near-losslessness
    (the deterministic fixtures assert ≤2 on their specific inputs).
    No Spark: the codec is a pure function."""
    import numpy as np

    from kmeans_mapreduce_spark.functions import jpeg as J

    chans = 1 if gray else 3
    need = chans * w * h
    content = (seed * (need // 16 + 1))[:need]
    blob = J.encode_baseline_jpeg(w, h, content)
    dw, dh, nc, out = J.decode_baseline_jpeg(blob)
    assert (dw, dh, nc) == (w, h, chans)
    a = np.frombuffer(content, np.uint8).astype(int)
    b = np.frombuffer(out, np.uint8).astype(int)
    assert np.abs(a - b).max() <= 4


@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.tuples(
        st.integers(min_value=0, max_value=255),
        st.integers(min_value=0, max_value=255),
        st.integers(min_value=0, max_value=255),
    ),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_420_constant_chroma_property(w, h, color):
    """4:2:0 subsampling is lossless whenever chroma is constant (the
    2×2 box average of a constant is itself), so flat-color images
    roundtrip EXACTLY through the subsampled MCU walk at any geometry
    — this pins the 4-Y+Cb+Cr block order, chroma upsampling, and
    edge-MCU crop with zero tolerance."""
    import numpy as np

    from kmeans_mapreduce_spark.functions import jpeg as J

    flat = bytes(color) * (w * h)
    dw, dh, nc, out = J.decode_baseline_jpeg(
        J.encode_baseline_jpeg(w, h, flat, subsample=True)
    )
    assert (dw, dh, nc) == (w, h, 3)
    assert np.abs(
        np.frombuffer(flat, np.uint8).astype(int)
        - np.frombuffer(out, np.uint8).astype(int)
    ).max() == 0


@given(
    st.binary(min_size=16, max_size=16),
    st.integers(min_value=0, max_value=3),
    st.data(),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_decoder_never_hangs_on_corrupt_input(seed, mode, data):
    """Robustness: arbitrary mutations of a valid JPEG (truncation,
    byte flips, random garbage, marker corruption) must either decode
    to SOME correctly-shaped output or raise ValueError — never hang,
    never raise a non-ValueError, never return wrong-shaped bytes.
    This is the degrade-don't-die contract multimodal callers rely on
    (a bad frame becomes decoded=false, not a task failure)."""
    import numpy as np

    from kmeans_mapreduce_spark.functions import jpeg as J

    w, h = 16, 12
    content = (seed * 100)[: 3 * w * h]
    blob = bytearray(J.encode_baseline_jpeg(w, h, content))
    if mode == 0:  # truncate
        cut = data.draw(st.integers(min_value=0, max_value=len(blob) - 1))
        blob = blob[:cut]
    elif mode == 1:  # flip bytes
        for _ in range(data.draw(st.integers(min_value=1, max_value=8))):
            i = data.draw(st.integers(min_value=0, max_value=len(blob) - 1))
            blob[i] = data.draw(st.integers(min_value=0, max_value=255))
    elif mode == 2:  # pure garbage with a JPEG magic
        blob = bytearray(b"\xff\xd8") + bytearray(
            data.draw(st.binary(min_size=0, max_size=64))
        )
    # mode 3: leave valid (the control arm)
    try:
        dw, dh, nc, out = J.decode_baseline_jpeg(bytes(blob))
    except ValueError:
        return  # the allowed failure mode
    assert len(out) == nc * dw * dh  # shape contract even on mutations
    assert nc in (1, 3)
