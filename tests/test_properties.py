"""Property-based tests (hypothesis): engine expressions vs
independent Python reimplementations over arbitrary generated inputs.

These pin the scalar semantics (SURVEY §2.7/§2.10) much harder than
fixtures: slugging, value cleaning, fingerprints, melt completeness,
and last-write-wins dedup hold for ANY input, not just the corpus.
Each property runs a real Spark job per example, so example counts
stay small and the data tiny.
"""

from __future__ import annotations

import re

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Latin-1 text without surrogates. The mirrors reimplement JAVA
# regex/trim semantics (Spark is the spec): Java `\s` is ASCII-only
# ([ \t\n\x0B\f\r] — \x1c-\x1f are NOT whitespace, unlike Python's
# unicode `\s`), and F.trim strips only the space character. Codepoints
# are capped at Latin-1: CPython and the JVM ship different Unicode
# versions, so case mappings diverge above it (hypothesis found
# U+019B ƛ, whose uppercase U+A7DC exists only in newer Unicode —
# Python maps it, Java 17 doesn't).
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0xFF),
    max_size=40,
)


def _slug_py(part: str) -> str:
    up = part.strip(" ").upper()
    cleaned = re.sub(r"[,()]", "", up)
    return re.sub(r"\s+", "_", cleaned, flags=re.ASCII)


@given(parts=st.lists(TEXT, min_size=1, max_size=3))
@settings(**SETTINGS)
def test_make_series_id_matches_python_mirror(spark, parts):
    from gas_data_pipeline_spark.functions import make_series_id

    df = spark.createDataFrame([tuple(parts)], [f"p{i}" for i in range(len(parts))])
    got = df.select(
        make_series_id("DS", *[F.col(f"p{i}") for i in range(len(parts))]).alias("sid")
    ).collect()[0].sid
    expected = "_".join(["NG", _slug_py("DS"), *[_slug_py(p) for p in parts]])
    # concat_ws skips empty-after-slug parts the same way on both sides
    # only when the slug is non-empty; mirror that.
    expected = "_".join([s for s in expected.split("_")])
    assert got == expected


@given(
    raws=st.lists(
        st.one_of(
            st.none(),
            st.text(max_size=8),
            st.floats(allow_nan=False, allow_infinity=False, width=32).map(str),
            st.integers(-10**6, 10**6).map(str),
            st.just("  "),
            st.just(""),
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_clean_value_matches_python_mirror(spark, raws):
    from gas_data_pipeline_spark.functions import clean_value

    df = spark.createDataFrame([(r,) for r in raws], "raw string")
    got = [r.v for r in df.select(clean_value(F.col("raw")).alias("v")).collect()]

    def mirror(r):
        if r is None or r.strip() == "":
            return None
        try:
            return float(r.strip())
        except ValueError:
            return None

    # Spark try_cast accepts a superset of Python float() only for
    # whitespace forms already trimmed; compare value-wise.
    for g, r in zip(got, raws):
        m = mirror(r)
        if m is None:
            assert g is None or g != g  # null (or NaN from 'nan' text)
        else:
            assert g == pytest.approx(m, rel=1e-6)


@given(text=TEXT)
@settings(**SETTINGS)
def test_rolling_fingerprint_matches_python_fold(spark, text):
    from gas_data_pipeline_spark.operators.text import (
        MOD,
        TOKEN_PATTERN,
        rolling_fingerprint,
    )

    df = spark.createDataFrame([(text,)], "t string")
    got = df.select(rolling_fingerprint(F.col("t")).alias("fp")).collect()[0].fp

    toks = re.findall(TOKEN_PATTERN, text.lower(), flags=re.ASCII)
    acc = 0
    for t in toks:
        acc = (acc * 131 + ord(t[0]) * 31 + len(t)) % MOD
    assert got == acc


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),  # key
            st.floats(-100, 100, allow_nan=False),
            st.floats(-100, 100, allow_nan=False),
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_melt_completeness(spark, rows):
    """R1 invariant: every numeric cell appears exactly once in the
    long format; row count = rows x value-columns."""
    from gas_data_pipeline_spark.suite.reshape import melt_numeric

    df = spark.createDataFrame(
        [(i, k, a, b) for i, (k, a, b) in enumerate(rows)],
        "rid bigint, key bigint, m1 double, m2 double",
    )
    long = melt_numeric(df, id_cols=["rid", "key"]).toPandas()
    assert len(long) == 2 * len(rows)
    for i, (k, a, b) in enumerate(rows):
        cell = long[(long.rid == i) & (long.metric == "m1")]
        assert len(cell) == 1 and cell.iloc[0].value == pytest.approx(a)
        cell = long[(long.rid == i) & (long.metric == "m2")]
        assert len(cell) == 1 and cell.iloc[0].value == pytest.approx(b)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 2), st.integers(0, 50)),
        min_size=1,
        max_size=12,
    )
)
@settings(**SETTINGS)
def test_last_write_wins_keeps_max_order(spark, rows):
    """A5 invariant: one row per key; the survivor carries the maximum
    order column (deterministic, unlike the reference's dict order)."""
    from gas_data_pipeline_spark.pipeline.silver import dedup_last_write_wins

    df = spark.createDataFrame(
        [(f"s{k}", t, o, float(o)) for k, t, o in rows],
        "series_id string, observation_time bigint, ord bigint, value double",
    )
    out = dedup_last_write_wins(df, ["ord"]).toPandas()
    keys = list(zip(out.series_id, out.observation_time))
    assert len(keys) == len(set(keys))
    import collections

    best = collections.defaultdict(int)
    for k, t, o in rows:
        best[(f"s{k}", t)] = max(best[(f"s{k}", t)], o)
    for row in out.itertuples():
        assert row.ord == best[(row.series_id, row.observation_time)]


@given(
    docs=st.lists(
        st.tuples(st.integers(0, 10**9), TEXT),
        min_size=1,
        max_size=10,
        unique_by=lambda t: t[0],
    )
)
@settings(**SETTINGS)
def test_pack_sequences_matches_python_fold(spark, docs):
    """Packing invariant for ANY corpus (including empty and sub-width
    texts): chunk spans equal a sequential Python fold per shard."""
    import re as _re

    from gas_data_pipeline_spark.operators.curation import pack_sequences
    from gas_data_pipeline_spark.operators.text import TOKEN_PATTERN

    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = pack_sequences(df, capacity=7, n_shards=2).toPandas()
    assert len(out) == len(docs)
    cum = {0: 0, 1: 0}
    for did, text in sorted(docs):
        n = len(_re.findall(TOKEN_PATTERN, text.lower(), flags=_re.ASCII))
        shard = did % 2
        cum[shard] += n
        row = out[out.doc_id == did].iloc[0]
        assert row.n_tokens == n
        assert row.cum_tokens == cum[shard]
        if n == 0:
            # Empty docs occupy no chunks: NULL span, zero count.
            assert row.first_chunk != row.first_chunk or row.first_chunk is None
            assert row.n_chunks == 0
        else:
            assert row.first_chunk == (cum[shard] - n) // 7
            assert row.last_chunk == (cum[shard] - 1) // 7


@given(
    ids=st.lists(st.integers(0, 10**12), min_size=1, max_size=12, unique=True)
)
@settings(**SETTINGS)
def test_shuffle_rank_permutation_for_any_id_set(spark, ids):
    """Bucketed shuffle rank is a dense 1..N permutation equal to the
    md5 sort order for ANY id set (gaps, magnitudes, singletons)."""
    import hashlib

    from gas_data_pipeline_spark.operators.curation import seeded_shuffle_rank

    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    out = seeded_shuffle_rank(df, seed="prop").toPandas()
    expected = {
        did: r + 1
        for r, did in enumerate(
            sorted(ids, key=lambda i: hashlib.md5(f"prop:{i}".encode()).hexdigest())
        )
    }
    got = dict(zip(out.doc_id, out.shuffle_rank))
    assert got == expected


@given(
    docs=st.lists(
        st.tuples(st.integers(0, 10**6), TEXT),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
@settings(**SETTINGS)
def test_quality_and_bigrams_never_throw_on_degenerate_text(spark, docs):
    """Quality rules and bigram repetition run on ANY text — empty,
    whitespace-only, punctuation-only — without ANSI index errors
    (sequence(1, k<1) descends); n_words=0 rows yield null ratios."""
    import pyspark.sql.functions as F

    from gas_data_pipeline_spark.operators.curation import quality_rule_columns
    from gas_data_pipeline_spark.operators.text import word_bigrams

    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = df.select(
        "doc_id", *quality_rule_columns(F.col("text")),
        F.size(word_bigrams(F.col("text"))).alias("n_bigrams"),
    ).toPandas()
    assert len(out) == len(docs)
    for row in out.itertuples():
        if row.n_words == 0:
            assert row.mean_word_len is None or row.mean_word_len != row.mean_word_len
            assert row.n_bigrams == 0
        else:
            assert row.n_bigrams == max(0, row.n_words - 1)


@given(
    log=st.lists(
        st.tuples(
            st.integers(0, 3),                  # key
            st.integers(0, 50),                 # ts
            st.sampled_from(["A", "B", "C"]),   # attr value
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_scd2_intervals_match_python_recompute(spark, log):
    """SCD2 interval building equals a sequential Python fold for ANY
    change log (ties broken by a unique seq column)."""
    from gas_data_pipeline_spark.pipeline.scd import scd2_intervals

    rows = [(k, t, v, i) for i, (k, t, v) in enumerate(log)]
    df = spark.createDataFrame(rows, "k bigint, t bigint, v string, seq bigint")
    got = scd2_intervals(df, "k", "v", "t", "seq").toPandas()

    # Python mirror: per key, ordered by (t, seq), collapse runs. Two
    # changes at the same t yield a zero-length interval, so compare as
    # multisets of full rows rather than keying on (k, valid_from).
    expect = []
    by_key: dict[int, list] = {}
    for k, t, v, seq in sorted(rows, key=lambda r: (r[0], r[1], r[3])):
        by_key.setdefault(k, []).append((t, v))
    for k, seq_rows in by_key.items():
        ivs = []
        for t, v in seq_rows:
            if ivs and ivs[-1][0] == v:
                ivs[-1][2] += 1
            else:
                ivs.append([v, t, 1])
        for i, (v, t, n) in enumerate(ivs):
            valid_to = ivs[i + 1][1] if i + 1 < len(ivs) else None
            expect.append((k, v, t, valid_to, valid_to is None, n))

    got_rows = [
        (
            int(r.k),
            r.v,
            int(r.valid_from),
            None if pd.isna(r.valid_to) else int(r.valid_to),
            bool(r.is_current),
            int(r.n_changes),
        )
        for r in got.itertuples()
    ]
    key = lambda t: (t[0], t[2], t[3] is None, t[3] or 0, t[1])
    assert sorted(got_rows, key=key) == sorted(expect, key=key)


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=9),
        min_size=1,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_span_dedup_matches_python_recompute(spark, docs):
    """Span dedup (span_words=3) equals the sequential first-occurrence
    fold for ANY corpus, including empty documents and sub-span tails."""
    from gas_data_pipeline_spark.operators.dedup import span_dedup_exact

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = span_dedup_exact(df, "doc_id", "text", span_words=3).toPandas()

    seen: set[str] = set()
    expect = {}
    for i, words in enumerate(docs):
        toks = " ".join(words).strip().split(" ") if True else []
        # Mirror split semantics: split('\s+') of '' yields [''].
        base = " ".join(words)
        toks = re.split(r"\s+", base.lower().strip(" "))
        spans = [" ".join(toks[j : j + 3]) for j in range(0, len(toks), 3)]
        kept = []
        for sp in spans:
            if sp not in seen:
                seen.add(sp)
                kept.append(sp)
        expect[i] = (len(spans), len(kept), " ".join(kept))

    assert len(got) == len(expect)
    for r in got.itertuples():
        n_spans, n_kept, cleaned = expect[r.doc_id]
        assert (r.n_spans, r.n_kept, r.cleaned_text) == (n_spans, n_kept, cleaned)


@given(
    old=st.dictionaries(
        st.integers(0, 15), st.tuples(st.integers(0, 3), st.integers(0, 3)),
        max_size=12,
    ),
    new=st.dictionaries(
        st.integers(0, 15), st.tuples(st.integers(0, 3), st.integers(0, 3)),
        max_size=12,
    ),
)
@settings(**SETTINGS)
def test_snapshot_diff_apply_reconstructs_new(spark, old, new):
    """CDC soundness: applying the derived change feed to the old
    snapshot reproduces the new snapshot exactly, for ANY pair of
    overlapping keyed states (collisions force updates, disjoint keys
    force inserts/deletes, identical values force absence)."""
    from gas_data_pipeline_spark.pipeline.diff import snapshot_diff

    schema = "k long, a long, b long"
    old_df = spark.createDataFrame(
        [(k, *v) for k, v in old.items()], schema
    )
    new_df = spark.createDataFrame(
        [(k, *v) for k, v in new.items()], schema
    )
    diff = {
        r.k: r.change_type for r in snapshot_diff(old_df, new_df, ["k"]).collect()
    }
    # Apply: delete removes, insert/update take the new row.
    applied = {
        k: v for k, v in old.items() if diff.get(k) not in ("delete", "update")
    }
    applied.update(
        {k: new[k] for k, t in diff.items() if t in ("insert", "update")}
    )
    assert applied == new
    # Minimality: every reported change is a real difference.
    for k, t in diff.items():
        if t == "insert":
            assert k in new and k not in old
        elif t == "delete":
            assert k in old and k not in new
        else:
            assert old[k] != new[k]


@given(
    keys=st.lists(
        st.one_of(st.none(), st.integers(0, 6).map(lambda i: f"k{i}")),
        min_size=1,
        max_size=120,
    ),
    theta=st.sampled_from([0.05, 0.2, 0.25, 1 / 3, 0.5, 1.0]),
    parts=st.integers(1, 5),
)
@settings(**{**SETTINGS, "max_examples": 10})
def test_heavy_hitters_matches_counter_mirror(spark, keys, theta, parts):
    """heavy_hitters_exact == Counter + exact decimal HAVING bar, for
    any key multiset (nulls included), threshold, and partitioning —
    the MG summary is a cost bound, never a semantics change."""
    import collections
    import math
    from fractions import Fraction

    from gas_data_pipeline_spark.operators.sketches import heavy_hitters_exact

    df = spark.createDataFrame([(k,) for k in keys], "key string").repartition(
        parts
    )
    got = {(r.key, r.cnt) for r in heavy_hitters_exact(df, "key", theta).collect()}
    bar = math.ceil(Fraction(str(theta)) * len(keys))
    want = {
        (k, n)
        for k, n in collections.Counter(keys).items()
        if n >= bar
    }
    assert got == want


@given(
    vals=st.lists(
        st.tuples(
            st.integers(0, 3),
            st.one_of(st.none(), st.integers(-50, 50).map(float)),
        ),
        min_size=1,
        max_size=80,
    ),
    k=st.integers(1, 4),
    parts=st.integers(1, 4),
)
@settings(**{**SETTINGS, "max_examples": 10})
def test_grouped_topk_matches_python_mirror(spark, vals, k, parts):
    """grouped_topk == per-group Python sort/truncate under the same
    total order (desc nulls-last, tiebreak asc) for any layout."""
    from gas_data_pipeline_spark.operators.topk import grouped_topk

    rows = [(g, v, i) for i, (g, v) in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "g int, v double, tid long"
    ).repartition(parts)
    got = {
        (r.g, r.v, r.tid, r.rk)
        for r in grouped_topk(df, ["g"], "v", k=k, tiebreak="tid").collect()
    }
    by_g: dict[int, list] = {}
    for g, v, i in rows:
        by_g.setdefault(g, []).append((v, i))
    want = set()
    for g, items in by_g.items():
        items.sort(key=lambda t: (t[0] is None, -(t[0] or 0.0), t[1]))
        for rk, (v, i) in enumerate(items[:k], start=1):
            want.add((g, v, i, rk))
    assert got == want


@given(
    new_ids=st.lists(st.integers(0, 30), min_size=1, max_size=40, unique=True),
    old_ids=st.lists(st.integers(0, 30), min_size=0, max_size=40, unique=True),
    m_bits=st.sampled_from([64, 256, 1 << 12]),
)
@settings(**{**SETTINGS, "max_examples": 10})
def test_bloom_gate_matches_anti_join_even_at_high_fp(spark, new_ids, old_ids, m_bits):
    """The Bloom gate's answer equals the plain sha anti-join at ANY
    false-positive rate — a 64-bit bitmap saturates almost instantly,
    so every row becomes a candidate and the exact confirm must carry
    the whole contract."""
    from gas_data_pipeline_spark.operators.dedup import BloomDedupState

    new = spark.createDataFrame(
        [(i, f"text-{i}") for i in new_ids], "doc_id long, text string"
    )
    existing = spark.createDataFrame(
        [(i, f"text-{i}") for i in old_ids], "doc_id long, text string"
    ) if old_ids else new.filter(F.lit(False))
    state = BloomDedupState(m_bits=m_bits)
    state.absorb(existing)
    got = sorted(r.doc_id for r in state.filter_new(new, existing).collect())
    want = sorted(set(new_ids) - set(old_ids))
    assert got == want


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)),
        min_size=1,
        max_size=40,
    ),
    salts=st.integers(2, 5),
)
@settings(**{**SETTINGS, "max_examples": 6})
def test_pagerank_salting_invariant_on_random_graphs(spark, edges, salts):
    """Salted == unsalted PageRank on arbitrary graphs even with
    threshold 0 (EVERY node treated as a hub, maximal replication):
    contribution sums are associative, so splitting cannot change any
    rank beyond float addition order."""
    from gas_data_pipeline_spark.operators.graph import pagerank

    e = spark.createDataFrame(edges, "src long, dst long")
    plain = {
        r.node: r["rank"]
        for r in pagerank(e, iters=2, checkpoint=False).collect()
    }
    salted = {
        r.node: r["rank"]
        for r in pagerank(
            e,
            iters=2,
            checkpoint=False,
            hub_degree_threshold=0,
            hub_salts=salts,
        ).collect()
    }
    assert set(plain) == set(salted)
    for node, rank in plain.items():
        assert salted[node] == pytest.approx(rank, rel=1e-9)


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=60,
    ),
    cut=st.integers(min_value=0, max_value=60),
)
@settings(**SETTINGS)
def test_incremental_histogram_psi_equals_batch(spark, vals, cut):
    """The streaming monitor's invariant, for ANY value set and ANY
    batch boundary: histogram(batch1) + histogram(batch2), merged by
    per-bin addition, yields the same PSI as one batch histogram of
    the whole stream — incremental maintenance == full recompute."""
    from gas_data_pipeline_spark.operators.drift import (
        baseline_bounds,
        histogram_on_bounds,
        psi_drift,
        psi_from_histograms,
    )

    cut = min(cut, len(vals))
    base = spark.createDataFrame([(v,) for v in vals], "x double")
    b1 = spark.createDataFrame([(v,) for v in vals[:cut]], "x double") if cut else None
    b2 = (
        spark.createDataFrame([(v,) for v in vals[cut:]], "x double")
        if cut < len(vals)
        else None
    )
    bounds = baseline_bounds(base, ["x"])
    base_hist = histogram_on_bounds(base, ["x"], bounds, bins=5)
    parts = [
        histogram_on_bounds(b, ["x"], bounds, bins=5) for b in (b1, b2) if b is not None
    ]
    merged = parts[0]
    for p in parts[1:]:
        merged = (
            merged.unionByName(p)
            .groupBy("feature", "bin")
            .agg(F.sum("cnt").alias("cnt"))
        )
    incr = psi_from_histograms(base_hist, merged).collect()[0]
    batch = psi_drift(base, base, ["x"], bins=5).collect()[0]
    # base vs full stream: the "stream" here IS base split in two, so
    # the incremental PSI must equal the batch self-PSI (zero).
    assert incr["psi"] == pytest.approx(batch["psi"], abs=1e-9)
    assert incr["n_cur"] == len(vals)


def test_event_day_streaks_tolerates_all_null_ts_users(spark, tmp_path):
    """ADVICE r11: a user whose every ts is null yields an EMPTY
    collect_set day array; F.sequence(1, 0) is the DESCENDING [1, 0],
    whose i=0 element evades the i==1 short-circuit and throws 'SQL
    array indices start at 1', failing the whole query. Empty arrays
    are dropped before the fold now: the null-only user vanishes,
    everyone else's streaks are untouched."""
    from gas_data_pipeline_spark.suite.analytics_suite import event_day_streaks

    rows = [
        (1, None, 100, "a", 1.0, "{}"),
        (2, None, 100, "a", 1.0, "{}"),
        (3, "2024-01-01 10:00:00", 200, "a", 1.0, "{}"),
        (4, "2024-01-02 10:00:00", 200, "a", 1.0, "{}"),
        (5, None, 200, "a", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, "
        "event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = event_day_streaks(spark, str(tmp_path)).collect()
    assert {r.user_id for r in got} == {200}
    assert got[0].streak_days == 2


# ---------------------------------------------------------------------------
# round 14: key-fingerprint invariants (pure kernel, no Spark)
# ---------------------------------------------------------------------------

KEYS_ST = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
        min_size=0,
        max_size=40,
    ),
    min_size=0,
    max_size=200,
)


@given(keys=KEYS_ST)
@settings(max_examples=60, deadline=None)
def test_fp_never_false_negative(keys):
    """The load-bearing fingerprint invariant: EVERY inserted key
    tests positive in whichever form fp_from_values chose — a false
    negative would silently prune a file that holds matching rows
    (data loss); false positives merely keep a file."""
    from gas_data_pipeline_spark.pipeline import _stats_kernel as k

    fp = k.fp_from_values(keys)
    if fp is None:
        return
    for key in keys:
        assert k.fp_might_contain(fp, key)


@given(a=KEYS_ST, b=KEYS_ST, c=KEYS_ST)
@settings(max_examples=40, deadline=None)
def test_fp_merge_commutes_and_preserves_membership(a, b, c):
    """Merging is commutative at the membership level and NEVER loses
    a member: the partition-grain rollup must answer 'might contain'
    for every key any merged file held, regardless of merge order or
    which side crossed the set->bloom boundary first."""
    from gas_data_pipeline_spark.pipeline import _stats_kernel as k

    fa, fb, fc = (k.fp_from_values(x) for x in (a, b, c))
    ab, ba = k.fp_merge(fa, fb), k.fp_merge(fb, fa)
    # Commutative at membership grain (bit-identical for blooms,
    # list-identical for sets).
    assert ab == ba
    left = k.fp_merge(ab, fc)
    right = k.fp_merge(fa, k.fp_merge(fb, fc))
    for key in (*a, *b, *c):
        if left is not None:
            assert k.fp_might_contain(left, key)
        if right is not None:
            assert k.fp_might_contain(right, key)
