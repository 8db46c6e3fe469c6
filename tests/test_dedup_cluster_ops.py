"""Unit tests for the cluster-canonicalization / corpus-shaping
operators added in round 2 (flagged untested by the round-2 advisor):

- ``keep_best_per_cluster``: transitive (a,b),(b,c) clusters must keep
  exactly one representative, not "the better of each pair".
- ``domain_cap``: per-domain top-k with deterministic tie-breaking.
- ``chunk_documents``: full word coverage, short-doc single chunk, and
  the degenerate inputs (null / empty / whitespace-only / trailing
  newline text) that used to emit phantom rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- helpers
def _docs(spark, rows, schema="doc_id string, text string, source string"):
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------- keep_best_per_cluster
def test_keep_best_transitive_cluster_keeps_one(spark):
    """Pairs (a,b) and (b,c) form ONE component {a,b,c}; the argmax must
    keep only the highest-quality member even though a and c were never
    directly paired — the exact failure mode of per-pair dedup."""
    from gas_data_pipeline_spark.operators.dedup import (
        connected_components,
        keep_best_per_cluster,
    )

    docs = _docs(
        spark,
        [
            ("a", "x" * 10, "s1"),
            ("b", "x" * 30, "s1"),  # longest -> best quality
            ("c", "x" * 20, "s1"),
            ("d", "unrelated", "s2"),  # singleton, always kept
        ],
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "id_a string, id_b string"
    )
    labels = connected_components(pairs, "id_a", "id_b")
    out = keep_best_per_cluster(docs, labels).toPandas().set_index("doc_id")

    assert bool(out.loc["b", "keep"]) is True
    assert bool(out.loc["a", "keep"]) is False
    assert bool(out.loc["c", "keep"]) is False
    assert bool(out.loc["d", "keep"]) is True
    # one component of size 3 + a singleton
    assert int(out.loc["a", "component_size"]) == 3
    assert out.loc["a", "component_id"] == out.loc["c", "component_id"]
    assert int(out.loc["d", "component_size"]) == 1
    # exactly one keeper per component
    kept = out[out["keep"]].groupby("component_id").size()
    assert (kept == 1).all()


def test_keep_best_tie_breaks_by_lowest_id(spark):
    from gas_data_pipeline_spark.operators.dedup import keep_best_per_cluster

    docs = _docs(
        spark,
        [("a", "same len", "s"), ("b", "same len", "s")],
    )
    labels = spark.createDataFrame([("a", "a"), ("b", "a")], "id string, label string")
    out = keep_best_per_cluster(docs, labels).toPandas().set_index("doc_id")
    assert bool(out.loc["a", "keep"]) is True
    assert bool(out.loc["b", "keep"]) is False


def test_keep_best_custom_quality_column(spark):
    from gas_data_pipeline_spark.operators.dedup import keep_best_per_cluster

    docs = spark.createDataFrame(
        [("a", 1.0), ("b", 9.0)], "doc_id string, score double"
    )
    labels = spark.createDataFrame([("a", "a"), ("b", "a")], "id string, label string")
    out = (
        keep_best_per_cluster(docs, labels, quality=F.col("score"))
        .toPandas()
        .set_index("doc_id")
    )
    assert bool(out.loc["b", "keep"]) is True and bool(out.loc["a", "keep"]) is False


# ------------------------------------------------------------ domain_cap
def test_domain_cap_top_k_and_counts(spark):
    from gas_data_pipeline_spark.operators.curation import domain_cap

    rows = [(f"d{i:02d}", "example.com", float(i)) for i in range(10)]
    rows += [("z1", "rare.org", 5.0)]
    docs = spark.createDataFrame(rows, "doc_id string, source string, q double")
    out = domain_cap(docs, domain_col="source", k=3, quality_col="q").toPandas()

    big = out[out.source == "example.com"]
    # top-3 by quality desc: d09, d08, d07
    assert sorted(big.doc_id) == ["d07", "d08", "d09"]
    assert sorted(big.domain_rank) == [1, 2, 3]
    assert (big.n_in_domain == 10).all()
    rare = out[out.source == "rare.org"]
    assert list(rare.doc_id) == ["z1"] and int(rare.n_in_domain.iloc[0]) == 1


def test_domain_cap_tie_breaks_by_id(spark):
    from gas_data_pipeline_spark.operators.curation import domain_cap

    docs = spark.createDataFrame(
        [("b", "d", 1.0), ("a", "d", 1.0), ("c", "d", 1.0)],
        "doc_id string, source string, q double",
    )
    out = (
        domain_cap(docs, domain_col="source", k=2, quality_col="q")
        .toPandas()
        .sort_values("domain_rank")
    )
    # equal quality -> ascending id order wins: a (rank 1), b (rank 2)
    assert list(out.doc_id) == ["a", "b"]


# ------------------------------------------------------- chunk_documents
def test_chunk_covers_every_word_with_overlap(spark):
    from gas_data_pipeline_spark.operators.text import chunk_documents

    n, chunk, stride = 150, 64, 48
    words = [f"w{i}" for i in range(n)]
    docs = spark.createDataFrame([("d", " ".join(words))], "doc_id string, text string")
    out = chunk_documents(docs, chunk=chunk, stride=stride).toPandas()

    covered = set()
    for _, r in out.iterrows():
        toks = r.chunk_text.split(" ")
        assert len(toks) == r.n_words <= chunk
        assert toks == words[r.start_word : r.start_word + len(toks)]
        covered.update(toks)
    assert covered == set(words)
    assert list(out.sort_values("chunk_seq").start_word) == [0, 48, 96]


def test_chunk_short_doc_single_chunk(spark):
    from gas_data_pipeline_spark.operators.text import chunk_documents

    docs = spark.createDataFrame([("d", "just five small words here")], "doc_id string, text string")
    out = chunk_documents(docs, chunk=64, stride=48).toPandas()
    assert len(out) == 1
    assert int(out.n_words.iloc[0]) == 5
    assert out.chunk_text.iloc[0] == "just five small words here"


def test_chunk_degenerate_docs_emit_no_rows(spark):
    """Null text, empty text, and whitespace-only text used to produce
    phantom chunks (NULL chunk_text / n_words=1 from split('')); all
    three must now yield zero rows."""
    from gas_data_pipeline_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [("null", None), ("empty", ""), ("ws", "  \n\t ")],
        "doc_id string, text string",
    )
    assert chunk_documents(docs).count() == 0


def test_chunk_trailing_newline_does_not_inflate_word_count(spark):
    from gas_data_pipeline_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [("d", "alpha beta gamma\n"), ("e", "\t alpha  beta\tgamma \n")],
        "doc_id string, text string",
    )
    out = chunk_documents(docs).toPandas().set_index("doc_id")
    assert int(out.loc["d", "n_words"]) == 3
    assert int(out.loc["e", "n_words"]) == 3
    assert out.loc["e", "chunk_text"] == "alpha beta gamma"


def test_chunk_invalid_stride_raises(spark):
    from gas_data_pipeline_spark.operators.text import chunk_documents

    docs = spark.createDataFrame([("d", "a b")], "doc_id string, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk=8, stride=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk=8, stride=9)


def test_connected_components_driver_and_distributed_paths_agree(spark):
    """The bounded driver union-find fast path must produce labels
    bit-identical to the distributed hash-min Pregel loop (min node id
    per component), on a graph with chains, a cycle, and isolated
    pairs."""
    import random

    from gas_data_pipeline_spark.operators.dedup import connected_components

    rng = random.Random(7)
    edges = set()
    # three chains of length 6 (diameter > 2 exercises propagation)
    for base in (0, 100, 200):
        for i in range(6):
            edges.add((base + i, base + i + 1))
    # a cycle
    edges |= {(300, 301), (301, 302), (302, 300)}
    # random extra pairs
    for _ in range(40):
        a, b = rng.randrange(400, 460), rng.randrange(400, 460)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    pairs = spark.createDataFrame(sorted(edges), "id_a long, id_b long")

    fast = connected_components(pairs, "id_a", "id_b").toPandas()
    slow = connected_components(
        pairs, "id_a", "id_b", driver_max_edges=0
    ).toPandas()
    f = fast.sort_values("id").reset_index(drop=True)
    s = slow.sort_values("id").reset_index(drop=True)
    assert f.equals(s)
    # label really is the component's min id
    assert (f.groupby("label")["id"].min().index == f.groupby("label")["id"].min().values).all()


def test_jaccard_inverted_index_df_cap_bounds_stopword_postings(spark):
    """VERDICT r3 #2: a boilerplate shingle shared by every doc makes
    one posting list quadratic. With max_doc_frequency set, capped
    shingles leave the index AND both size denominators, so (a) pair
    counts collapse from O(N^2) boilerplate pairs to just the true dups,
    and (b) pairs with no capped shingles keep bit-identical scores."""
    from gas_data_pipeline_spark.operators.dedup import (
        jaccard_pairs_inverted_index,
    )

    boiler = ["b1", "b2", "b3", "b4", "b5", "b6"]
    rows = [(i, boiler + [f"u{i}"]) for i in range(20)]
    # true near-dup pair with NO boilerplate: score must not change
    rows += [
        (100, ["r1", "r2", "r3", "r4", "r5", "u100"]),
        (101, ["r1", "r2", "r3", "r4", "r5", "u101"]),
    ]
    # true near-dup pair WITH boilerplate: must survive the cap via its
    # rare shingles alone
    rows += [
        (200, boiler + ["s1", "s2", "s3", "s4", "s5", "u200"]),
        (201, boiler + ["s1", "s2", "s3", "s4", "s5", "u201"]),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, shingles array<string>")

    def pairs(**kw):
        out = jaccard_pairs_inverted_index(
            docs, "doc_id", F.col("shingles"), 0.5, **kw
        )
        return {(r.id_a, r.id_b): round(r.jaccard, 9) for r in out.collect()}

    uncapped = pairs()
    # every boilerplate-doc pair scores 6/8: the quadratic regime
    assert len(uncapped) >= 1 + 20 * 19 // 2
    capped = pairs(max_doc_frequency=10)  # boiler df=22 > 10; rest <= 2
    assert capped == {
        (100, 101): round(5 / 7, 9),
        (200, 201): round(5 / 7, 9),
    }
    # the boilerplate-free pair's verdict AND value are unchanged
    assert capped[(100, 101)] == uncapped[(100, 101)]
    # fractional form: cap = ceil(0.25 * 24) = 6 < 22 drops boiler too
    assert pairs(max_doc_frequency=0.25) == capped


def test_incremental_dedup_df_cap_admits_boilerplate_only_overlap(spark):
    """Cross-corpus form of the cap: a new doc overlapping existing
    docs ONLY through corpus-wide boilerplate must be admitted when the
    cap is on (rejected when off), while a genuine near-dup of one
    existing doc is rejected under both."""
    from gas_data_pipeline_spark.operators.dedup import incremental_dedup

    boiler = "b1 b2 b3 b4 b5 b6"
    existing = spark.createDataFrame(
        [(f"e{i}", f"{boiler} e{i}a e{i}b") for i in range(10)]
        + [("e_rare", "r1 r2 r3 r4")],
        "doc_id string, text string",
    )
    new = spark.createDataFrame(
        [
            ("x_boiler", f"{boiler} x1 x2"),  # boilerplate-only overlap
            ("y_dup", "r1 r2 r3 q1"),  # jaccard 3/5 vs e_rare, no boiler
            ("z_fresh", "z1 z2 z3 z4"),
        ],
        "doc_id string, text string",
    )
    kw = dict(id_col="doc_id", text_col="text", threshold=0.5, n=1)
    uncapped = {
        r.doc_id for r in incremental_dedup(new, existing, **kw).collect()
    }
    assert uncapped == {"z_fresh"}  # x_boiler rejected: 6/10 = 0.6
    capped = {
        r.doc_id
        for r in incremental_dedup(
            new, existing, max_doc_frequency=5, **kw
        ).collect()
    }
    assert capped == {"x_boiler", "z_fresh"}  # y_dup still caught: 3/5


def test_char_shingle_ids_n_gt_8_matches_per_gram_formula(spark):
    """ADVICE r3: the ASCII vectorized path is only valid for n<=8 (one
    uint64 per gram); n=9 must take the per-gram loop, whose md5 branch
    gives exact ids for >8-byte grams — not shift-wrapped garbage."""
    import hashlib

    from gas_data_pipeline_spark.operators.dedup import char_shingle_ids_pandas

    text = "abcdefghijkl"
    df = spark.createDataFrame([(text,)], "text string")
    got = sorted(
        df.select(char_shingle_ids_pandas(n=9)(F.col("text")).alias("ids"))
        .collect()[0]
        .ids
    )
    mask = (1 << 63) - 1
    expect = sorted(
        int.from_bytes(hashlib.md5(text[i : i + 9].encode()).digest()[:8], "big")
        & mask
        for i in range(len(text) - 8)
    )
    assert got == expect


def test_token_counts_null_text_yields_null_not_negative(spark):
    """size(NULL array) is -1 under legacy sizeOfNull; token counters
    must map that back to NULL (SQL len() semantics) — a -1 would
    silently poison token-budget sums."""
    from gas_data_pipeline_spark.operators.text import (
        bpe_pretoken_count,
        token_stats,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "two words")], "doc_id long, text string"
    )
    t = F.col("text")
    s = token_stats(t)
    out = docs.select(
        "doc_id",
        s["n_tokens"].alias("nt"),
        s["n_words"].alias("nw"),
        bpe_pretoken_count(t).alias("bpe"),
    ).toPandas().set_index("doc_id")
    import pandas as pd

    assert pd.isna(out.loc[1, "nt"]) and pd.isna(out.loc[1, "nw"]) and pd.isna(out.loc[1, "bpe"])
    assert out.loc[2, "nt"] == 0 and out.loc[2, "bpe"] == 0
    assert out.loc[3, "nw"] == 2
