"""Ground-truth and plan-shape tests for the training-data curation
operators (value parity vs DuckDB is covered by test_parity.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from tests.conftest import SF_SMALL


def _q(name):
    from gas_data_pipeline_spark.registry import all_queries

    return all_queries()[name]


def test_contamination_flags_benchmark_members(spark):
    """Benchmark documents are 100% contaminated with themselves."""
    pdf = _q("curation_contamination")(spark, SF_SMALL).toPandas()
    bench = pdf[pdf.doc_id % 50 == 0]
    assert len(bench) > 0
    assert (bench.contamination == 1.0).all()
    assert bench.flagged.all()
    # Signal, not noise: most non-benchmark docs stay unflagged.
    rest = pdf[pdf.doc_id % 50 != 0]
    assert rest.flagged.mean() < 0.5


def test_contamination_broadcasts_benchmark(spark):
    df = _q("curation_contamination")(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pack_sequences_chunk_invariants(spark):
    pdf = (
        _q("curation_pack_sequences")(spark, SF_SMALL)
        .toPandas()
        .sort_values(["shard", "doc_id"])
    )
    cap = 512
    for _, g in pdf.groupby("shard"):
        # Cumulative sum consistent with per-doc counts.
        assert (g.n_tokens.cumsum() == g.cum_tokens).all()
        # Chunk span arithmetic: contiguous coverage of the token stream.
        assert ((g.cum_tokens - g.n_tokens) // cap == g.first_chunk).all()
        assert ((g.cum_tokens - 1) // cap == g.last_chunk).all()
        assert (g.n_chunks == g.last_chunk - g.first_chunk + 1).all()
        # Next doc starts in the chunk the previous doc ended in (or the
        # next one, exactly at a capacity boundary).
        nxt = g.first_chunk.shift(-1).dropna()
        prv = g.last_chunk.iloc[: len(nxt)]
        assert ((nxt.values - prv.values).astype(int) <= 1).all()
        assert ((nxt.values - prv.values).astype(int) >= 0).all()


def test_quality_rules_match_python_recompute(spark):
    import re

    pdf = _q("curation_quality_rules")(spark, SF_SMALL).toPandas()
    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .limit(25)
        .toPandas()
    )
    tok_re = re.compile(r"[a-z0-9]+|[^\sa-z0-9]")
    for _, row in docs.iterrows():
        text = row.text.replace(" batch", "\nbatch")
        toks = tok_re.findall(text.lower())
        words = [t for t in toks if re.match(r"^[a-z0-9]", t)]
        got = pdf[pdf.doc_id == row.doc_id].iloc[0]
        assert got.n_words == len(words)
        assert abs(got.mean_word_len - sum(map(len, words)) / len(words)) < 1e-5
        lines = text.split("\n")
        assert abs(got.dup_line_frac - (len(lines) - len(set(lines))) / len(lines)) < 1e-9
        assert bool(got.keep) == (50 <= len(words) <= 100_000)


def test_shuffle_rank_is_exact_global_permutation(spark):
    """The distributed bucketed two-pass rank equals the naive global
    window — same permutation, no global sort partition."""
    df = _q("curation_shuffle_rank")(spark, SF_SMALL)
    pdf = df.toPandas().sort_values("doc_id")
    n = len(pdf)
    assert sorted(pdf.shuffle_rank) == list(range(1, n + 1))
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select("doc_id")
    key = F.md5(F.concat(F.lit("shuffle-v1:"), F.col("doc_id").cast("string")))
    naive = (
        docs.select("doc_id", F.row_number().over(Window.orderBy(key, "doc_id")).alias("r"))
        .toPandas()
        .sort_values("doc_id")
    )
    assert (pdf.shuffle_rank.values == naive.r.values).all()
    # Scale shape: ranks come from per-bucket windows + a broadcast
    # offset join, never one global sort partition.
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_weighted_sample_deterministic_and_thresholded(spark):
    a = _q("curation_weighted_sample")(spark, SF_SMALL).toPandas()
    b = _q("curation_weighted_sample")(spark, SF_SMALL).toPandas()
    assert a.sort_values("doc_id").equals(b.sort_values("doc_id"))
    assert (a.u < a.keep_prob).all()
    # Long docs (keep_prob == 1) are always kept.
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    from gas_data_pipeline_spark.operators.text import is_word, tokenize

    long_ids = (
        docs.select("doc_id", F.size(F.filter(tokenize(F.col("text")), is_word)).alias("w"))
        .filter(F.col("w") >= 80)
        .toPandas()
        .doc_id
    )
    assert set(long_ids).issubset(set(a.doc_id))


def test_repetition_topgram_matches_python_recompute(spark):
    import re
    from collections import Counter

    pdf = _q("text_repetition_topgram")(spark, SF_SMALL).toPandas()
    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .limit(20)
        .toPandas()
    )
    tok_re = re.compile(r"[a-z0-9]+|[^\sa-z0-9]")
    for _, row in docs.iterrows():
        words = [t for t in tok_re.findall(row.text.lower()) if re.match(r"^[a-z0-9]", t)]
        bigrams = [f"{a} {b}" for a, b in zip(words, words[1:])]
        got = pdf[pdf.doc_id == row.doc_id].iloc[0]
        assert got.n_bigrams == len(bigrams)
        assert got.top_bigram_count == max(Counter(bigrams).values())


def test_end_to_end_composes_stage_invariants(spark):
    import pyspark.sql.functions as F

    out = _q("curation_end_to_end")(spark, SF_SMALL).toPandas()
    # Ranks are a dense permutation of the survivors.
    assert sorted(out.shuffle_rank) == list(range(1, len(out) + 1))
    # Survivors pass each stage's own filter.
    quality = _q("curation_quality_rules")(spark, SF_SMALL).toPandas()
    flagged = _q("curation_contamination")(spark, SF_SMALL).toPandas()
    ok_words = set(quality[quality.n_words >= 50].doc_id)
    dirty = set(flagged[flagged.flagged].doc_id)
    assert set(out.doc_id) <= ok_words - dirty
    # And dedup: no two survivors share a content hash.
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    kept = docs.filter(F.col("doc_id").isin([int(i) for i in out.doc_id]))
    n_hashes = kept.select(F.sha2("text", 256)).distinct().count()
    assert n_hashes == len(out)


def test_resample_to_mixture_matches_python_recompute(spark):
    """Exact copy counts: floor(w) + (u < frac(w)), u recomputed from
    md5 in Python; up-sampled rows carry distinct copy_num values."""
    import hashlib
    import math

    from gas_data_pipeline_spark.operators.curation import resample_to_mixture

    docs = spark.createDataFrame(
        [(i, float(w)) for i, w in enumerate([0.0, 0.3, 0.9, 1.0, 1.7, 2.3, 3.0])],
        "doc_id bigint, wt double",
    )
    out = resample_to_mixture(docs, F.col("wt"), seed="t-mix").toPandas()

    def u_of(i: int) -> float:
        h = hashlib.md5(f"t-mix:{i}".encode()).hexdigest()[:13]
        return int(h, 16) / float(1 << 52)

    for i, w in enumerate([0.0, 0.3, 0.9, 1.0, 1.7, 2.3, 3.0]):
        expect = int(math.floor(w)) + (1 if u_of(i) < w - math.floor(w) else 0)
        got = out[out.doc_id == i]
        assert len(got) == expect, (i, w, u_of(i))
        if expect:
            assert sorted(got.copy_num) == list(range(1, expect + 1))

    # Deterministic: a second run yields the identical frame.
    again = resample_to_mixture(docs, F.col("wt"), seed="t-mix").toPandas()
    key = ["doc_id", "copy_num"]
    assert out.sort_values(key).reset_index(drop=True).equals(
        again.sort_values(key).reset_index(drop=True)
    )


def test_mixture_apply_expected_copies_near_weight(spark):
    """The end-to-end mixture pass yields per-source copy counts within
    binomial noise of weight * n_docs, and never exceeds ceil(w) per doc."""
    q = _q("curation_mixture_apply")(spark, SF_SMALL).toPandas()
    per_doc = q.groupby("doc_id").copy_num.max()
    assert per_doc.ge(1).all() and per_doc.le(3).all()


def test_token_budget_matches_naive_global_window(spark):
    """Slab-bucketed prefix sum == the naive single-partition window,
    including on adversarial score distributions (heavy ties, skew)."""
    import random

    from gas_data_pipeline_spark.operators.curation import token_budget_select

    rng = random.Random(7)
    rows = [
        # Ties across slab boundaries, zero-token docs, skewed scores.
        (i, rng.choice([0.1, 0.25, 0.25, 0.5, 0.9, 0.9]), rng.randint(0, 40))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "score", "n_tokens"])
    got = (
        token_budget_select(df, "doc_id", "score", "n_tokens", budget=3000, n_buckets=8)
        .orderBy("doc_id")
        .toPandas()
    )
    naive = sorted(rows, key=lambda r: (-r[1], r[0]))
    cum, expect = 0, {}
    for did, _, tok in naive:
        cum += tok
        expect[did] = (cum, cum <= 3000)
    assert [tuple(r) for r in got[["cum_tokens", "selected"]].itertuples(index=False)] == [
        expect[d] for d in got.doc_id
    ]
    # Boundary inclusivity: the doc that lands exactly ON budget keeps.
    df2 = spark.createDataFrame(
        [(1, 2.0, 10), (2, 1.0, 5), (3, 0.5, 1)], ["doc_id", "score", "n_tokens"]
    )
    got2 = (
        token_budget_select(df2, "doc_id", "score", "n_tokens", budget=15)
        .orderBy("doc_id")
        .toPandas()
    )
    assert list(got2.selected) == [True, True, False]


def test_token_budget_degenerate_uniform_scores(spark):
    """All-equal scores collapse to one slab: still exact, still a
    well-defined (score desc, id) order."""
    from gas_data_pipeline_spark.operators.curation import token_budget_select

    df = spark.createDataFrame(
        [(i, 1.0, 10) for i in range(20)], ["doc_id", "score", "n_tokens"]
    )
    got = (
        token_budget_select(df, "doc_id", "score", "n_tokens", budget=100)
        .orderBy("doc_id")
        .toPandas()
    )
    assert list(got.cum_tokens) == [10 * (i + 1) for i in range(20)]
    assert got.selected.sum() == 10


def test_token_budget_no_full_data_global_window(spark):
    """The only unpartitioned window runs over the <=n_buckets-row
    offsets aggregate — corpus-sized data is always windowed within a
    slab partition."""
    from tests.conftest import SF_SMALL

    import re

    df = _q("curation_token_budget")(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    firsts = [
        m.group(1).split(",")[0]
        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan)
    ]
    # A partitioned windowspec leads with a bare column (`_bkt#12`);
    # an unpartitioned one leads with an ORDER spec (`col ASC ...`).
    part = [s for s in firsts if " ASC" not in s and " DESC" not in s]
    unpart = [s for s in firsts if s not in part]
    assert part and all(s.startswith("_bkt") for s in part)
    # The only unpartitioned window is the <=n_buckets-row offsets
    # prefix sum, which orders by the slab id.
    assert len(unpart) == 1 and unpart[0].startswith("_bkt")


def test_shard_pack_contiguous_gapfree_and_complete(spark, tmp_path):
    """Shard packing invariants: every doc lands in exactly one shard,
    shards hold contiguous rank ranges [s*size+1, (s+1)*size] with no
    gaps, only the last shard is partial — and the packed frame
    round-trips through a partitioned parquet write (the actual shard
    layout a loader reads) with membership intact."""
    from gas_data_pipeline_spark.operators.curation import shard_pack

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", F.length("text").alias("n_chars2")
    )
    n = docs.count()
    size = 16
    packed = shard_pack(docs, "doc_id", ("n_chars2",), shard_size=size)
    pdf = packed.toPandas().sort_values("shuffle_rank")
    assert sorted(pdf.shuffle_rank) == list(range(1, n + 1))
    assert len(pdf) == pdf.doc_id.nunique()
    n_shards = -(-n // size)
    assert sorted(pdf.shard_id.unique()) == list(range(n_shards))
    for s, grp in pdf.groupby("shard_id"):
        lo, hi = int(grp.shuffle_rank.min()), int(grp.shuffle_rank.max())
        assert lo == s * size + 1
        assert hi - lo + 1 == len(grp)
        expect = size if s < n_shards - 1 else n - size * (n_shards - 1)
        assert len(grp) == expect
    out = str(tmp_path / "shards")
    packed.write.partitionBy("shard_id").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == n
    assert back.select("shard_id").distinct().count() == n_shards
    assert (
        back.agg(F.sum("doc_id")).collect()[0][0]
        == pdf.doc_id.astype("int64").sum()
    )


def test_shard_pack_no_global_sort_partition(spark):
    """The corpus-sized rank window is PARTITIONED by the md5-prefix
    bucket (256 ranges) and offsets arrive via a broadcast join — the
    only single-partition window in the plan is the 256-row offsets
    prefix sum, never a corpus-wide sort."""
    from gas_data_pipeline_spark.operators.curation import shard_pack

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select("doc_id")
    packed = shard_pack(docs, "doc_id", (), shard_size=16)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # row_number runs under a windowspec partitioned on the bucket.
    assert "windowspecdefinition(_bucket" in plan


def test_shard_append_never_moves_history(spark):
    """The append-only contract: packing base+delta incrementally
    leaves every base doc in exactly the shard a base-only pack gave
    it; delta fills the frontier shard to capacity before opening new
    ones and never touches an interior shard."""
    from gas_data_pipeline_spark.operators.curation import (
        shard_append,
        shard_pack,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select("doc_id")
    base = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)
    size = 16
    n_base = base.count()
    solo = shard_pack(base, "doc_id", shard_size=size).toPandas()
    both_base = shard_pack(base, "doc_id", shard_size=size).toPandas()
    assert solo.sort_values("doc_id").reset_index(drop=True).equals(
        both_base.sort_values("doc_id").reset_index(drop=True)
    )
    appended = shard_append(delta, n_base, "doc_id", shard_size=size).toPandas()
    frontier = (n_base - 1) // size  # last base shard
    assert int(appended.shard_id.min()) >= frontier
    # Global ranks continue the base sequence with no gap or overlap.
    assert sorted(appended.shuffle_rank) == list(
        range(n_base + 1, n_base + 1 + len(appended))
    )
    # Frontier shard tops up to exactly `size` before a new one opens.
    n_total = n_base + len(appended)
    import pandas as pd

    allrows = pd.concat(
        [solo[["doc_id", "shuffle_rank", "shard_id"]], appended]
    )
    per = allrows.groupby("shard_id").size()
    for s, cnt in per.items():
        if s < (n_total - 1) // size:
            assert cnt == size, (s, cnt)
