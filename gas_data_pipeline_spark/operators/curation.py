"""Training-data curation operators (SURVEY §2.11 extensions): the
corpus-preparation passes a 100 TB LLM data pipeline runs between raw
ingest and tokenization — benchmark decontamination, GPT-style
sequence packing, C4/Gopher-style quality rules, deterministic global
shuffle, and hash-thresholded weighted sampling.

Design rules shared by every operator here:

- Pure native Column expressions (no Python in the hot path); the
  only joins are broadcast (benchmark gram set, bucket offsets).
- Deterministic: every random choice derives from md5 of (salt, id),
  so reruns, retries, and different cluster layouts give identical
  output — and every operator is value-oracle-able in DuckDB.
- Shuffle discipline: decontamination = one map-side-combinable agg;
  packing = one window per shard; shuffle-rank = per-bucket sorts +
  a 256-row offset stats object, never a single global sort partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gas_data_pipeline_spark.operators.dedup import word_shingles
from gas_data_pipeline_spark.operators.text import (
    is_word,
    nullsafe_size,
    tokenize,
)


def contamination_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.2,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents whose word
    n-gram overlap with an evaluation set exceeds ``threshold`` (the
    standard eval-leakage guard before training).

    Plan shape at 100 TB: the benchmark gram set is tiny relative to
    the corpus (eval suites are MBs) — built once, made distinct, and
    BROADCAST; the corpus explodes its distinct grams (narrow), left
    joins the broadcast set, and aggregates per document (map-side
    combinable, one shuffle keyed on the doc id). The corpus is never
    shuffled by gram and no all-pairs comparison exists anywhere.

    Returns (id, n_grams, n_contaminated, contamination, flagged).
    """
    bench_grams = (
        benchmark.select(F.explode(word_shingles(F.col(text_col), n)).alias("gram"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    grams = corpus.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("gram")
    )
    per_doc = (
        grams.join(F.broadcast(bench_grams), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint").alias("n_contaminated"),
        )
    )
    contamination = F.col("n_contaminated") / F.col("n_grams")
    return per_doc.select(
        id_col,
        "n_grams",
        "n_contaminated",
        F.round(contamination, 6).alias("contamination"),
        (contamination >= threshold).alias("flagged"),
    )


def pack_sequences(
    docs: DataFrame,
    capacity: int = 2048,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing: concatenate each
    shard's documents in id order and split the token stream into
    fixed-``capacity`` context windows; report which chunk span each
    document lands in (first_chunk, last_chunk, n_chunks).

    The packing is a running-sum window per shard — no join, no state.
    At 100 TB the shard key is whatever bounds a sort (date bucket,
    source file group); each shard sorts independently, so the widest
    operation is a per-shard sort, never a global one. Token counts
    use the engine's BPE-ish tokenizer (operators.text.tokenize).
    """
    toks = docs.select(
        F.col(id_col),
        F.pmod(F.col(id_col), F.lit(n_shards)).alias("shard"),
        # nullsafe+coalesce: a null-text doc occupies ZERO tokens —
        # size(NULL)=-1 would otherwise DECREMENT the running sum and
        # shift every later document's chunk span.
        F.coalesce(nullsafe_size(tokenize(F.col(text_col))), F.lit(0))
        .cast("bigint")
        .alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cumulative = toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    # Zero-token documents occupy no chunks (their span is NULL, count
    # 0). The guard also dodges an engine divergence: Spark's `div`
    # truncates toward zero while Python/DuckDB floor, and they only
    # agree on the non-negative operands the n_tokens > 0 branch sees.
    nonempty = F.col("n_tokens") > 0
    first_chunk = F.when(nonempty, F.expr(f"(cum_tokens - n_tokens) div {capacity}"))
    last_chunk = F.when(nonempty, F.expr(f"(cum_tokens - 1) div {capacity}"))
    return cumulative.select(
        id_col,
        "shard",
        "n_tokens",
        "cum_tokens",
        first_chunk.alias("first_chunk"),
        last_chunk.alias("last_chunk"),
        F.coalesce(last_chunk - first_chunk + F.lit(1), F.lit(0).cast("bigint")).alias(
            "n_chunks"
        ),
    )


def quality_rule_columns(text: Column) -> list[Column]:
    """C4/Gopher-style document quality signals as native expressions.

    Every signal has an exact DuckDB twin (list_* functions over the
    same tokenization), so the whole rule table is value-oracle-able.
    """
    toks = tokenize(text)
    words = F.filter(toks, is_word)
    lines = F.split(text, "\n")
    # nullsafe: size(NULL)=-1 would report n_words=-1 for null text
    # (and diverge from the DuckDB twin, where len(NULL) is NULL).
    n_toks = nullsafe_size(toks)
    n_words = nullsafe_size(words)
    n_lines = nullsafe_size(lines)
    mean_word_len = F.when(
        n_words > 0,
        F.aggregate(
            words, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        )
        / n_words,
    )
    symbol_ratio = F.when(n_toks > 0, (n_toks - n_words) / n_toks)
    dup_line_frac = F.when(
        n_lines > 0, (n_lines - F.size(F.array_distinct(lines))) / n_lines
    )
    bullet_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(lines, lambda ln: F.trim(ln).rlike("^[-*•]"))
        )
        / n_lines,
    )
    return [
        n_words.cast("bigint").alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(dup_line_frac, 6).alias("dup_line_frac"),
        F.round(bullet_frac, 6).alias("bullet_frac"),
    ]


def quality_rules_keep(row_prefix: str = "") -> Column:
    """The keep decision over :func:`quality_rule_columns` output —
    C4/Gopher-shaped bounds (word count, word length, symbol and
    repetition caps). Expressed over the already-computed columns so
    the rule table and the decision stay in one narrow pass."""
    c = lambda name: F.col(row_prefix + name)  # noqa: E731
    return (
        (c("n_words") >= 50)
        & (c("n_words") <= 100_000)
        & (c("mean_word_len") >= 2)
        & (c("mean_word_len") <= 12)
        & (c("symbol_ratio") <= 0.5)
        & (c("dup_line_frac") <= 0.3)
    )


SHUFFLE_BUCKETS = 256


def shuffle_key(id_col: Column, seed: str) -> Column:
    """Deterministic portable shuffle key: md5 of (seed, id). Ordering
    by this hex string is the seeded random permutation — identical in
    Spark and DuckDB, stable across reruns and cluster layouts."""
    return F.md5(F.concat(F.lit(seed + ":"), id_col.cast("string")))


def seeded_shuffle_rank(
    docs: DataFrame, id_col: str = "doc_id", seed: str = "shuffle-v1"
) -> DataFrame:
    """Deterministic global shuffle rank — the training-order
    permutation — WITHOUT a single-partition global sort.

    The md5 key's first two hex chars are its lexicographic prefix, so
    bucket = int(prefix) partitions the global order into 256
    contiguous ranges: global rank = (rows in earlier buckets) +
    (rank within my bucket). Bucket counts are a 256-row aggregate
    (a broadcastable stats object, like the IVF centroids); ranks
    within a bucket are an ordinary per-bucket window sort. At 100 TB
    every sort is 1/256th of the corpus and the only full-data
    shuffle is the bucket hash partitioning.
    """
    key = shuffle_key(F.col(id_col), seed)
    keyed = docs.select(
        F.col(id_col),
        key.alias("skey"),
        F.conv(F.substring(key, 1, 2), 16, 10).cast("int").alias("bucket"),
    )
    counts = keyed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    offsets = counts.select(
        "bucket",
        (
            F.sum("n").over(
                Window.orderBy("bucket").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            - F.col("n")
        ).alias("offset"),
    )
    ranked = keyed.withColumn(
        "bucket_rank",
        F.row_number().over(
            Window.partitionBy("bucket").orderBy("skey", id_col)
        ),
    )
    return ranked.join(F.broadcast(offsets), "bucket").select(
        id_col,
        (F.col("offset") + F.col("bucket_rank")).cast("bigint").alias("shuffle_rank"),
    )


def token_budget_select(
    docs: DataFrame,
    id_col: str,
    score_col: str,
    tokens_col: str,
    budget: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Greedy token-budget corpus selection: walk documents in quality
    order (``score`` desc, id asc) and keep each document whose
    INCLUSIVE running token total still fits ``budget`` — the
    "best docs first until we have N training tokens" cut every
    mixture plan ends in.

    The running total is a global prefix sum, which a naive window
    computes on a single partition — the one shape that cannot scale.
    Same regime as :func:`seeded_shuffle_rank`: carve the score range
    into ``n_buckets`` contiguous slabs using a broadcast (min, max)
    stats row, aggregate per-slab token sums (an <=n_buckets-row
    object, windowed into prefix offsets on the driver-sized side),
    and add an ordinary within-slab running sum. Every sort touches
    1/n_buckets of the corpus; the only full-data shuffle is the slab
    hash partition. Value skew makes slabs uneven but never wrong —
    AQE splits an oversized slab's sort. Adds ``cum_tokens`` and
    ``selected`` to the input columns."""
    sc, idc = F.col(score_col), F.col(id_col)
    bounds = docs.agg(
        F.min(score_col).alias("_lo"), F.max(score_col).alias("_hi")
    )
    span = F.col("_hi") - F.col("_lo")
    # Descending score -> ascending slab id, ties share a slab (the
    # slab is a pure function of the score value).
    bucket = F.when(
        span > 0,
        F.least(
            F.lit(n_buckets - 1),
            F.floor((F.col("_hi") - sc) / span * n_buckets).cast("int"),
        ),
    ).otherwise(F.lit(0))
    keyed = (
        docs.crossJoin(F.broadcast(bounds))
        .withColumn("_bkt", bucket)
        .drop("_lo", "_hi")
    )
    per = keyed.groupBy("_bkt").agg(F.sum(tokens_col).alias("_t"))
    offsets = per.select(
        "_bkt",
        (
            F.sum("_t").over(
                Window.orderBy("_bkt").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            - F.col("_t")
        ).alias("_off"),
    )
    w = (
        Window.partitionBy("_bkt")
        .orderBy(sc.desc(), idc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = keyed.withColumn("_run", F.sum(tokens_col).over(w))
    cum = (F.col("_off") + F.col("_run")).cast("bigint")
    return (
        run.join(F.broadcast(offsets), "_bkt")
        .withColumn("cum_tokens", cum)
        .withColumn("selected", F.col("cum_tokens") <= F.lit(int(budget)))
        .drop("_bkt", "_run", "_off")
    )


def uniform_draw(id_col: Column, seed: str) -> Column:
    """Deterministic uniform [0,1) draw from md5(seed, id): the first
    13 hex chars are 52 bits, exact in a double. DuckDB reproduces it
    bit-for-bit (`CAST(concat('0x', substring(md5(...),1,13)) AS
    BIGINT) / 2^52`), which is what makes every sampling operator here
    value-oracle-able."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(seed + ":"), id_col.cast("string"))), 1, 13),
        16,
        10,
    ).cast("double") / F.lit(float(1 << 52))


def weighted_sample(
    docs: DataFrame,
    weight: Column,
    id_col: str = "doc_id",
    seed: str = "sample-v1",
) -> DataFrame:
    """Deterministic weighted (importance) sampling: keep a row iff
    u(id) < weight, where u is a uniform [0,1) draw derived from
    md5(seed, id) — 13 hex chars = 52 bits, exact in a double.

    Stateless and reproducible: a document's keep/drop never changes
    when other rows appear (unlike rand()-based sampling), which is
    what makes incremental re-curation of a growing corpus possible.
    Narrow op, zero shuffle; portable to DuckDB for the oracle.
    """
    u = uniform_draw(F.col(id_col), seed)
    # Filter on the raw draw (rounding first could flip boundary rows
    # against an oracle that filters unrounded); round only for display.
    return docs.withColumn("_u", u).filter(F.col("_u") < weight)


def resample_to_mixture(
    docs: DataFrame,
    weight: Column,
    id_col: str = "doc_id",
    seed: str = "mix-v1",
) -> DataFrame:
    """Deterministic integer resampling toward a target mixture: each
    row is emitted ``floor(w)`` times, plus once more iff
    ``u(id) < frac(w)`` — so E[copies] = w exactly, for any w >= 0.
    Unlike `weighted_sample` (keep/drop, w <= 1 only) this also
    UP-samples: w = 2.3 yields 2 or 3 copies, the standard move when an
    under-represented domain must be boosted toward a target mixture
    (weights come from e.g. `curation_mixture_weights`).

    Output gains a ``copy_num`` column (1..n) so downstream packing /
    shuffling treats repeats as distinct rows. Narrow op: the only row
    growth is the explode fan-out (bounded by ceil(max w)); no shuffle,
    no join. Deterministic per id — a document's copy count never
    changes as the corpus around it grows, so incremental re-curation
    stays stable.
    """
    u = uniform_draw(F.col(id_col), seed)
    n = (F.floor(weight) + (u < (weight - F.floor(weight))).cast("bigint")).cast("bigint")
    return (
        docs.withColumn("_n_copies", n)
        .filter(F.col("_n_copies") >= 1)
        .withColumn("copy_num", F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("_n_copies"))))
        .drop("_n_copies")
    )


def domain_cap(
    docs: DataFrame,
    domain_col: str = "source",
    k: int = 15,
    quality_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain document cap (the RefinedWeb/C4 anti-spam move): keep
    at most ``k`` documents per domain, preferring higher
    ``quality_col`` (ties broken by ``id_col`` for determinism). Output
    keeps every input column and adds ``domain_rank`` (1-based within
    the domain) and ``n_in_domain`` (pre-cap domain size, so the
    drop rate per domain is reportable downstream).

    Scale shape: one shuffle on the domain key, then a per-partition
    sorted pass — identical to what a MERGE-style top-k would do. A
    pathological mega-domain (one domain = appreciable fraction of the
    corpus) serializes its partition; the fix at that scale is a
    two-pass rank (per-partition partial top-k, then merge the ≤
    k*n_partitions survivors), worth its extra pass only when a domain
    exceeds executor-partition size — not wired here because the cap's
    whole purpose is that domains are small after it."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(domain_col).orderBy(
        F.col(quality_col).desc(), F.col(id_col)
    )
    wd = Window.partitionBy(domain_col)
    return (
        docs.withColumn("domain_rank", F.row_number().over(w).cast("bigint"))
        .withColumn("n_in_domain", F.count(F.lit(1)).over(wd).cast("bigint"))
        .filter(F.col("domain_rank") <= k)
    )


def shard_pack(
    docs: DataFrame,
    id_col: str = "doc_id",
    payload_cols: tuple[str, ...] = (),
    *,
    shard_size: int = 64,
    seed: str = "shard-v1",
) -> DataFrame:
    """Pack the corpus into fixed-size training shards in seeded
    shuffle order — the webdataset/TFRecord sharding step that turns
    a curated corpus into the unit a data loader streams. Shard ``s``
    holds global shuffle ranks ``[s*size+1, (s+1)*size]``, so the
    assignment is deterministic, resumable, and independent of
    cluster layout.

    Same two-level rank as :func:`seeded_shuffle_rank` (the md5 key's
    first byte partitions the global order into 256 contiguous
    ranges; counts are a 256-row broadcast; within-range ranks are
    ordinary partitioned windows) with the payload columns carried
    through, so no corpus-sized self-join is needed to reunite ranks
    with rows. At 100 TB the only full-data exchange is the 256-way
    bucket hash partition; every sort touches 1/256th of the corpus.

    Returns ``id_col``, the payload columns, ``shuffle_rank``, and
    ``shard_id``.
    """
    from pyspark.sql.window import Window

    key = shuffle_key(F.col(id_col), seed)
    keyed = docs.select(
        F.col(id_col),
        *[F.col(c) for c in payload_cols],
        key.alias("skey"),
        F.conv(F.substring(key, 1, 2), 16, 10).cast("int").alias("_bucket"),
    )
    counts = keyed.groupBy("_bucket").agg(F.count(F.lit(1)).alias("n"))
    offsets = counts.select(
        "_bucket",
        (
            F.sum("n").over(
                Window.orderBy("_bucket").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            - F.col("n")
        ).alias("_offset"),
    )
    ranked = keyed.withColumn(
        "_bucket_rank",
        F.row_number().over(
            Window.partitionBy("_bucket").orderBy("skey", id_col)
        ),
    )
    rank = (F.col("_offset") + F.col("_bucket_rank")).cast("bigint")
    return (
        ranked.join(F.broadcast(offsets), "_bucket")
        .select(
            id_col,
            *payload_cols,
            rank.alias("shuffle_rank"),
            F.floor((rank - 1) / F.lit(float(shard_size)))
            .cast("bigint")
            .alias("shard_id"),
        )
    )


def shard_append(
    delta: DataFrame,
    n_base: int,
    id_col: str = "doc_id",
    payload_cols: tuple[str, ...] = (),
    *,
    shard_size: int = 64,
    seed: str = "shard-v1",
) -> DataFrame:
    """Append-only shard maintenance: place NEW documents into the
    shard sequence AFTER the ``n_base`` already-sharded ones — the
    daily-increment counterpart of :func:`shard_pack`. Delta docs are
    ranked among themselves in seeded shuffle order and take global
    ranks ``n_base+1 ...``, so they first top up the partial frontier
    shard and then open fresh shards; every historical shard keeps
    its exact membership (training runs that already consumed those
    shards never see them change — the same append-only discipline as
    the bronze zero-loss sink, reference app/db/repository.py's
    insert-only path).

    Scale shape: only the DELTA is ranked (same two-level md5-prefix
    rank, 256-row broadcast offsets); the base corpus is represented
    by the single integer ``n_base`` — incremental cost is
    O(|delta|), independent of history size."""
    ranked = shard_pack(
        delta, id_col, payload_cols, shard_size=shard_size, seed=seed
    )
    rank = F.col("shuffle_rank") + F.lit(int(n_base))
    return ranked.select(
        id_col,
        *payload_cols,
        rank.alias("shuffle_rank"),
        F.floor((rank - 1) / F.lit(float(shard_size)))
        .cast("bigint")
        .alias("shard_id"),
    )
