"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram
Jaccard (SURVEY §2.11 X1; BASELINE.json north star).

Scale design (the whole point):

- exact: one hash aggregate — shuffle on a 64-hex key, trivially
  AQE-balanced.
- n-gram Jaccard: *inverted-index* join (explode shingle -> co-group)
  — candidate generation is linear in total shingle count, never the
  N² cross join.
- MinHash-LSH: signature is a per-row narrow computation; banding
  turns "similar pairs" into an equi-join on (band, band_hash) — the
  classic shuffle-friendly formulation (MMDS ch.3); only candidates
  pay the exact-Jaccard verification.
- SimHash: 64-bit fingerprint per row (narrow); near-dup = equal
  16-bit band keys, again an equi-join.

Everything is built from native expressions (xxhash64, transform,
aggregate) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of lower-cased text."""
    words = F.split(F.lower(F.trim(text)), r"\s+")
    k = F.greatest(F.size(words) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(1), k)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(words, i + j) for j in range(n)]
    )
    return F.array_distinct(F.transform(idx, gram))


def char_shingles(text: Column, n: int = 4) -> Column:
    """Distinct character n-gram shingles (works for CJK / no-space
    scripts where word shingles degenerate)."""
    t = F.lower(text)
    k = F.greatest(F.length(t) - F.lit(n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), k), lambda i: F.substring(t, i, n))
    )


def exact_dedup_ranked(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """X1 exact: content-hash groups with a deterministic canonical row
    (lowest id). Output keeps every row tagged, so the caller chooses
    drop vs audit. One shuffle on the content hash."""
    h = F.sha2(F.col(text_col), 256).alias("content_hash")
    w = Window.partitionBy("content_hash").orderBy(F.col(id_col))
    return (
        df.select(F.col(id_col), h)
        .withColumn("dup_rank", F.row_number().over(w).cast("bigint"))
        .withColumn("is_canonical", F.col("dup_rank") == 1)
    )


def jaccard_pairs_inverted_index(
    df: DataFrame,
    id_col: str,
    shingle_col: Column,
    threshold: float,
) -> DataFrame:
    """X1 n-gram Jaccard: exact similarity join via inverted index.

    explode(shingles) -> self-equi-join on shingle -> count common
    shingles per pair -> |A∩B| / (|A|+|B|-|A∩B|) >= threshold.
    Returns (id_a, id_b, jaccard) with id_a < id_b.

    At 100 TB add a df-frequency cap (drop shingles appearing in >p%
    of docs — stopword shingles explode the index) before the join.
    """
    base = df.select(F.col(id_col).alias("id"), shingle_col.alias("shingles"))
    sized = base.withColumn("n_shingles", F.size("shingles"))
    inv = sized.select(
        "id", "n_shingles", F.explode("shingles").alias("shingle")
    )
    a, b = inv.alias("a"), inv.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_shingles").alias("na"),
            F.col("b.n_shingles").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = (F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))).alias(
        "jaccard"
    )
    return common.select("id_a", "id_b", jac).filter(F.col("jaccard") >= threshold)


def minhash_signature(shingle_col: Column, k: int = 64) -> Column:
    """k-permutation MinHash signature as an array<bigint>: permutation
    i is xxhash64 salted with i; signature[i] = min over shingles.
    Narrow per-row computation — no shuffle.

    NB: the salt must be captured via a closure, NOT a defaulted second
    lambda parameter — a two-parameter lambda makes ``F.transform``
    pass the array index as the second argument, silently shadowing
    the salt (all k slots collapse to one permutation)."""

    def perm(i: int) -> Column:
        return F.array_min(
            F.transform(shingle_col, lambda s: F.xxhash64(F.lit(i), s))
        )

    return F.array(*[perm(i) for i in range(k)])


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    shingle_col: Column,
    threshold: float = 0.5,
    k: int = 64,
    bands: int = 32,
) -> DataFrame:
    """X1 MinHash-LSH: banded signature equi-join for candidates, exact
    Jaccard verification on candidates only.

    Default bands=32 × rows=2 (k=64) is a recall-leaning S-curve:
    capture probability at j=0.5 is 1-(1-0.25)^32 ≈ 0.9999 (vs ~40%
    for the textbook 8×4 split). At 100 TB trade the other way —
    fewer, wider bands (e.g. 16×8 at k=128) cut the candidate count
    for the same threshold at the cost of borderline recall.
    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    """
    rows_per_band = k // bands
    base = df.select(F.col(id_col).alias("id"), shingle_col.alias("shingles")).filter(
        F.size("shingles") > 0
    )
    sig = base.withColumn("sig", minhash_signature(F.col("shingles"), k))
    banded = sig.select(
        "id",
        "shingles",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select("id", "shingles", "bh.band", "bh.band_hash")

    a, b = banded.alias("a"), banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        candidates.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(token_col: Column) -> Column:
    """X1 SimHash: 64-bit fingerprint — per bit, majority vote of token
    hashes' bits. Near-dups differ in few bits (small Hamming
    distance). Pure expression; returns bigint.

    The shift amount must be a Python int (``F.shiftright`` rejects a
    Column), so the 64 bit positions are unrolled host-side; Catalyst's
    common-subexpression elimination shares the token-hash array."""
    hashes = F.transform(token_col, lambda t: F.xxhash64(t))

    def bit_signs(h: Column) -> Column:
        # ±1 per bit, MSB first; shift amounts unrolled host-side since
        # F.shiftright requires a Python int.
        return F.array(
            *[
                F.when(
                    F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
                for b in range(63, -1, -1)
            ]
        )

    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(acc, bit_signs(h), lambda a, v: a + v),
    )
    # Assemble with shiftleft/bitwiseOR, not acc*2+bit: setting bit 63
    # of a signed bigint overflows multiplication under ANSI mode (the
    # driver's session may run with spark.sql.ansi.enabled=true).
    return F.aggregate(
        votes,
        F.lit(0).cast("bigint"),
        lambda acc, vote: F.shiftleft(acc, 1).bitwiseOR(
            F.when(vote >= 0, 1).otherwise(0).cast("bigint")
        ),
    )


def simhash_band_pairs(df: DataFrame, id_col: str, sim_col: str, max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup candidates: equal 16-bit quarter-bands (any
    pair within Hamming distance 3 shares at least one of 4 bands —
    pigeonhole), verified by popcount of XOR."""
    quarters = F.array(
        *[
            F.struct(
                F.lit(q).alias("band"),
                F.shiftright(F.col(sim_col), q * 16).bitwiseAND(F.lit(0xFFFF)).alias("band_val"),
            )
            for q in range(4)
        ]
    )
    banded = df.select(
        F.col(id_col).alias("id"), F.col(sim_col).alias("sim"), F.explode(quarters).alias("q")
    ).select("id", "sim", "q.band", "q.band_val")
    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
