"""Portable, engine-deterministic sketches.

Spark's own ``approx_count_distinct`` (HyperLogLog++) is the right
default at 100 TB, but its register layout is engine-private: no other
system can reproduce its estimate, so a cross-engine pipeline (Spark
writing, Trino/DuckDB auditing — the reference's Postgres-side checks,
app/db/queries.py) can never verify the number, only re-derive its own.

This module implements classic HyperLogLog (Flajolet et al. 2007) from
PORTABLE primitives only — ``md5``, hex substring -> integer, ``bin``/
``ltrim`` bit-length, ``pow``/``ln`` — every one available and
identically defined in Spark, DuckDB, Trino, and Postgres. The same
twelve lines of SQL produce the same estimate everywhere, to the last
rounded decimal, which is what makes ``approx_distinct_portable_hll``
an EXACT-oracle query instead of a rows-only one.

Scale shape: identical to the native sketch — one map-side-combinable
``max`` per (group, register) then a tiny per-group fold over <= m
register rows; the grouped cardinality never shuffles raw ids. m=4096
registers gives ~1.6% standard error (1.04/sqrt(m)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_M = 4096  # registers (2^12): ~1.6% rsd, 3 hex chars of register index
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
HLL_SEED = "hll-v1:"


def hll_registers(
    df: DataFrame, group_cols: list[str], id_col: str
) -> DataFrame:
    """The MERGEABLE half of the sketch: per (group, register) max rank
    — the persistable summary table. <= m rows per group regardless of
    id cardinality; two summaries over disjoint row sets merge by
    ``max`` per register (associative/commutative/idempotent), which is
    what makes :func:`hll_merge_registers` rollups exact-identical to
    a direct computation at the coarser grain.

    The hash is md5 of a seeded decimal rendering of the id: hex chars
    1-3 pick one of 4096 registers, chars 4-16 are a 52-bit tail whose
    leading-zero count (+1) is the register's rank observation —
    ``53 - bit_length(tail)``, with ``bin``/``ltrim`` making
    ``bit_length`` exact integer/string logic (no float log2 edge
    cases; an all-zero tail lands on the rank-53 sentinel naturally,
    since ``ltrim('0', bin(0))`` is empty in both engines).
    """
    h = F.md5(F.concat(F.lit(HLL_SEED), F.col(id_col).cast("string")))
    reg = F.conv(F.substring(h, 1, 3), 16, 10).cast("int").alias("__reg")
    w = F.conv(F.substring(h, 4, 13), 16, 10).cast("bigint").alias("__w")
    base = df.filter(F.col(id_col).isNotNull()).select(
        *[F.col(c) for c in group_cols], reg, w
    )
    rank = (F.lit(53) - F.length(F.expr("ltrim('0', bin(__w))"))).alias(
        "__rank"
    )
    return (
        base.select(*group_cols, "__reg", rank)
        .groupBy(*group_cols, "__reg")
        .agg(F.max("__rank").alias("__mj"))
    )


def hll_merge_registers(
    regs: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Merge register summaries to a coarser grouping (e.g. daily ->
    monthly): max rank per (coarse group, register). Because max is
    associative, the merged summary is BIT-IDENTICAL to the one a
    direct pass over the raw rows at the coarse grain would build — a
    rollup refresh therefore reads only the stored summaries (<= m
    rows per fine group), never the fact table."""
    return regs.groupBy(*group_cols, "__reg").agg(
        F.max("__mj").alias("__mj")
    )


def hll_estimate(
    regs: DataFrame, group_cols: list[str], out_col: str = "approx_distinct"
) -> DataFrame:
    """Fold a register summary into the HLL estimate per group.

    Applies the standard small-range linear-counting correction
    (E <= 2.5m with empty registers -> m*ln(m/V)); the 32-bit
    large-range correction is unnecessary at a 52-bit hash width.
    Output is rounded to 4 decimals: the only cross-engine
    nondeterminism left is summation order over <= 4096 doubles
    (~1e-9 absolute), far inside the rounding."""
    m = float(HLL_M)
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n_regs"),
        F.sum(F.pow(F.lit(2.0), -F.col("__mj"))).alias("__sum_inv"),
    )
    v: Column = F.lit(HLL_M) - F.col("__n_regs")
    e_raw: Column = F.lit(HLL_ALPHA * m * m) / (F.col("__sum_inv") + v)
    e = F.when(
        (e_raw <= 2.5 * m) & (v > 0), F.lit(m) * F.log(F.lit(m) / v)
    ).otherwise(e_raw)
    return agg.select(*group_cols, F.round(e, 4).alias(out_col))


def hll_distinct(
    df: DataFrame, group_col: str, id_col: str, out_col: str = "approx_distinct"
) -> DataFrame:
    """Per-``group_col`` HyperLogLog distinct-count of ``id_col`` —
    :func:`hll_registers` composed with :func:`hll_estimate`; see
    those for the hash layout and correction notes."""
    return hll_estimate(
        hll_registers(df, [group_col], id_col), [group_col], out_col
    )


def hll_oracle_sql(
    table_name: str, group_col: str, id_col: str, out_col: str = "approx_distinct"
) -> str:
    """The SAME sketch as :func:`hll_distinct`, in the ANSI dialect
    DuckDB (or Trino/Postgres, modulo hex-cast spelling) runs — the
    exactness claim is that this and the Spark plan agree to the
    rounded decimal."""
    m, alpha, seed = HLL_M, HLL_ALPHA, HLL_SEED
    return f"""
        WITH h AS (
          SELECT {group_col},
                 CAST(concat('0x', substring(md5('{seed}' || CAST({id_col} AS VARCHAR)), 1, 3)) AS INTEGER) AS reg,
                 CAST(concat('0x', substring(md5('{seed}' || CAST({id_col} AS VARCHAR)), 4, 13)) AS BIGINT) AS w
          FROM {table_name} WHERE {id_col} IS NOT NULL
        ), r AS (
          SELECT {group_col}, reg, max(53 - length(ltrim(bin(w), '0'))) AS mj
          FROM h GROUP BY {group_col}, reg
        ), a AS (
          SELECT {group_col}, count(*) AS n_regs,
                 sum(pow(2.0, -mj)) AS sum_inv
          FROM r GROUP BY {group_col}
        ), e AS (
          SELECT {group_col}, {m} - n_regs AS v,
                 CAST({alpha!r} AS DOUBLE) * {m} * {m} / (sum_inv + ({m} - n_regs)) AS e_raw
          FROM a
        )
        SELECT {group_col},
               round(CASE WHEN e_raw <= 2.5 * {m} AND v > 0
                          THEN CAST({m} AS DOUBLE) * ln(CAST({m} AS DOUBLE) / v)
                          ELSE e_raw END, 4) AS {out_col}
        FROM e
    """


def heavy_hitters_exact(
    df: DataFrame,
    key_col: str,
    threshold: float,
    count_col: str = "cnt",
) -> DataFrame:
    """EXACT theta-heavy-hitters (keys with frequency >= threshold *
    |df|) with sketch-bounded shuffle — the same "summary for cost,
    exact for answer" contract as ``bloom_prefilter_dedup``.

    The naive plan shuffles every distinct key's partial count. Here
    candidate generation never shuffles: each partition folds its rows
    into a Misra-Gries summary of k = ceil(1/threshold) counters
    (pandas value_counts per Arrow batch, summaries merged batch-wise
    with the standard subtract-the-(k+1)th-largest step — mergeable-
    summaries regime, undercount < n_p/(k+1) < threshold * n_p). Any
    globally theta-heavy key is theta-heavy in >= 1 partition (else
    sum count_p < threshold * sum n_p — averaging argument), and a
    partition-theta-heavy key always survives its partition's MG
    summary, so the union of per-partition summaries is a SUPERSET of
    the true answer: <= partitions * ceil(1/threshold) keys, constant
    per partition regardless of key cardinality.

    The confirm pass then counts ONLY candidate rows (broadcast
    semi-join; map-side partials make the shuffle partitions x
    candidates) and applies the exact HAVING bar, so false candidates
    from partition skew drop out and the result is identical to the
    full GROUP BY ... HAVING — which is what the DuckDB oracle runs.
    Partition totals ride the same summary pass (no separate count
    job); the summary is checkpointed so the two consumers don't
    re-scan ``df``.

    Two exactness details the naive formulation gets for free and this
    one must handle explicitly:

    - **Null keys**: the MG summary counts nulls (``value_counts(
      dropna=False)``) and the confirm semi-join uses null-safe
      equality (``<=>``), so a genuinely heavy null-key group survives
      to the final GROUP BY (where null is an ordinary group) exactly
      as it does in the oracle's SQL.
    - **The HAVING bar**: ``threshold`` is interpreted as the DECIMAL
      its string rendering denotes (what a SQL literal like ``0.05``
      means to the oracle), not as the nearest binary double — the bar
      is computed exactly on the driver as ``ceil(threshold * total)``
      over ``Fraction``s and compared as a bigint, so a key sitting
      exactly on the boundary agrees with the oracle's exact decimal
      arithmetic.

    Returns (key_col, count_col) for the exact heavy keys.
    """
    import math
    from fractions import Fraction

    import pandas as pd

    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    theta = Fraction(str(threshold))
    k = math.ceil(1 / theta)
    key_field = df.schema[key_col]
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    summary_schema = StructType(
        [
            StructField("kind", StringType()),
            StructField("key", key_field.dataType),
            StructField("part_rows", LongType()),
        ]
    )

    def summarize(batches):
        acc = None
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            vc = pdf[key_col].value_counts(dropna=False)
            acc = vc if acc is None else acc.add(vc, fill_value=0)
            if len(acc) > k:
                off = acc.nlargest(k + 1).iloc[-1]
                acc = acc[acc > off] - off
        out = {"kind": ["total"], "key": [None], "part_rows": [n]}
        if acc is not None:
            for key in acc.index:
                out["kind"].append("cand")
                out["key"].append(key)
                out["part_rows"].append(0)
        yield pd.DataFrame(out)

    summary = (
        df.select(F.col(key_col).alias(key_col))
        .mapInPandas(summarize, schema=summary_schema)
        .localCheckpoint(eager=True)
    )
    total = summary.filter(F.col("kind") == "total").agg(
        F.sum("part_rows")
    ).collect()[0][0]
    cand = (
        summary.filter(F.col("kind") == "cand")
        .select(F.col("key").alias("__cand_key"))
        .distinct()
    )
    # cnt is an integer, so cnt >= theta*total  <=>  cnt >= ceil(theta*total);
    # the ceil is exact rational arithmetic, immune to double rounding.
    bar = int(math.ceil(theta * (total or 0)))
    # Null-safe equality so a null-key candidate is confirmed rather
    # than silently dropped by null-never-equals-null join semantics.
    return (
        df.join(
            F.broadcast(cand),
            F.col(key_col).eqNullSafe(F.col("__cand_key")),
            "left_semi",
        )
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias(count_col))
        .filter(F.col(count_col) >= F.lit(bar))
    )


KMV_K = 256  # k-minimum-values summary size: rse ~ 1/sqrt(k-2) ~ 6.3%
KMV_SEED = "kmv-v1:"


def kmv_summary(
    df: DataFrame, group_col: str, id_col: str, k: int = KMV_K
) -> DataFrame:
    """K-minimum-values (theta) sketch per group: the k lexically
    smallest md5 hashes of the DISTINCT ids — (group, hashes
    array<string>), <= k rows' worth of state per group.

    Where HLL only estimates cardinalities, KMV summaries support SET
    OPERATIONS: the k smallest of a union is computable from the two
    summaries alone, so pairwise overlap (Jaccard, intersection size)
    between 100 TB segments reduces to merging two k-element arrays.
    md5 hex is fixed-width, so lexical order == numeric order on the
    128-bit value, and both engines sort it identically — which makes
    every downstream estimate exactly reproducible in the oracle.

    Scale shape: one distinct on (group, id), then a window top-k per
    group (k constant) and a tiny collect_list — summaries are
    |groups| x k strings, broadcastable for any pairwise composition.
    """
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit(KMV_SEED), F.col("__id").cast("string")))
    du = (
        df.filter(F.col(id_col).isNotNull())
        .select(F.col(group_col).alias("seg"), F.col(id_col).alias("__id"))
        .distinct()
        .select("seg", h.alias("__h"))
    )
    w = Window.partitionBy("seg").orderBy("__h")
    return (
        du.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy("seg")
        .agg(F.sort_array(F.collect_list("__h")).alias("hashes"))
    )


def _kmv_norm(h: Column) -> Column:
    """Hash -> uniform [0,1): first 13 hex chars are 52 bits, exact in
    a double — the same portable rendering as curation.uniform_draw."""
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("double") / F.lit(
        float(1 << 52)
    )


def kmv_overlap_pairs(summaries: DataFrame, k: int = KMV_K) -> DataFrame:
    """Pairwise segment overlap from KMV summaries alone (theta-sketch
    set operations): for each segment pair, the k smallest of the
    merged hash arrays is a KMV summary OF THE UNION; the fraction of
    it landing in both inputs estimates Jaccard, and (k-1)/t_k (t_k =
    k-th smallest, normalized) estimates the union size, giving the
    intersection estimate jaccard * union. When the merged array has
    fewer than k hashes the union was seen in full and every figure is
    EXACT, not an estimate (the small-segment regime).

    Everything is integer/array math plus one IEEE division, so the
    DuckDB oracle reproduces each output bit-for-bit before rounding.
    Pairs are |segments|^2 rows of k-element arrays — driver-tiny for
    any realistic segment count, never touching the fact table again.
    """
    a = summaries.select(
        F.col("seg").alias("seg_a"), F.col("hashes").alias("ha")
    )
    b = summaries.select(
        F.col("seg").alias("seg_b"), F.col("hashes").alias("hb")
    )
    pairs = a.join(b, F.col("seg_a") < F.col("seg_b"))
    merged = F.array_sort(F.array_union(F.col("ha"), F.col("hb")))
    kmin = F.least(F.lit(k), F.size(merged))
    u = F.slice(merged, 1, kmin)
    common = F.array_intersect(F.col("ha"), F.col("hb"))
    jac = F.size(F.array_intersect(u, common)) / kmin.cast("double")
    t_k = _kmv_norm(F.element_at(u, kmin))
    union_est = F.when(
        F.size(merged) < k, F.size(merged).cast("double")
    ).otherwise(F.lit(float(k - 1)) / t_k)
    # Jaccard is a multiple of 1/kmin; at k=256 eight decimals render
    # it exactly (m * 390625 / 1e8), so the round introduces no
    # cross-engine tie at all.
    return pairs.select(
        "seg_a",
        "seg_b",
        F.round(jac, 8).alias("jaccard_est"),
        F.round(union_est, 4).alias("union_est"),
        F.round(jac * union_est, 4).alias("intersection_est"),
    )
