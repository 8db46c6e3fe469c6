"""Round-15 item 1 (VERDICT r14 #1): re-verify or revert the two
driver-regressed r14 optimizations.

- unigram: tf-first (current, e91732e) vs the old per-token shape.
- prefix: the r14 small-corpus regime gate (collect + repartition +
  broadcast hints, current) vs the gate dropped (keep only the
  lossless PPJoin length filter).

Interleaved same-process A/B: N rep-pairs, alternating order within
each pair, gc between runs, noop sink, labelled jobs. Outputs checked
byte-identical (sorted collect) once per experiment.

Usage: python plans/r15/ab_item1.py [--reps N] [unigram] [prefix]
"""

from __future__ import annotations

import gc
import os
import statistics
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO_ROOT = os.path.dirname(os.path.dirname(_HERE))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def old_unigram_logprob(docs: DataFrame, id_col="doc_id", text_col="text"):
    """The pre-e91732e shape (verbatim from git e91732e^)."""
    from gas_data_pipeline_spark.operators.text import is_word, tokenize

    toks = docs.select(
        F.col(id_col),
        F.explode(F.filter(tokenize(F.col(text_col)), is_word)).alias("term"),
    )
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n"))
    lp = F.log(F.col("cnt") / F.col("n"))
    scored = toks.join(F.broadcast(vocab), "term").crossJoin(F.broadcast(total))
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.round(F.avg(lp), 6).alias("avg_logprob"),
        F.round(F.exp(-F.avg(lp)), 6).alias("ppl_proxy"),
    )


def prefix_nogate(df: DataFrame, id_col, shingle_col, threshold: float):
    """jaccard_pairs_prefix_filter with the r14 regime gate REMOVED
    (no corpus collect, no candidate repartition, no broadcast hints);
    the lossless length filter stays."""
    sized = (
        df.select(
            F.col(id_col).alias("id"),
            F.transform(shingle_col, lambda s: F.xxhash64(s)).alias("shingles"),
        )
        .select("id", "shingles", F.size("shingles").alias("n_shingles"))
        .localCheckpoint(eager=True)
    )
    ex = sized.select("id", "n_shingles", F.explode("shingles").alias("shingle"))
    df_counts = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    prefix_len = (
        F.col("n_shingles")
        - F.ceil(F.col("n_shingles") * F.lit(threshold))
        + F.lit(1)
    ).cast("int")
    ranked = (
        ex.join(df_counts, "shingle")
        .groupBy("id", "n_shingles")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("df"), F.col("shingle")))
            ).alias("ordered")
        )
        .select(
            "id",
            "n_shingles",
            F.slice(F.col("ordered.shingle"), 1, prefix_len).alias("prefix"),
        )
    )
    inv = ranked.select("id", "n_shingles", F.explode("prefix").alias("shingle"))
    postings = (
        inv.groupBy("shingle")
        .agg(F.collect_list(F.struct("id", "n_shingles")).alias("docs"))
        .filter(F.size("docs") > 1)
    )
    cand = (
        postings.select(F.explode("docs").alias("a"), "docs")
        .select("a", F.explode("docs").alias("b"))
        .filter(F.col("a.id") < F.col("b.id"))
        .filter(
            F.least("a.n_shingles", "b.n_shingles")
            / F.greatest("a.n_shingles", "b.n_shingles")
            >= F.lit(threshold)
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sa = sized.select(
        F.col("id").alias("id_a"),
        F.col("shingles").alias("sh_a"),
        F.col("n_shingles").alias("na"),
    )
    sb = sized.select(
        F.col("id").alias("id_b"),
        F.col("shingles").alias("sh_b"),
        F.col("n_shingles").alias("nb"),
    )
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
    )
    jac = (
        F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    ).alias("jaccard")
    return verified.select("id_a", "id_b", jac).filter(
        F.col("jaccard") >= threshold
    )


def main() -> None:
    args = sys.argv[1:]
    reps = 6
    which = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            which.append(args[i])
            i += 1
    which = which or ["unigram", "prefix"]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from gas_data_pipeline_spark.catalog import spread_scan, table
    from gas_data_pipeline_spark.operators.dedup import (
        jaccard_pairs_prefix_filter,
        word_shingles,
    )
    from gas_data_pipeline_spark.operators.text import unigram_logprob
    from gas_data_pipeline_spark.session import get_spark
    from gas_data_pipeline_spark.suite.northstar import _docs_with_planted

    spark = get_spark(app_name="r15-ab-item1")
    spark.sparkContext.setLogLevel("ERROR")

    docs_plain = spread_scan(
        table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    docs_planted = _docs_with_planted(spark, sf_dir)

    experiments = {
        "unigram": (
            lambda: unigram_logprob(docs_plain, "doc_id", "text"),
            lambda: old_unigram_logprob(docs_plain, "doc_id", "text"),
            ("tf_first", "per_token"),
        ),
        "prefix": (
            lambda: jaccard_pairs_prefix_filter(
                docs_planted, "doc_id", word_shingles(F.col("text"), n=3), 0.5
            ),
            lambda: prefix_nogate(
                docs_planted, "doc_id", word_shingles(F.col("text"), n=3), 0.5
            ),
            ("gated", "nogate"),
        ),
    }

    for name in which:
        fa, fb, (la, lb) = experiments[name]
        # Value identity first (sorted rows, exact).
        ra = sorted(map(tuple, fa().collect()))
        rb = sorted(map(tuple, fb().collect()))
        assert ra == rb, f"{name}: outputs differ ({len(ra)} vs {len(rb)} rows)"
        print(f"{name}: outputs identical ({len(ra)} rows)", flush=True)
        times: dict[str, list[float]] = {la: [], lb: []}
        for r in range(reps):
            order = [(la, fa), (lb, fb)] if r % 2 == 0 else [(lb, fb), (la, fa)]
            for label, fn in order:
                gc.collect()
                spark.sparkContext.setJobDescription(f"ab:{name}:{label}:{r}")
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                times[label].append(round(time.perf_counter() - t0, 4))
                spark.sparkContext.setJobDescription(None)
        for label, ts in times.items():
            print(
                f"{name}/{label}: median={statistics.median(ts):.3f} "
                f"runs={ts}",
                flush=True,
            )


if __name__ == "__main__":
    main()
