"""BPE merge training: greedy-left semantics, classical-example merge
rules, determinism, and plan hygiene."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from gas_data_pipeline_spark.operators.bpe import (
    _char_split,
    _merge_pair,
    bpe_train_merges,
)


def test_greedy_left_nonoverlapping_merge(spark):
    df = spark.createDataFrame(
        [("aaaa",), ("aaa",), ("baab",), ("ab",), ("a",)], "word string"
    )
    out = [
        r["m"]
        for r in df.select(
            _merge_pair(_char_split(F.col("word")), "a", "a").alias("m")
        ).collect()
    ]
    # Runs of overlapping matches fire every OTHER position.
    assert out == [["aa", "aa"], ["aa", "a"], ["b", "aa", "b"], ["a", "b"], ["a"]]


def test_sennrich_example_learns_est(spark):
    # The canonical BPE illustration: es -> est dominate.
    words = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
        "word string, freq long",
    )
    rules = bpe_train_merges(words, rounds=2).collect()
    assert [(r["round"], r["merged"], r["pair_count"]) for r in rules] == [
        (1, "es", 9),
        (2, "est", 9),
    ]


def test_merged_symbol_participates_in_later_rounds(spark):
    # After round 1 merges 'ab', round 2 must see ('ab','c') pairs.
    words = spark.createDataFrame([("abc", 10), ("abd", 4)], "word string, freq long")
    rules = bpe_train_merges(words, rounds=2).collect()
    assert rules[0]["merged"] == "ab" and rules[0]["pair_count"] == 14
    assert rules[1]["left"] == "ab" and rules[1]["merged"] == "abc"
    assert rules[1]["pair_count"] == 10


def test_tie_breaks_lexicographically(spark):
    words = spark.createDataFrame([("zy", 3), ("ab", 3)], "word string, freq long")
    rules = bpe_train_merges(words, rounds=1).collect()
    assert rules[0]["merged"] == "ab"  # same count, 'a' < 'z'


def test_exhausted_words_stop_early(spark):
    words = spark.createDataFrame([("ab", 1)], "word string, freq long")
    rules = bpe_train_merges(words, rounds=5).collect()
    # Round 1 merges the only pair; the word is then a single symbol,
    # so round 2 finds no pairs and the loop stops early.
    assert [r["merged"] for r in rules] == ["ab"]


def test_empty_word_contributes_nothing(spark):
    # sequence(1, 0) is DESCENDING in Spark — an unguarded char split
    # would turn "" into ["", ""] and a phantom ("","") pair carrying
    # the word's full frequency, beating every real pair.
    words = spark.createDataFrame(
        [("", 1000), ("ab", 3)], "word string, freq long"
    )
    split = words.select(_char_split(F.col("word")).alias("s")).collect()
    assert sorted(r["s"] for r in split) == [[], ["a", "b"]]
    rules = bpe_train_merges(words, rounds=1).collect()
    assert [(r["merged"], r["pair_count"]) for r in rules] == [("ab", 3)]


def test_rejects_bad_rounds(spark):
    words = spark.createDataFrame([("ab", 1)], "word string, freq long")
    with pytest.raises(ValueError):
        bpe_train_merges(words, rounds=0)


def test_pair_count_plan_has_mapside_partials(spark):
    words = spark.createDataFrame(
        [(f"w{i % 7}x", i + 1) for i in range(100)], "word string, freq long"
    )
    state = words.select(
        F.col("freq"), _char_split(F.col("word")).alias("syms")
    )
    pairs = (
        state.filter(F.size("syms") >= 2)
        .select(
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("syms"), i).alias("l"),
                        F.element_at(F.col("syms"), i + 1).alias("r"),
                    ),
                )
            ).alias("p"),
        )
        .groupBy("p.l", "p.r")
        .agg(F.sum("freq").alias("cnt"))
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan
