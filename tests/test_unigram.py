"""Unigram-LM tokenizer training (round 7): EM invariants, DP
correctness properties, degenerate-input guards, and the zero-shuffle
E-step plan shape. Value parity of both registered queries vs the
recursive-CTE DuckDB oracle lives in tests/test_parity.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def corpus_words(spark):
    from gas_data_pipeline_spark.catalog import table
    from gas_data_pipeline_spark.operators.text import is_word, tokenize

    docs = table(spark, SF_DIR, "documents").select("text")
    return (
        docs.select(
            F.explode(F.filter(tokenize(F.col("text")), is_word)).alias("word")
        )
        .filter(F.length("word").between(2, 12))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint(eager=True)
    )


def test_segmentations_concatenate_back_to_words(spark, corpus_words):
    """The DP is only a tokenizer if every segmentation is a partition
    of its word: concat(pieces) == word for EVERY word, both rounds."""
    from gas_data_pipeline_spark.operators.unigram_lm import unigram_train

    _, seg = unigram_train(corpus_words, em_rounds=2)
    bad = seg.filter(
        F.array_join("pieces", "") != F.col("word")
    ).count()
    assert bad == 0
    assert seg.count() == corpus_words.count()


def test_viterbi_em_objective_nondecreasing(spark, corpus_words):
    """Hard-EM guarantee: re-estimating piece probabilities from the
    chosen segmentations cannot lower the corpus Viterbi log-prob
    (every word keeps its previous segmentation available, and the
    M-step maximizes exactly the objective the E-step scored)."""
    from gas_data_pipeline_spark.operators.unigram_lm import (
        lp_fixed_point,
        piece_counts,
        seed_vocabulary,
        unigram_seed_counts,
        viterbi_segment,
    )

    vocab = seed_vocabulary(unigram_seed_counts(corpus_words))

    def corpus_lp(segmented):
        return segmented.agg(
            F.sum(F.col("freq") * F.col("lp_fp"))
        ).collect()[0][0]

    seg1 = viterbi_segment(corpus_words, lp_fixed_point(vocab))
    vocab1 = sorted(
        (r["piece"], int(r["cnt"])) for r in piece_counts(seg1).collect()
    )
    seg2 = viterbi_segment(corpus_words, lp_fixed_point(vocab1))
    # round 2's segmentation scored under round 2's model vs round 1's
    # segmentation scored under the SAME model: Viterbi optimality.
    seg1_under_m1 = viterbi_segment(corpus_words, lp_fixed_point(vocab1))
    assert corpus_lp(seg2) >= corpus_lp(seg1_under_m1)
    # and the EM objective across rounds does not decrease.
    assert corpus_lp(seg2) >= corpus_lp(seg1)


def test_viterbi_beats_char_segmentation(spark, corpus_words):
    """The DP finds the OPTIMAL segmentation: under any model that
    contains all single chars, every word's Viterbi score is >= its
    all-chars fallback score."""
    from gas_data_pipeline_spark.operators.unigram_lm import (
        lp_fixed_point,
        seed_vocabulary,
        unigram_seed_counts,
        viterbi_segment,
    )

    vocab = seed_vocabulary(unigram_seed_counts(corpus_words))
    lps = lp_fixed_point(vocab)
    seg = viterbi_segment(corpus_words, lps)
    char_lp = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.col("word").substr(i, F.lit(1)),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, c: acc
        + F.element_at(
            F.create_map(
                *[
                    x
                    for p, lp in sorted(lps.items())
                    if len(p) == 1
                    for x in (F.lit(p), F.lit(lp).cast("bigint"))
                ]
            ),
            c,
        ),
    )
    worse = seg.filter(F.col("lp_fp") < char_lp).count()
    assert worse == 0


def test_empty_and_single_char_words_guarded(spark):
    """sequence(1, 0) is descending in Spark — the empty word must not
    run phantom DP steps (the BPE empty-word bug class, ADVICE r6)."""
    from gas_data_pipeline_spark.operators.unigram_lm import (
        viterbi_segment,
    )

    words = spark.createDataFrame(
        [("", 5), ("a", 3), ("ab", 2)], "word string, freq long"
    )
    lps = {"a": -100, "b": -200, "ab": -250}
    rows = {r["word"]: r for r in viterbi_segment(words, lps).collect()}
    assert rows[""]["pieces"] == [] and rows[""]["lp_fp"] == 0
    assert rows["a"]["pieces"] == ["a"] and rows["a"]["lp_fp"] == -100
    # -250 ("ab") beats -300 ("a"+"b")
    assert rows["ab"]["pieces"] == ["ab"] and rows["ab"]["lp_fp"] == -250


def test_packed_backpointer_capacity_guard(spark):
    """Backpointers pack 3 bits per position into one BIGINT
    (constant-size accumulator, VERDICT r9 #4): a 21-char word is the
    last that fits; a 22-char word must RAISE, never mis-segment."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from gas_data_pipeline_spark.operators.unigram_lm import (
        viterbi_segment,
    )

    lps = {c: -100 for c in "ab"}
    ok = spark.createDataFrame([("ab" * 10 + "a", 1)], "word string, freq long")
    row = viterbi_segment(ok, lps).collect()[0]
    assert row["pieces"] == list("ab" * 10 + "a")
    too_long = spark.createDataFrame([("ab" * 11, 1)], "word string, freq long")
    with pytest.raises(SparkRuntimeException, match="capacity"):
        viterbi_segment(too_long, lps).collect()


def test_viterbi_tiebreak_prefers_longer_piece(spark):
    """On equal cost the LONGER piece wins — the one rule both the
    engine's array_max and the oracle's ORDER BY replay."""
    from gas_data_pipeline_spark.operators.unigram_lm import (
        viterbi_segment,
    )

    words = spark.createDataFrame([("ab", 1)], "word string, freq long")
    lps = {"a": -100, "b": -100, "ab": -200}  # tie: a+b == ab
    row = viterbi_segment(words, lps).collect()[0]
    assert row["pieces"] == ["ab"]


def test_estep_is_zero_shuffle(spark, corpus_words):
    """The model is a map literal riding the task closure: the E-step
    scan has no Exchange and no Join."""
    from gas_data_pipeline_spark.operators.unigram_lm import (
        lp_fixed_point,
        seed_vocabulary,
        unigram_seed_counts,
        viterbi_segment,
    )

    vocab = seed_vocabulary(unigram_seed_counts(corpus_words))
    seg = viterbi_segment(corpus_words, lp_fixed_point(vocab))
    plan = _plan_of(seg)
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_lp_quantization_matches_duckdb_round():
    """The fixed-point quantizer must reproduce DuckDB's
    round-half-away-from-zero on ln-derived values: sweep (cnt, total)
    pairs and compare Python's helper against a DuckDB ln/round probe
    (ADVICE r7 — Python's built-in round is half-to-even)."""
    import duckdb

    from gas_data_pipeline_spark.operators.unigram_lm import (
        _round_half_away,
        lp_fixed_point,
    )

    # Exact-boundary sanity: away-from-zero on both signs.
    assert _round_half_away(2.5) == 3
    assert _round_half_away(-2.5) == -3
    assert _round_half_away(0.5) == 1
    assert _round_half_away(-0.5) == -1

    con = duckdb.connect()
    cases = [(c, t) for t in (7, 97, 1234, 99991) for c in range(1, 60)]
    vocab = [(f"p{c}_{t}", c) for c, t in cases]
    for (c, t), (piece, _) in zip(cases, vocab):
        got = _round_half_away(__import__("math").log(c / t) * 1e9)
        want = con.sql(
            f"SELECT CAST(round(ln({c} / {t}.0) * 1e9) AS BIGINT) AS v"
        ).fetchone()[0]
        assert got == want, (c, t, got, want)
