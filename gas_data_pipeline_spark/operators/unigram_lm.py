"""Distributed unigram-LM tokenizer training (SentencePiece's unigram
model, Kudo 2018 "Subword Regularization") — the EM counterpart of
``operators/bpe.py``: where BPE greedily merges, the unigram model
starts from an over-complete substring vocabulary and re-estimates
piece probabilities by Viterbi-EM, so the final vocabulary is the one
the corpus itself scores highest.

Same scale trick as BPE: train on the DISTINCT-WORD frequency table
(segmentations never cross word boundaries, so piece statistics over
the word table weighted by frequency equal corpus statistics), which
keeps every stage vocab-sized while the corpus is 100 TB.

Per EM round the engine does exactly two bounded things:

- **E-step (Viterbi segmentation)**: each word's best segmentation
  under the current model — a PER-ROW dynamic program expressed as a
  higher-order-function fold over character positions (JVM codegen,
  zero shuffle, no Python): the model is a ~vocab-sized map literal
  riding the task closure, so the scan never joins or shuffles.
- **M-step**: explode the chosen pieces weighted by word frequency,
  one map-side-combinable sum to piece-count rows, then a bounded
  collect of the piece table (a model, not data) to rebuild the map.

Exactness devices (the oracle replays the identical DP in SQL):

- Piece log-probs are quantized to BIGINT fixed point (x 1e9) ONCE
  per piece in the model table, so every Viterbi cost is an integer
  sum — exact, association-order-free, and tie-behavior identical in
  both engines. The quantizing ``ln`` runs in the DRIVER's Python
  (libm), the same library DuckDB's ``ln`` binds, so even the 1-ulp
  fringe agrees.
- Argmax tie-break is (cost, piece_len) lexicographic max: on equal
  cost the LONGER piece wins — one rule, both engines.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gas_data_pipeline_spark.functions.exprs import bind


def unigram_seed_counts(
    words: DataFrame, *, max_piece: int = 4
) -> DataFrame:
    """Seed statistics: every substring of length 1..max_piece of
    every distinct word, weighted by word frequency — the tractable
    stand-in for SentencePiece's suffix-array seed. One bounded row
    expansion (<= len x max_piece rows per word) over the vocab-sized
    word table, then a map-side-combinable sum."""
    pieces = words.select(
        "freq",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda pos: F.filter(
                        F.transform(
                            F.sequence(F.lit(1), F.lit(max_piece)),
                            lambda ln: F.when(
                                pos + ln - 1 <= F.length("word"),
                                F.col("word").substr(pos, ln),
                            ),
                        ),
                        lambda p: p.isNotNull(),
                    ),
                )
            )
        ).alias("piece"),
    )
    return pieces.groupBy("piece").agg(F.sum("freq").alias("cnt"))


def seed_vocabulary(
    seed_counts: DataFrame, *, n_multi: int = 96
) -> list[tuple[str, int]]:
    """Bounded seed vocabulary: ALL single characters (so every word
    stays segmentable) plus the top ``n_multi`` multi-character
    substrings by (count desc, piece asc). The two top-k pulls are
    bounded summaries — a model, not data."""
    chars = (
        seed_counts.filter(F.length("piece") == 1)
        .orderBy("piece")
        .collect()
    )
    multis = (
        seed_counts.filter(F.length("piece") >= 2)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(n_multi)
        .collect()
    )
    return [(r["piece"], int(r["cnt"])) for r in chars + multis]


def _round_half_away(x: float) -> int:
    """Round-half-away-from-zero — DuckDB's ``round()`` mode. Python's
    built-in ``round`` is round-half-to-even, so a value landing
    exactly on a .5 boundary would quantize differently in the two
    engines and cascade through Viterbi tie-breaks. ln outputs are
    irrational so the boundary never arises in practice, but the
    helper removes the mode mismatch outright (pinned against a
    DuckDB probe in tests/test_unigram.py)."""
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def lp_fixed_point(vocab: list[tuple[str, int]]) -> dict[str, int]:
    """Quantized log-probabilities ``round(ln(cnt/total) * 1e9)`` for
    a (piece, cnt) vocabulary. Computed with PYTHON's ``math.log``
    (glibc libm — the same binding DuckDB's ``ln`` resolves to), so
    the oracle's quantization is bit-identical, which a JVM-side
    ``F.log`` could miss by one ulp; rounding is explicitly
    half-away-from-zero to match DuckDB's ``round``."""
    total = sum(c for _, c in vocab)
    return {p: _round_half_away(math.log(c / total) * 1e9) for p, c in vocab}


def _lp_map(lps: dict[str, int]) -> Column:
    pairs: list[Column] = []
    for piece, lp in sorted(lps.items()):
        pairs.append(F.lit(piece))
        pairs.append(F.lit(lp).cast("bigint"))
    return F.create_map(*pairs)


def viterbi_segment(
    words: DataFrame, lps: dict[str, int], *, max_piece: int = 4
) -> DataFrame:
    """E-step: per-word Viterbi segmentation under the model — one
    ZERO-SHUFFLE scan. The DP fold carries a FIXED-SIZE window of the
    last ``max_piece`` best-prefix costs (fixed-point BIGINT, NULL =
    unreachable) plus the backpointers PACKED into one BIGINT
    (``bit_length(max_piece)`` bits per position, written once via
    ``shiftleft``), then a second fold backtraces the chosen pieces.
    The DP never looks back further than ``max_piece`` positions, so
    the cost accumulator needs only that window (the r7 version grew
    the cost array per position; the r9 version still concat-grew the
    backpointer LIST one int per position — an O(len²) whole-array
    copy term per word). Both accumulators are now constant-size:
    every fold step is O(max_piece) regardless of word length. The
    packing caps segmentable words at ``63 // bits`` positions (21 at
    the default max_piece=4) — far above the corpus word table's
    len <= 12 (~13 prefixed) — and a longer word raises via
    ``assert_true`` rather than silently mis-segmenting. Unreachable
    prefixes propagate as NULL (packed slot 0, never read back)
    and vanish at the next reachable boundary; the word itself is
    always segmentable because the vocabulary keeps every piece of
    its previous segmentation (round 1: every single character).

    Returns word, freq, pieces (the segmentation), n_pieces, and the
    word's total fixed-point log-prob ``lp_fp``."""
    word = F.col("word")
    n = F.length(word)
    model = _lp_map(lps)
    bits = max_piece.bit_length()
    capacity = 63 // bits
    mask = (1 << bits) - 1

    # win[w] (1-based) == best[i - max_piece + w] after step i: the
    # last element is best[i], earlier slots the prior positions,
    # NULL-padded below position 0.
    def dp_step(acc, i):
        cands = []
        for j in range(1, max_piece + 1):
            piece = word.substr(i - F.lit(j) + 1, F.lit(j))
            prev = F.element_at(acc["win"], max_piece - j + 1)  # best[i-j]
            lp = F.element_at(model, piece)
            cands.append(
                F.when(
                    (F.lit(j) <= i) & prev.isNotNull() & lp.isNotNull(),
                    F.struct(
                        (prev + lp).alias("cost"), F.lit(j).alias("j")
                    ),
                )
            )
        best = F.array_max(
            F.filter(F.array(*cands), lambda c: c.isNotNull())
        )
        return F.struct(
            F.concat(
                F.slice(acc["win"], 2, max_piece - 1), F.array(best["cost"])
            ).alias("win"),
            # slot i is written exactly once, so + is |; unreachable
            # positions pack 0, which the backtrace never reads.
            (
                acc["bps"]
                + F.call_function(
                    "shiftleft",
                    F.coalesce(best["j"], F.lit(0)).cast("bigint"),
                    (i - F.lit(1)) * F.lit(bits),
                )
            ).alias("bps"),
        )

    # assert_true is NULL on success: folding it into best[0] keeps the
    # capacity guard inside the one expression tree (a word too long
    # for the packed backpointers fails loudly, never mis-segments).
    guarded_zero = F.coalesce(
        F.assert_true(
            n <= F.lit(capacity),
            F.concat(
                F.lit(
                    f"viterbi_segment: word exceeds the {capacity}-char "
                    f"packed-backpointer capacity (max_piece={max_piece}): "
                ),
                word,
            ),
        ).cast("bigint"),
        F.lit(0).cast("bigint"),
    )
    dp_init = F.struct(
        F.array(
            *([F.lit(None).cast("bigint")] * (max_piece - 1)),
            guarded_zero,
        ).alias("win"),
        F.lit(0).cast("bigint").alias("bps"),
    )
    dp = F.aggregate(F.sequence(F.lit(1), n), dp_init, dp_step)

    def bt_step(acc, _):
        pos = acc["pos"]
        j = (
            F.call_function(
                "shiftrightunsigned",
                acc["bps"],
                ((pos - F.lit(1)) * F.lit(bits)).cast("int"),
            )
            .bitwiseAND(F.lit(mask))
            .cast("int")
        )  # bps for position pos
        piece = word.substr(pos - j + 1, j)
        return F.when(
            pos > 0,
            F.struct(
                (pos - j).alias("pos"),
                acc["bps"].alias("bps"),
                F.concat(F.array(piece), acc["pieces"]).alias("pieces"),
            ),
        ).otherwise(acc)

    def bt_init(d):
        return F.struct(
            n.alias("pos"),
            d["bps"].alias("bps"),
            F.array().cast("array<string>").alias("pieces"),
        )

    # the DP fold feeds both the backtrace and lp_fp — let-bind it so
    # the quadratic-ish per-row work runs once, not twice.
    out = bind(
        dp,
        lambda d: bind(
            F.aggregate(
                F.sequence(F.lit(1), n),
                bt_init(d),
                bt_step,
                lambda acc: acc["pieces"],
            ),
            lambda pieces: F.struct(
                pieces.alias("pieces"),
                F.size(pieces).cast("bigint").alias("n_pieces"),
                # the window's last slot is best[n] — the word's total.
                F.element_at(d["win"], max_piece).alias("lp_fp"),
            ),
        ),
    )
    # ``sequence(1, 0)`` is the DESCENDING [1, 0] in Spark — an empty
    # word would run phantom fold steps (the BPE empty-word bug class);
    # it has the empty segmentation with probability 1 by definition.
    empty = F.struct(
        F.array().cast("array<string>").alias("pieces"),
        F.lit(0).cast("bigint").alias("n_pieces"),
        F.lit(0).cast("bigint").alias("lp_fp"),
    )
    return words.select(
        "word", "freq", F.inline(F.array(F.when(n < 1, empty).otherwise(out)))
    )


def piece_counts(segmented: DataFrame) -> DataFrame:
    """M-step statistics: frequency-weighted piece counts from the
    chosen segmentations — one map-side-combinable sum to vocab-sized
    rows."""
    return (
        segmented.select(
            "freq", F.explode("pieces").alias("piece")
        )
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )


def unigram_train(
    words: DataFrame,
    *,
    em_rounds: int = 2,
    max_piece: int = 4,
    n_multi: int = 96,
) -> tuple[list[tuple[str, int]], DataFrame]:
    """Full training loop: seed vocabulary -> ``em_rounds`` of
    (Viterbi E-step, count M-step). Pieces whose expected count drops
    to zero leave the vocabulary (the hard-EM analogue of
    SentencePiece's pruning schedule); every surviving word keeps its
    previous segmentation available, so the corpus stays segmentable
    and the Viterbi objective is non-decreasing round over round
    (pinned in tests/test_unigram.py).

    Returns ``(vocab, segmented)``: the final (piece, count) list and
    the final segmentation DataFrame."""
    if em_rounds < 1:
        raise ValueError("em_rounds must be >= 1")
    vocab = seed_vocabulary(
        unigram_seed_counts(words, max_piece=max_piece), n_multi=n_multi
    )
    segmented: DataFrame | None = None
    for _ in range(em_rounds):
        lps = lp_fixed_point(vocab)
        segmented = viterbi_segment(
            words, lps, max_piece=max_piece
        ).localCheckpoint(eager=True)
        counts = piece_counts(segmented).collect()
        vocab = sorted((r["piece"], int(r["cnt"])) for r in counts)
    assert segmented is not None
    return vocab, segmented
