"""Text-analysis operators (SURVEY §2.11 X3): tokenization, quality
scoring, language ID, document fingerprinting — all native column
expressions (regex + array lambdas), zero Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gas_data_pipeline_spark.functions.exprs import bind

# Tiny per-language stopword lists for the n-gram/stopword-hit
# heuristic. Deliberately small: the operator shape (argmax of per-lang
# hit counts over one token array) is what scales; richer lists drop in.
STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "for", "with"],
    "es": ["el", "la", "de", "que", "los", "por", "una", "con"],
    "fr": ["le", "la", "de", "et", "les", "des", "une", "pour"],
    "de": ["der", "die", "und", "das", "von", "mit", "ein", "für"],
}

# BPE-ish tokenizer: word pieces OR single non-space symbols — the
# regex form of a byte-pair vocabulary's coarse pass.
TOKEN_PATTERN = r"[a-z0-9]+|[^\sa-z0-9]"


def is_word(tok: Column) -> Column:
    """True iff a token is a word piece. By TOKEN_PATTERN construction
    a token is either all-[a-z0-9] or a single other symbol, so the
    first character decides — an ascii() range check, ~10x cheaper than
    re-running a regex per token."""
    a = F.ascii(tok)
    return ((a >= 97) & (a <= 122)) | ((a >= 48) & (a <= 57))


def tokenize(text: Column) -> Column:
    """Lower-cased token array via regexp extraction (not split — so
    punctuation becomes tokens, like BPE pre-tokenization)."""
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PATTERN), 0)


def nullsafe_size(arr: Column) -> Column:
    """``size(NULL)`` is -1 under legacy sizeOfNull (session runs ANSI
    off); map it back to NULL so null text yields NULL counts —
    matching SQL ``len()`` semantics — instead of a nonsense -1 that
    would silently poison token budgets and averages."""
    return F.nullif(F.size(arr), F.lit(-1))


# GPT-2-style pre-tokenizer, lookahead-free variant: contraction
# suffixes, space-prefixed letter runs, space-prefixed digit runs,
# space-prefixed symbol runs, residual whitespace. (The published
# GPT-2 pattern's `\s+(?!\S)` lookahead is dropped so the identical
# pattern runs under both Java regex and RE2-based oracles.)
BPE_PRETOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"
)


def bpe_pretoken_count(text: Column) -> Column:
    """Token-budget estimator: count of BPE pre-tokenizer pieces — the
    unit LLM context windows and training-token budgets are planned
    in (each pre-token splits into >=1 BPE ids, so this is a tight
    lower bound and tracks real tokenizer counts closely). Pure
    codegen'd regexp work, no UDF."""
    return nullsafe_size(
        F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_PATTERN), 0)
    ).cast("bigint")


def token_stats(text: Column) -> dict[str, Column]:
    toks = tokenize(text)
    words = F.filter(toks, is_word)
    return {
        "n_tokens": nullsafe_size(toks).cast("bigint"),
        "n_words": nullsafe_size(words).cast("bigint"),
        "n_chars": F.length(text).cast("bigint"),
        "avg_word_len": F.when(
            F.size(words) > 0,
            F.aggregate(
                words, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w)
            )
            / F.size(words),
        ).otherwise(F.lit(0.0)),
    }


def quality_features(text: Column) -> dict[str, Column]:
    """Heuristic quality signals (length, punctuation density, stopword
    ratio) — the standard pre-training corpus filters."""
    toks = tokenize(text)
    words = F.filter(toks, is_word)
    n_toks = nullsafe_size(toks)
    n_words = nullsafe_size(words)
    sw = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    n_stop = F.size(F.filter(words, lambda t: F.array_contains(sw, t)))
    punct_ratio = F.when(
        n_toks > 0, (n_toks - n_words).cast("double") / n_toks
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop.cast("double") / n_words).otherwise(
        F.lit(0.0)
    )
    return {
        "n_words": n_words.cast("bigint"),
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        # Composite score: long-enough, low punctuation, some stopwords.
        "quality_score": (
            F.least(n_words.cast("double") / 100.0, F.lit(1.0)) * 0.4
            + (1.0 - punct_ratio) * 0.3
            + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
        ),
    }


def lang_id(text: Column) -> Column:
    """Stopword-hit argmax language guess. Ties broken by language code
    order (deterministic)."""
    toks = tokenize(text)
    scores = []
    for code, words in sorted(STOPWORDS.items()):
        sw = F.array(*[F.lit(s) for s in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        scores.append(F.struct(hits.alias("hits"), F.lit(code).alias("code")))
    # array_max on struct: max by hits, then code — we want max hits,
    # ties -> smallest code, so order by (hits, negated-code) isn't
    # expressible; instead sort desc by hits with stable code order.
    best = F.aggregate(
        F.array(*scores),
        F.struct(F.lit(-1).alias("hits"), F.lit("und").alias("code")),
        lambda acc, s: F.when(s["hits"] > acc["hits"], s).otherwise(acc),
    )
    return F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und"))


def text_profile(text: Column) -> Column:
    """All X3 text-analysis features in ONE pass: a struct of
    (n_tokens, n_words, n_chars, punct_ratio, stopword_ratio,
    quality_score, lang_guess).

    The token array and the word subset are let-bound via
    :func:`~gas_data_pipeline_spark.functions.exprs.bind`, so the
    tokenizer regex runs once per row instead of once per feature
    reference (~8x for the full profile — CollapseProject would
    otherwise inline it into every consumer). Expand to columns with
    ``F.inline(F.array(text_profile(c)))`` — the generator is also the
    barrier that stops downstream re-inlining."""

    def with_words(toks: Column, words: Column) -> Column:
        n_toks = nullsafe_size(toks)
        n_words = nullsafe_size(words)
        sw = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
        n_stop = F.size(F.filter(words, lambda t: F.array_contains(sw, t)))
        punct_ratio = F.when(
            n_toks > 0, (n_toks - n_words).cast("double") / n_toks
        ).otherwise(F.lit(0.0))
        stop_ratio = F.when(
            n_words > 0, n_stop.cast("double") / n_words
        ).otherwise(F.lit(0.0))

        lang_scores = []
        for code, lang_words in sorted(STOPWORDS.items()):
            lsw = F.array(*[F.lit(s) for s in lang_words])
            hits = F.size(F.filter(toks, lambda t: F.array_contains(lsw, t)))
            lang_scores.append(
                F.struct(hits.alias("hits"), F.lit(code).alias("code"))
            )
        best = F.aggregate(
            F.array(*lang_scores),
            F.struct(F.lit(-1).alias("hits"), F.lit("und").alias("code")),
            lambda acc, s: F.when(s["hits"] > acc["hits"], s).otherwise(acc),
        )

        return F.struct(
            n_toks.cast("bigint").alias("n_tokens"),
            n_words.cast("bigint").alias("n_words"),
            F.length(text).cast("bigint").alias("n_chars"),
            punct_ratio.alias("punct_ratio"),
            stop_ratio.alias("stopword_ratio"),
            (
                F.least(n_words.cast("double") / 100.0, F.lit(1.0)) * 0.4
                + (1.0 - punct_ratio) * 0.3
                + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
            ).alias("quality_score"),
            F.when(best["hits"] > 0, best["code"])
            .otherwise(F.lit("und"))
            .alias("lang_guess"),
        )

    return bind(
        tokenize(text),
        lambda toks: bind(
            F.filter(toks, is_word),
            lambda words: with_words(toks, words),
        ),
    )


MOD = 1_000_000_007


def rolling_fingerprint(text: Column) -> Column:
    """Polynomial rolling hash over the token stream:
    ``h = (h*131 + ascii(first_char)*31 + len(token)) mod 1e9+7``.
    A fold any engine can reproduce (no engine-specific hash), used for
    order-sensitive document fingerprinting (near-identical docs with
    reordered content get different prints, unlike bag-of-shingles)."""
    toks = tokenize(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: (
            acc * 131 + F.ascii(F.substring(t, 1, 1)) * 31 + F.length(t)
        )
        % MOD,
    )


def word_bigrams(text: Column) -> Column:
    """All word bigrams (with multiplicity — repetition is the point)
    of the word-token stream, as 'a b' strings."""
    from gas_data_pipeline_spark.functions.exprs import bind

    def grams(words: Column) -> Column:
        # Guarded: sequence(1, 0) DESCENDS in Spark, so k<1 must short-
        # circuit to an empty array, never reach element_at(words, 0).
        return F.when(
            F.size(words) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(words) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(words, i), F.element_at(words, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return bind(F.filter(tokenize(text), is_word), grams)


def unigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """X3 model-based quality signal: score each document under the
    corpus's own unigram language model — avg log p(token) and the
    perplexity proxy exp(-avg). Documents full of globally-rare tokens
    (noise, mojibake, code dumped into prose) score high-perplexity;
    the standard cheap stand-in for a KenLM-style filter when no
    external model may be loaded.

    Self-trained, so there is no OOV case: every token is in the
    vocabulary by construction. Documents with zero word tokens have
    no distribution to score and are absent from the output.

    Scale shape: token explode → map-side-combinable vocab count → a
    |vocab|-sized probability table joined back to the token stream
    (broadcast here; at open-vocabulary scale this becomes the plain
    shuffle equi-join and AQE handles term skew) → per-doc aggregate.
    No Python anywhere."""
    toks = docs.select(
        F.col(id_col), F.explode(F.filter(tokenize(F.col(text_col)), is_word)).alias("term")
    )
    # Aggregate the token stream to per-doc term frequencies FIRST
    # (optimization r14, guide §1.2): the naive shape consumed `toks`
    # twice — once for the vocab count, once for the score join — and
    # with no common-subplan sharing each consumer re-ran the regexp
    # tokenize over the whole corpus. Everything downstream now derives
    # from the tf table, so the corpus is tokenized exactly once; the
    # weighted avg sum(tf*lp)/sum(tf) over (doc, term) rows equals the
    # per-token avg bit-for-bit at the 6-dp rounding (A/B-checked
    # value-identical at sf0.1).
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    vocab = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n"))
    lp = F.log(F.col("cnt") / F.col("n"))
    scored = tf.join(F.broadcast(vocab), "term").crossJoin(F.broadcast(total))
    wavg = F.sum(F.col("tf") * lp) / F.sum("tf")
    return scored.groupBy(id_col).agg(
        F.sum("tf").cast("bigint").alias("n_tokens"),
        F.round(wavg, 6).alias("avg_logprob"),
        F.round(F.exp(-wavg), 6).alias("ppl_proxy"),
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding word-window chunking (RAG / context-window prep): split
    each document into ``chunk``-word pieces whose starts step by
    ``stride`` words, so consecutive pieces share ``chunk - stride``
    words of overlap. Start positions run through
    ``max(n_words - overlap - 1, 0)`` inclusive, which is the minimal
    start set that still covers every word — no trailing chunk whose
    words are all already covered, and short documents yield exactly
    one chunk.

    Scale shape: a narrow, bounded row expansion (``~n_words/stride``
    rows per document, no shuffle at all) — the chunker rides the scan
    and any downstream partitioning is inherited from the corpus. No
    Python in the row path: split/sequence/explode/slice are all
    codegen'd expressions.
    """
    if not (0 < stride <= chunk):
        raise ValueError(f"need 0 < stride <= chunk, got {chunk=} {stride=}")
    overlap = chunk - stride
    # split() on an all-whitespace string yields [''] and on NULL yields
    # NULL — both would otherwise become phantom chunks, so empty tokens
    # are filtered from the array (this also strips the trailing empty
    # token a \n/\t-terminated doc produces, which trim() alone misses)
    # and zero-word docs are dropped before the explode.
    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit("")
    )
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("__words") - F.lit(overlap + 1), F.lit(0)),
        F.lit(stride),
    )
    piece = F.slice(F.col("__words"), F.col("start_word") + 1, chunk)
    return (
        docs.select(F.col(id_col), words.alias("__words"))
        .where(F.size("__words") > 0)
        .select(F.col(id_col), "__words", F.explode(starts).alias("start_word"))
        .select(
            F.col(id_col),
            (F.col("start_word") / stride).cast("bigint").alias("chunk_seq"),
            F.col("start_word").cast("bigint").alias("start_word"),
            F.array_join(piece, " ").alias("chunk_text"),
            F.size(piece).cast("bigint").alias("n_words"),
        )
    )
