"""Data-selection queries (SURVEY §2.11 extensions, round 7): the
model-based corpus-selection passes an LLM data pipeline runs after
cleaning and before tokenization — DSIR-style hashed importance
weighting, Count-Min-Sketch frequency summaries, Zipf-law vocabulary
diagnostics, and a broadcast linear quality classifier. All
value-oracled: every hash derives from md5(salt, value), which DuckDB
reproduces bit-for-bit; every float addend is quantized before
summation so both engines sum identical values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gas_data_pipeline_spark.catalog import table
from gas_data_pipeline_spark.functions.exprs import bind
from gas_data_pipeline_spark.operators.selection import (
    QUALITY_STOPWORDS,
    cms_build,
    cms_estimate,
    cms_merge,
    dsir_fit_log_ratios,
    dsir_log_ratio_map,
    dsir_score,
    kc_sample_sql,
    quality_features,
    quality_score,
)
from gas_data_pipeline_spark.registry import register

# Whitespace word-array twin (operators/dedup.py convention).
_WS_SQL = "regexp_split_to_array(lower(trim(text)), '\\s+')"

# DuckDB twin of operators/selection.portable_bucket.
def _bucket_sql(value: str, salt: str, k: int) -> str:
    return (
        f"CAST(concat('0x', substring(md5('{salt}:' || {value}), 1, 8)) "
        f"AS BIGINT) % {k}"
    )


def _words(text: Column | None = None) -> Column:
    return F.split(
        F.lower(F.trim(text if text is not None else F.col("text"))), r"\s+"
    )


# ---------------------------------------------------------------------------
# DSIR importance selection
# ---------------------------------------------------------------------------

_DSIR_CTES = f"""
    w AS (
        SELECT doc_id, lang, unnest({_WS_SQL}) AS word
        FROM documents
    ),
    b AS (
        SELECT doc_id, lang,
               {_bucket_sql('word', 'dsir-v1', 128)} AS bucket
        FROM w
    ),
    fit AS (
        SELECT bucket,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_cnt,
               sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS r_cnt
        FROM b GROUP BY bucket
    ),
    tot AS (SELECT sum(t_cnt) AS t_tot, sum(r_cnt) AS r_tot FROM fit),
    ratio AS (
        SELECT bucket,
               round(ln((t_cnt + 0.5) / (t_tot + 64.0))
                     - ln((r_cnt + 0.5) / (r_tot + 64.0)), 9) AS lr
        FROM fit, tot
    ),
    score AS (
        -- Fixed-point sum (lr x 1e9 as BIGINT): integer addition is
        -- exact and order-independent, so Spark's per-doc array fold
        -- and this grouped sum agree bit-for-bit at any scale.
        SELECT b.doc_id,
               count(*) AS n_words,
               round(sum(CAST(round(r.lr * 1e9) AS BIGINT)) / 1e9, 6) AS logw
        FROM b JOIN ratio r USING (bucket)
        GROUP BY b.doc_id
    )
"""


@register(
    "dsir_importance_select",
    oracle=f"""
        WITH {_DSIR_CTES}
        SELECT doc_id, n_words, logw, logw > 0.0 AS selected
        FROM score
    """,
)
def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023): fit hashed-unigram
    bucket distributions for the target domain (English docs) vs the
    raw pool, then score every document with its summed
    log-importance ratio and flag the positive-weight slice for
    training. The fit is ONE map-side-combinable aggregate to 128
    rows; the model is embedded as a map literal so the scoring pass
    is a zero-shuffle scan-project (`operators/selection.py:70-160`).
    Beyond-reference operator mandated by the build brief (training-
    data pipeline family)."""
    docs = table(spark, sf_dir, "documents")
    ratios = dsir_fit_log_ratios(
        docs, _words(), F.col("lang") == "en", n_buckets=128
    )
    scored = dsir_score(docs, _words(), dsir_log_ratio_map(ratios))
    return scored.select(
        "doc_id",
        "n_words",
        "logw",
        (F.col("logw") > 0.0).alias("selected"),
    )


# ---------------------------------------------------------------------------
# Count-Min Sketch heavy hitters
# ---------------------------------------------------------------------------

_CMS_BUCKET = _bucket_sql(
    "CAST(t.j AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)", "cms-v1", 64
)


@register(
    "cms_heavy_hitters_merge",
    oracle=f"""
        WITH cells AS (
            SELECT event_type, t.j AS row_j, {_CMS_BUCKET} AS bucket
            FROM events, UNNEST([0, 1, 2, 3]) t(j)
        ),
        sk AS (
            SELECT event_type, row_j, bucket, count(*) AS cnt
            FROM cells GROUP BY 1, 2, 3
        ),
        merged AS (
            SELECT row_j, bucket, sum(cnt) AS cnt FROM sk GROUP BY 1, 2
        ),
        exact AS (
            SELECT user_id, count(*) AS exact_cnt FROM events GROUP BY 1
        ),
        cands AS (
            SELECT * FROM exact ORDER BY exact_cnt DESC, user_id LIMIT 20
        ),
        probes AS (
            SELECT c.user_id, c.exact_cnt, t.j AS row_j,
                   {_CMS_BUCKET} AS bucket
            FROM cands c, UNNEST([0, 1, 2, 3]) t(j)
        ),
        est AS (
            SELECT user_id, exact_cnt,
                   CAST(min(coalesce(m.cnt, 0)) AS BIGINT) AS cms_estimate
            FROM probes p LEFT JOIN merged m USING (row_j, bucket)
            GROUP BY 1, 2
        )
        SELECT user_id, exact_cnt, cms_estimate,
               cms_estimate - exact_cnt AS overcount
        FROM est
    """,
)
def cms_heavy_hitters_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-Sketch frequency summaries (Cormode & Muthukrishnan
    2005) as mergeable per-partition state: one sketch per event_type
    (ONE map-side-combinable aggregate from facts to 4x64 cells per
    type), cell-wise-sum merge across types WITHOUT rescanning facts,
    then min-over-rows point estimates for the exact top-20 users —
    the estimate is an upper bound by construction (`overcount >= 0`
    for every row, pinned in tests/test_selection.py). Same mergeable-
    summary algebra as the HLL rollup (`operators/sketches.py`); at
    100 TB the facts are scanned once and all downstream algebra runs
    on 256-row summaries."""
    ev = table(spark, sf_dir, "events")
    key = F.col("user_id").cast("string")
    sketches = cms_build(ev, key, ["event_type"])
    merged = cms_merge(sketches)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    cands = exact.orderBy(F.desc("exact_cnt"), "user_id").limit(20)
    est = cms_estimate(cands, merged, key)
    return est.select(
        "user_id",
        "exact_cnt",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_cnt")).alias("overcount"),
    )


# ---------------------------------------------------------------------------
# Zipf vocabulary diagnostics
# ---------------------------------------------------------------------------


@register(
    "zipf_token_slope",
    oracle=f"""
        WITH w AS (
            SELECT lang, unnest({_WS_SQL}) AS word FROM documents
        ),
        counts AS (
            SELECT lang, word, count(*) AS cnt FROM w GROUP BY 1, 2
        ),
        ranked AS (
            SELECT lang, cnt,
                   row_number() OVER (
                       PARTITION BY lang ORDER BY cnt DESC, word
                   ) AS rnk
            FROM counts
        ),
        q AS (
            -- ln(cnt)/ln(rnk) quantized to BIGINT x 1e6 PER ROW, so
            -- both engines sum identical integers (the repo's
            -- fixed-point convention; float regr_* aggregates sum in
            -- engine-dependent order). 1e6 keeps every moment inside
            -- BIGINT: |yq| <= 2e7, |xq| <= 5e6, 100 rows per lang.
            SELECT lang,
                   CAST(round(ln(cnt) * 1e6) AS BIGINT) AS yq,
                   CAST(round(ln(rnk) * 1e6) AS BIGINT) AS xq
            FROM ranked WHERE rnk <= 100
        ),
        m AS (
            SELECT lang,
                   count(*) AS n,
                   sum(xq) AS sx, sum(yq) AS sy,
                   sum(xq * yq) AS sxy,
                   sum(xq * xq) AS sxx,
                   sum(yq * yq) AS syy
            FROM q GROUP BY lang
        ),
        fit AS (
            SELECT lang, n,
                   n * sxy - sx * sy AS num,
                   n * sxx - sx * sx AS denx,
                   n * syy - sy * sy AS deny,
                   sx, sy
            FROM m
        )
        SELECT lang,
               n AS n_terms,
               round(CAST(num AS DOUBLE) / CAST(denx AS DOUBLE), 6) AS slope,
               round((CAST(sy AS DOUBLE)
                      - (CAST(num AS DOUBLE) / CAST(denx AS DOUBLE))
                        * CAST(sx AS DOUBLE)) / (n * 1e6), 6) AS intercept,
               round((CAST(num AS DOUBLE) * CAST(num AS DOUBLE))
                     / (CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE)), 6) AS r2
        FROM fit
    """,
)
def zipf_token_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law corpus diagnostic: per-language OLS fit of
    log-frequency against log-rank over the top-100 vocabulary — the
    standard sanity check that a scraped corpus has natural-language
    token statistics (slope near -1) rather than boilerplate or spam.
    The token count is a map-side-combinable aggregate to vocabulary
    size; the rank window and regression run on vocab-sized data
    (never corpus-sized), so the plan is scan -> vocab agg -> tiny
    window -> 5-row regression.

    Exactness device: ln(cnt)/ln(rnk) are quantized to fixed-point
    BIGINT (x 1e6) PER ROW, and slope/intercept/r2 derive from the
    exact integer moment sums (n, Σx, Σy, Σxy, Σx², Σy²) — float
    regr_* aggregates sum products in engine- and partition-dependent
    order, the association class behind the round-6 hash flips. The
    final divisions run on int64→double casts, which round identically
    in both engines.

    Accepted ulp risk (ADVICE r8): the quantized ln runs JVM-side
    (F.log) against DuckDB's libm ln. Unlike the unigram model's
    driver-side ln (reused across ties, so a 1-ulp drift would cascade
    through Viterbi argmaxes), each ln here feeds ONE addend of a
    moment sum quantized at 1e6 — a flip requires libm and StrictMath
    to disagree on an ln of a small integer AND that ln*1e6 to land
    within one ulp of a .5 boundary, and the inputs (cnt, rnk —
    integers, rnk <= 100) are a tiny set spot-checked equal in
    tests/test_selection.py. Documented rather than rerouted."""
    docs = table(spark, sf_dir, "documents")
    words = docs.select("lang", F.explode(_words()).alias("word"))
    counts = words.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("cnt"))
    ranked = counts.select(
        "lang",
        "cnt",
        F.row_number()
        .over(Window.partitionBy("lang").orderBy(F.desc("cnt"), "word"))
        .alias("rnk"),
    ).filter(F.col("rnk") <= 100)
    q = ranked.select(
        "lang",
        F.round(F.log("cnt") * 1e6, 0).cast("bigint").alias("yq"),
        F.round(F.log("rnk") * 1e6, 0).cast("bigint").alias("xq"),
    )
    m = q.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xq").alias("sx"),
        F.sum("yq").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).alias("sxx"),
        F.sum(F.col("yq") * F.col("yq")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = (n * F.col("sxy") - sx * sy).cast("double")
    denx = (n * F.col("sxx") - sx * sx).cast("double")
    deny = (n * F.col("syy") - sy * sy).cast("double")
    slope_raw = num / denx
    return m.select(
        "lang",
        n.alias("n_terms"),
        F.round(slope_raw, 6).alias("slope"),
        F.round(
            (sy.cast("double") - slope_raw * sx.cast("double")) / (n * F.lit(1e6)),
            6,
        ).alias("intercept"),
        F.round((num * num) / (denx * deny), 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Broadcast linear quality model
# ---------------------------------------------------------------------------

_STOP_SQL = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)
_FEAT_KEYS = ("n_words", "distinct_ratio", "stop_ratio", "mean_wlen")


def _score_of(fs: Column) -> Column:
    """Rounded sigmoid score from a bound feature struct."""
    return F.round(quality_score({k: fs[k] for k in _FEAT_KEYS}), 6)

_QUALITY_CTES = f"""
    feats AS (
        SELECT doc_id, lang,
               len(ws) AS n_words,
               len(list_distinct(ws)) / greatest(len(ws), 1) AS distinct_ratio,
               len(list_filter(ws, w -> w IN ({_STOP_SQL})))
                   / greatest(len(ws), 1) AS stop_ratio,
               list_sum(list_transform(ws, w -> len(w)))
                   / greatest(len(ws), 1) AS mean_wlen
        FROM (SELECT doc_id, lang, {_WS_SQL} AS ws FROM documents)
    ),
    scored AS (
        SELECT doc_id, lang, n_words, distinct_ratio, stop_ratio, mean_wlen,
               round(1.0 / (1.0 + exp(-(4.85 + 0.05 * n_words
                                        + 6.0 * distinct_ratio
                                        + 12.0 * stop_ratio
                                        - 2.5 * mean_wlen))), 6) AS score
        FROM feats
    )
"""


@register(
    "quality_model_score",
    oracle=f"""
        WITH {_QUALITY_CTES}
        SELECT doc_id, n_words,
               round(distinct_ratio, 6) AS distinct_ratio,
               round(stop_ratio, 6) AS stop_ratio,
               round(mean_wlen, 6) AS mean_wlen,
               score,
               CASE WHEN score >= 0.75 THEN 'high'
                    WHEN score >= 0.4 THEN 'medium'
                    ELSE 'low' END AS bucket
        FROM scored
    """,
)
def quality_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (the fastText-classifier stage of
    C4/RefinedWeb pipelines, with the learned weights replaced by a
    fixed vector so the whole stage value-oracles): cheap lexical
    features -> sigmoid of a broadcast linear model -> quality
    buckets. One zero-shuffle scan: the word array is let-bound so
    the split runs once per row, the feature struct expands through
    `F.inline` (a Generate barrier projections cannot collapse into),
    and every feature is a native array expression."""
    docs = table(spark, sf_dir, "documents")
    out_struct = bind(
        _words(),
        lambda ws: bind(
            F.struct(
                *[v.alias(k) for k, v in quality_features(ws).items()]
            ),
            lambda fs: F.struct(
                fs["n_words"].alias("n_words"),
                F.round(fs["distinct_ratio"], 6).alias("distinct_ratio"),
                F.round(fs["stop_ratio"], 6).alias("stop_ratio"),
                F.round(fs["mean_wlen"], 6).alias("mean_wlen"),
                _score_of(fs).alias("score"),
                F.when(_score_of(fs) >= 0.75, "high")
                .when(_score_of(fs) >= 0.4, "medium")
                .otherwise("low")
                .alias("bucket"),
            ),
        ),
    )
    return docs.select("doc_id", F.inline(F.array(out_struct)))


# ---------------------------------------------------------------------------
# Composed selection pipeline
# ---------------------------------------------------------------------------


@register(
    "selection_pipeline_summary",
    oracle=f"""
        WITH {_DSIR_CTES},
        {_QUALITY_CTES}
        SELECT s.lang,
               count(*) AS n_selected,
               CAST(sum(d.n_words) AS BIGINT) AS total_words,
               round(avg(s.score), 6) AS avg_quality
        FROM score d JOIN scored s USING (doc_id)
        WHERE d.logw > 0.0 AND s.score >= 0.4
        GROUP BY s.lang
    """,
)
def selection_pipeline_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed selection pass a training run would ship: DSIR
    importance gate AND quality-model gate, summarized per language
    (docs kept, token mass, mean quality) — the dataset-card row for
    the selected corpus. Both gates are zero-shuffle scan stages over
    the same documents scan (the DSIR model is a 128-entry map
    literal, the quality model a constant vector), so the whole
    pipeline is scan -> project -> filter -> one langs-sized
    aggregate."""
    from gas_data_pipeline_spark.operators.selection import (
        portable_bucket,
    )

    docs = table(spark, sf_dir, "documents")
    ratios = dsir_fit_log_ratios(
        docs, _words(), F.col("lang") == "en", n_buckets=128
    )
    ratio_map = dsir_log_ratio_map(ratios)
    per_doc = bind(
        _words(),
        lambda ws: bind(
            F.struct(
                F.round(
                    F.aggregate(
                        ws,
                        F.lit(0).cast("bigint"),
                        lambda acc, w: acc
                        + F.coalesce(
                            F.element_at(
                                ratio_map, portable_bucket(w, "dsir-v1", 128)
                            ),
                            F.lit(0).cast("bigint"),
                        ),
                    )
                    / F.lit(1e9),
                    6,
                ).alias("logw"),
                *[v.alias(k) for k, v in quality_features(ws).items()],
            ),
            lambda fs: F.struct(
                fs["logw"].alias("logw"),
                fs["n_words"].alias("n_words"),
                _score_of(fs).alias("score"),
            ),
        ),
    )
    kept = docs.select("lang", F.inline(F.array(per_doc))).filter(
        (F.col("logw") > 0.0) & (F.col("score") >= 0.4)
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_selected"),
        F.sum("n_words").alias("total_words"),
        F.round(F.avg("score"), 6).alias("avg_quality"),
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing
# ---------------------------------------------------------------------------

# DuckDB twin of operators/text.tokenize + is_word (the convention of
# text_unigram_logprob's oracle in suite/northstar.py).
_TOKS_SQL = """
        SELECT doc_id, lang, unnest(
            list_filter(
                regexp_extract_all(lower(text), '[a-z0-9]+|[^\\sa-z0-9]'),
                t -> regexp_matches(t, '^[a-z0-9]')
            )
        ) AS term
        FROM documents
"""


@register(
    "ccnet_perplexity_buckets",
    oracle=f"""
        WITH toks AS ({_TOKS_SQL}),
        vocab AS (
            SELECT lang, term, count(*) AS cnt FROM toks GROUP BY 1, 2
        ),
        tot AS (SELECT lang, sum(cnt) AS n FROM vocab GROUP BY 1),
        lpq AS (
            -- per-language unigram logprob, quantized to BIGINT x 1e9
            -- once per TERM so every engine sums identical integers.
            SELECT v.lang, v.term,
                   CAST(round(ln(v.cnt / t.n) * 1e9) AS BIGINT) AS lp_q
            FROM vocab v JOIN tot t USING (lang)
        ),
        scored AS (
            SELECT t.doc_id, t.lang,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   sum(lp_q) AS s_q
            FROM toks t JOIN lpq USING (lang, term)
            GROUP BY 1, 2
        )
        SELECT doc_id, lang, n_tokens,
               round(s_q / 1e9 / n_tokens, 6) AS avg_logprob,
               round(exp(-(s_q / 1e9 / n_tokens)), 6) AS ppl_proxy,
               CASE ntile(3) OVER (
                   PARTITION BY lang
                   ORDER BY s_q / n_tokens DESC, doc_id
               ) WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                 ELSE 'tail' END AS bucket
        FROM scored
    """,
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl
    Data"): score every document under a per-language unigram LM
    (the self-trained stand-in for CCNet's KenLM, as in
    text_unigram_logprob) and split each language into head / middle /
    tail perplexity tertiles — the shape downstream pipelines use to
    keep head+middle and drop tail.

    Exactness device: the per-term logprob is quantized to fixed-point
    BIGINT once in the vocab table, so each document's sum is an
    integer sum (order-free) and the tertile ordering key
    ``s_q / n_tokens`` is the same double in both engines — the
    bucket boundary can never disagree. Scale shape: token explode →
    map-side-combinable vocab count → vocab-sized broadcast back onto
    the token stream → per-doc aggregate; the tertile window is
    per-language over doc-level rows (same window budget as
    curation_quality_percentile; the production form swaps the exact
    tertile for broadcast approx-quantile cutoffs, which drops the
    window entirely)."""
    from gas_data_pipeline_spark.operators.text import is_word, tokenize

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.filter(tokenize(F.col("text")), is_word)).alias("term"),
    )
    vocab = toks.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("cnt"))
    tot = vocab.groupBy("lang").agg(F.sum("cnt").alias("n"))
    lpq = vocab.join(F.broadcast(tot), "lang").select(
        "lang",
        "term",
        F.round(F.log(F.col("cnt") / F.col("n")) * 1e9, 0)
        .cast("bigint")
        .alias("lp_q"),
    )
    scored = (
        toks.join(F.broadcast(lpq), ["lang", "term"])
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("lp_q").alias("s_q"),
        )
    )
    avg = F.col("s_q") / F.lit(1e9) / F.col("n_tokens")
    tertile = F.ntile(3).over(
        Window.partitionBy("lang").orderBy(
            (F.col("s_q") / F.col("n_tokens")).desc(), "doc_id"
        )
    )
    return scored.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.round(avg, 6).alias("avg_logprob"),
        F.round(F.exp(-avg), 6).alias("ppl_proxy"),
        F.when(tertile == 1, "head")
        .when(tertile == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


# ---------------------------------------------------------------------------
# Greedy k-center coreset selection
# ---------------------------------------------------------------------------

# Compute-once seam (same discipline as _corpus_bpe_training /
# _planted_components): k-center codebooks train on the BOUNDED
# deterministic sample (operators/selection.kcenter_greedy_sampled —
# the 256 smallest md5('kctrain-v1':id) draws, ONE Spark job + a
# driver-side numpy greedy), so training cost is constant regardless
# of corpus scale and the k-1 sequential full-corpus passes of the
# r8 trainer are gone (VERDICT r8 #1). The trained centers are a
# k-row Python list (a model, not data), cached per (application,
# sf_dir, corpus-tag, k); assignment stays a fresh zero-shuffle scan
# per caller. The oracle replays the identical sample via
# ORDER BY md5(...) LIMIT 256 (_KC_SAMP_TAIL below).
_KCENTER_CACHE: dict[tuple[str, str, str, int], list[dict]] = {}


def _corpus_kcenter(
    spark: SparkSession, sf_dir: str, tag: str, points: DataFrame, *, k: int = 8
) -> list[dict]:
    from gas_data_pipeline_spark.operators.selection import (
        kcenter_greedy_sampled,
    )

    key = (spark.sparkContext.applicationId, sf_dir, tag, k)
    centers = _KCENTER_CACHE.get(key)
    if centers is None:
        centers = kcenter_greedy_sampled(points, "vec_id", "embedding", k=k)
        _KCENTER_CACHE[key] = centers
    return centers


# DuckDB twin of the bounded training draw — BUILT from the engine's
# own helper so the two can't drift apart silently (ADVICE r9): any
# change to the seed/n in operators.selection changes this oracle
# fragment with it.
_KC_SAMP_TAIL = kc_sample_sql()


_KC_DIST_SQL = (
    "list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> CAST(round(({a}[i] - {b}[i]) * ({a}[i] - {b}[i]) * 1e6) "
    "AS BIGINT)))"
)


@register(
    "coreset_kcenter_select",
    oracle=f"""
        WITH RECURSIVE pts AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ),
        samp AS (SELECT vec_id, v FROM pts {_KC_SAMP_TAIL}),
        sel(step, vec_id, sq_fp, chosen) AS (
            SELECT 1, min(vec_id), CAST(NULL AS BIGINT), [min(vec_id)]
            FROM samp
            UNION ALL
            SELECT sel.step + 1, nxt.vec_id, nxt.mind,
                   list_append(sel.chosen, nxt.vec_id)
            FROM sel, LATERAL (
                SELECT p.vec_id,
                       (SELECT min({_KC_DIST_SQL.format(a="p.v", b="c.v")})
                        FROM samp c
                        WHERE list_contains(sel.chosen, c.vec_id)) AS mind
                FROM samp p
                WHERE NOT list_contains(sel.chosen, p.vec_id)
                ORDER BY mind DESC, p.vec_id
                LIMIT 1
            ) nxt
            WHERE sel.step < 8
        ),
        centers AS (
            SELECT CAST(step AS BIGINT) AS step, vec_id AS center_id, sq_fp
            FROM sel
        ),
        dists AS (
            SELECT p.vec_id, c.center_id,
                   {_KC_DIST_SQL.format(a="p.v", b="c.v2")} AS d
            FROM pts p CROSS JOIN (
                SELECT ctr.center_id, p2.v AS v2
                FROM centers ctr JOIN pts p2 ON p2.vec_id = ctr.center_id
            ) c
        ),
        assign AS (
            SELECT vec_id, center_id, d,
                   row_number() OVER (
                       PARTITION BY vec_id ORDER BY d, center_id
                   ) AS rn
            FROM dists
        )
        SELECT c.step, c.center_id,
               round(c.sq_fp / 1e6, 6) AS sq_dist,
               count(*) AS n_assigned,
               round(max(a.d) / 1e6, 6) AS radius
        FROM assign a JOIN centers c USING (center_id)
        WHERE a.rn = 1
        GROUP BY 1, 2, 3
    """,
)
def coreset_kcenter_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection over the embedding table
    (Gonzalez 1985 farthest-point traversal; Sener & Savarese 2018's
    core-set active-learning selector): pick the 8 most
    mutually-distant vectors, then report each chosen center with its
    selection step, its distance to the previously-chosen set at
    selection time, and its assigned-cluster size + coverage radius.
    The diversity-selection counterpart of the DSIR/quality gates:
    those keep what LOOKS like the target, this keeps a spread that
    COVERS the corpus geometry.

    Training runs on the BOUNDED deterministic sample (the 256
    smallest md5 draws — ONE TakeOrderedAndProject job, then a
    driver-side numpy greedy; `operators/selection.py:
    kcenter_greedy_sampled`), so selection cost is constant at any
    corpus scale — the 100 TB shape for learning a k-row model. The
    final assignment is one zero-shuffle scan over an array_sort of
    k (dist, center) structs across the FULL corpus. Distances are
    per-element fixed-point BIGINT sums, so the farthest-point argmax
    and the oracle's recursive-CTE replay over the identical sample
    agree exactly even at near-ties (`operators/selection.py:
    sq_dist_fp`). Training goes through the session-scoped
    `_corpus_kcenter` seam so the sample collects once per corpus
    per session."""
    from gas_data_pipeline_spark.operators.selection import (
        assign_to_centers,
    )

    emb = table(spark, sf_dir, "embeddings")
    centers = _corpus_kcenter(spark, sf_dir, "full", emb, k=8)
    pts = emb.select(
        F.col("vec_id").alias("pid"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    assigned = assign_to_centers(pts, centers)
    centers_df = spark.createDataFrame(
        [(c["step"], c["id"], c["sq_fp"]) for c in centers],
        "step bigint, center_id bigint, sq_fp bigint",
    )
    summary = assigned.groupBy("center_id").agg(
        F.count(F.lit(1)).alias("n_assigned"),
        F.max("sq_fp").alias("max_fp"),
    )
    return summary.join(F.broadcast(centers_df), "center_id").select(
        "step",
        "center_id",
        F.round(F.col("sq_fp") / 1e6, 6).alias("sq_dist"),
        "n_assigned",
        F.round(F.col("max_fp") / 1e6, 6).alias("radius"),
    )


# ---------------------------------------------------------------------------
# Trained quality classifier (full-batch GD, hashing trick)
# ---------------------------------------------------------------------------

# Compute-once seam: the 3-iteration GD trajectory is a list of 65-int
# dicts (a model, not data) consumed by BOTH quality_classifier_train
# and quality_classifier_filter — cache it per (application, sf_dir)
# so the featurize+train scans run once per session. Training persists
# the featurized frame for the loop and releases it immediately; the
# filter's scoring pass featurizes inline (one scan, nothing held).
_QCLF_CACHE: dict[tuple[str, str], list[dict[int, int]]] = {}


def _corpus_classifier_snapshots(
    spark: SparkSession, sf_dir: str
) -> list[dict[int, int]]:
    from gas_data_pipeline_spark.operators.classifier import (
        train_quality_classifier,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    snaps = _QCLF_CACHE.get(key)
    if snaps is None:
        from gas_data_pipeline_spark.operators.classifier import fit_sample

        # Sample-bounded fit (VERDICT r11 #3): the trainer optimizes
        # over the _QC_FIT_N smallest-md5-draw docs — ONE
        # TakeOrderedAndProject, then the 3-iteration GD runs on a
        # constant-sized frame, so fit cost stops growing with the
        # corpus. Corpora <= _QC_FIT_N train full-batch unchanged,
        # and the oracle replays the identical sample (ORDER BY
        # md5 LIMIT n), so the trajectory stays bit-exact.
        docs = fit_sample(table(spark, sf_dir, "documents"), n=_QC_FIT_N)
        snaps = train_quality_classifier(
            docs, _words(), F.col("lang") == "en", dim=64, iters=3
        )
        _QCLF_CACHE[key] = snaps
    return snaps


def _qc_iter(i: int) -> str:
    """One unrolled GD iteration as DuckDB CTEs: score every doc under
    the previous snapshot (hard sigmoid of the fixed-point margin),
    aggregate the error-weighted bucket counts into the gradient, and
    step the weights — the exact integer/IEEE arithmetic of
    operators/classifier.py, so the whole trajectory replays
    bit-for-bit."""
    prev = f"qc_w{i - 1}"
    return f"""
    qc_e{i} AS (
        SELECT d.doc_id, d.y_fp,
               least(greatest(CAST(floor((
                   (SELECT w FROM {prev} WHERE bucket = -1)
                   + coalesce(s.zz, 0)) / 4.0) AS BIGINT) + 500000,
                   0), 1000000) - d.y_fp AS e
        FROM qc_docs d
        LEFT JOIN (
            SELECT x.doc_id, sum(x.x * w.w) AS zz
            FROM qc_x x JOIN {prev} w USING (bucket) GROUP BY 1
        ) s USING (doc_id)
    ),
    qc_g{i} AS (
        SELECT x.bucket, sum(e.e * x.x) AS g
        FROM qc_x x JOIN qc_e{i} e USING (doc_id) GROUP BY 1
        UNION ALL SELECT -1, sum(e) FROM qc_e{i}
    ),
    qc_w{i} AS (
        SELECT w.bucket, w.w - CAST(floor(g.g * 0.0625 / n) AS BIGINT) AS w
        FROM {prev} w JOIN qc_g{i} g USING (bucket), qc_n
    )"""


_QC_FIT_N = 2048

_QC_CTES = f"""
    qc_fit AS (
        SELECT doc_id, lang, text FROM documents
        ORDER BY md5('qcf-fit:' || CAST(doc_id AS VARCHAR))
        LIMIT {_QC_FIT_N}
    ),
    qc_wd AS (
        SELECT doc_id,
               CASE WHEN lang = 'en' THEN 1000000 ELSE 0 END AS y_fp,
               unnest({_WS_SQL}) AS word
        FROM qc_fit
    ),
    qc_x AS (
        SELECT doc_id, y_fp,
               {_bucket_sql('word', 'qclf-v1', 64)} AS bucket,
               count(*) AS x
        FROM qc_wd GROUP BY 1, 2, 3
    ),
    qc_docs AS (
        SELECT doc_id, lang,
               CASE WHEN lang = 'en' THEN 1000000 ELSE 0 END AS y_fp
        FROM qc_fit
    ),
    qc_n AS (SELECT count(*) AS n FROM qc_docs),
    qc_w0 AS (
        SELECT DISTINCT bucket, CAST(0 AS BIGINT) AS w FROM qc_x
        UNION ALL SELECT -1, CAST(0 AS BIGINT)
    ),{_qc_iter(1)},{_qc_iter(2)},{_qc_iter(3)}
"""


@register(
    "quality_classifier_train",
    oracle=f"""
        WITH {_QC_CTES}
        SELECT w1.bucket, w1.w AS w1_fp, w2.w AS w2_fp, w3.w AS w3_fp
        FROM qc_w1 w1
        JOIN qc_w2 w2 USING (bucket)
        JOIN qc_w3 w3 USING (bucket)
    """,
)
def quality_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed training of the GPT-3-style quality discriminator
    (Brown et al. 2020 §A: classify reference-corpus vs crawl, here
    English docs vs the rest): hashing-trick features (64 md5
    buckets), hard-sigmoid activation, THREE gradient steps over a
    BOUNDED deterministic fit sample (the _QC_FIT_N smallest md5
    draws — one TakeOrderedAndProject, so fit cost is constant at any
    corpus scale; corpora at or below the bound train full-batch),
    every quantity fixed-point BIGINT so DuckDB replays the entire
    trajectory exactly over the identical sample. Returns the weight
    snapshot after each iteration — the oracle checks the whole
    optimization path, not just the final model.

    Scale shape: per iteration ONE map-side-combinable aggregate from
    the corpus to 65 gradient rows (the reduce-side exchange is
    partitions x 65 partial sums at any corpus size); the margin is a
    zero-shuffle JVM fold against the weight map embedded in the task
    closure, so no join ever touches the docs, and the featurized
    frame is persisted across the loop so the word split + hashing
    scan runs once (`operators/classifier.py`). Training goes through
    the session-scoped `_corpus_classifier_snapshots` seam shared with
    the filter query."""
    s1, s2, s3 = _corpus_classifier_snapshots(spark, sf_dir)
    rows = [(b, s1[b], s2[b], s3[b]) for b in sorted(s3)]
    return spark.createDataFrame(
        rows, "bucket bigint, w1_fp bigint, w2_fp bigint, w3_fp bigint"
    )


@register(
    "quality_classifier_filter",
    oracle=f"""
        WITH {_QC_CTES},
        qc_wd_all AS (
            SELECT doc_id, unnest({_WS_SQL}) AS word FROM documents
        ),
        qc_x_all AS (
            SELECT doc_id,
                   {_bucket_sql('word', 'qclf-v1', 64)} AS bucket,
                   count(*) AS x
            FROM qc_wd_all GROUP BY 1, 2
        ),
        qc_docs_all AS (
            SELECT doc_id, lang,
                   CASE WHEN lang = 'en' THEN 1000000 ELSE 0 END AS y_fp
            FROM documents
        ),
        qc_p AS (
            SELECT d.doc_id, d.lang, d.y_fp,
                   least(greatest(CAST(floor((
                       (SELECT w FROM qc_w3 WHERE bucket = -1)
                       + coalesce(s.zz, 0)) / 4.0) AS BIGINT) + 500000,
                       0), 1000000) AS p_fp
            FROM qc_docs_all d
            LEFT JOIN (
                SELECT x.doc_id, sum(x.x * w.w) AS zz
                FROM qc_x_all x JOIN qc_w3 w USING (bucket) GROUP BY 1
            ) s USING (doc_id)
        ),
        qc_keep AS (
            SELECT *,
                   CAST(floor(
                       CAST(concat('0x', substring(md5(
                           'qcf-draw:' || CAST(doc_id AS VARCHAR)), 1, 13))
                           AS BIGINT) / 4503599627370496.0 * 1000000.0)
                       AS BIGINT) AS u_fp
            FROM qc_p
        )
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(CASE WHEN p_fp > u_fp THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN (p_fp >= 500000) = (y_fp = 1000000)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
               round(sum(p_fp) / (count(*) * 1000000.0), 6) AS mean_score
        FROM qc_keep
        GROUP BY lang
    """,
)
def quality_classifier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The apply side of the trained discriminator — GPT-3's
    stochastic acceptance rule (keep a document when its classifier
    score beats a deterministic per-doc uniform draw, so high-score
    docs are kept with probability ~score instead of a hard cutoff
    that would collapse the tail). Reports per-language admission
    counts, train-label agreement, and mean score.

    Scale shape: training comes from the session-scoped
    `_corpus_classifier_snapshots` seam — a BOUNDED deterministic fit
    sample (_QC_FIT_N smallest md5 draws, one TakeOrderedAndProject;
    VERDICT r11 #3: the full-corpus fit was the suite's worst probe
    ratio at 0.77 per-copy) feeding ONE persisted featurization scan
    across all 3 GD iterations; scoring embeds the final
    snapshot as a map literal and runs as ONE zero-shuffle scan over
    the corpus (fold + hard sigmoid + md5 draw are all native
    expressions); the only data-sized exchange is the final 5-row
    language rollup."""
    from gas_data_pipeline_spark.operators.classifier import score_fp
    from gas_data_pipeline_spark.operators.curation import uniform_draw

    docs = table(spark, sf_dir, "documents")
    snaps = _corpus_classifier_snapshots(spark, sf_dir)
    p = score_fp(docs, _words(), snaps[-1], dim=64)
    u = (
        F.floor(uniform_draw(F.col("doc_id"), "qcf-draw") * F.lit(1e6))
        .cast("bigint")
    )
    scored = docs.select(
        "lang",
        (F.col("lang") == "en").alias("is_en"),
        p.alias("p_fp"),
        u.alias("u_fp"),
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("p_fp") > F.col("u_fp"), 1).otherwise(0)).alias(
            "n_kept"
        ),
        F.sum(
            F.when((F.col("p_fp") >= 500000) == F.col("is_en"), 1).otherwise(0)
        ).alias("n_correct"),
        F.round(F.sum("p_fp") / (F.count(F.lit(1)) * F.lit(1e6)), 6).alias(
            "mean_score"
        ),
    )


# ---------------------------------------------------------------------------
# Incremental vector-index maintenance (frozen coarse quantizer)
# ---------------------------------------------------------------------------


@register(
    "ann_index_incremental",
    oracle=f"""
        WITH RECURSIVE pts AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                   (vec_id % 10 = 0) AS is_delta
            FROM embeddings
        ),
        bpts AS (SELECT vec_id, v FROM pts WHERE NOT is_delta),
        bsamp AS (SELECT vec_id, v FROM bpts {_KC_SAMP_TAIL}),
        sel(step, vec_id, sq_fp, chosen) AS (
            SELECT 1, min(vec_id), CAST(NULL AS BIGINT), [min(vec_id)]
            FROM bsamp
            UNION ALL
            SELECT sel.step + 1, nxt.vec_id, nxt.mind,
                   list_append(sel.chosen, nxt.vec_id)
            FROM sel, LATERAL (
                SELECT p.vec_id,
                       (SELECT min({_KC_DIST_SQL.format(a="p.v", b="c.v")})
                        FROM bsamp c
                        WHERE list_contains(sel.chosen, c.vec_id)) AS mind
                FROM bsamp p
                WHERE NOT list_contains(sel.chosen, p.vec_id)
                ORDER BY mind DESC, p.vec_id
                LIMIT 1
            ) nxt
            WHERE sel.step < 8
        ),
        centers AS (
            SELECT CAST(step AS BIGINT) AS step, vec_id AS center_id
            FROM sel
        ),
        dists AS (
            SELECT p.vec_id, p.is_delta, c.center_id,
                   {_KC_DIST_SQL.format(a="p.v", b="c.v2")} AS d
            FROM pts p CROSS JOIN (
                SELECT ctr.center_id, b.v AS v2
                FROM centers ctr JOIN bpts b ON b.vec_id = ctr.center_id
            ) c
        ),
        assign AS (
            SELECT vec_id, is_delta, center_id, d,
                   row_number() OVER (
                       PARTITION BY vec_id ORDER BY d, center_id
                   ) AS rn
            FROM dists
        ),
        cellstats AS (
            SELECT c.step, c.center_id,
                   CAST(sum(CASE WHEN a.is_delta THEN 0 ELSE 1 END)
                        AS BIGINT) AS n_base,
                   CAST(sum(CASE WHEN a.is_delta THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_delta,
                   round(max(CASE WHEN NOT a.is_delta THEN a.d END) / 1e6,
                         6) AS base_radius,
                   round(coalesce(max(CASE WHEN a.is_delta THEN a.d END),
                                  -1000000) / 1e6, 6) AS delta_radius
            FROM assign a JOIN centers c USING (center_id)
            WHERE a.rn = 1
            GROUP BY 1, 2
        )
        SELECT step, center_id, n_base, n_delta, base_radius,
               delta_radius, delta_radius > base_radius AS expand
        FROM cellstats
    """,
)
def ann_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental vector-index maintenance with a FROZEN coarse
    quantizer: the base corpus (vec_id % 10 != 0) trains the 8-cell
    k-center quantizer (the deterministic, exact-replayable
    counterpart of IVF's k-means — same routing role); newly arrived
    vectors (vec_id % 10 = 0) are routed to their nearest frozen cell
    WITHOUT retraining, exactly how production ANN indexes absorb a
    daily embedding delta. Per cell the report shows base/delta
    occupancy and the coverage radius before vs after the delta —
    ``expand = true`` marks cells whose new points fall outside the
    trained radius, the standard "this cell needs retraining" signal.

    Scale shape: training touches only a BOUNDED deterministic
    sample of the base (one TakeOrderedAndProject job + driver-side
    numpy greedy — `operators/selection.py:kcenter_greedy_sampled`);
    the delta route is the zero-shuffle ``assign_to_centers`` scan
    (k broadcast structs, fixed-point argmin), so absorbing a delta
    costs O(|delta| · k · d) map work plus one cells-sized rollup —
    history is never rescanned
    (`operators/selection.py:assign_to_centers`). Training goes
    through the session-scoped `_corpus_kcenter` seam (its own
    cache slot — the base slice is a different corpus from
    coreset_kcenter_select's full table)."""
    from gas_data_pipeline_spark.operators.selection import (
        assign_to_centers,
    )

    emb = table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 10 != 0)
    centers = _corpus_kcenter(spark, sf_dir, "base", base, k=8)
    pts = emb.select(
        F.col("vec_id").alias("pid"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "v"
        ),
        (F.col("vec_id") % 10 == 0).alias("is_delta"),
    )
    assigned = assign_to_centers(pts, centers, payload_cols=("is_delta",))
    centers_df = spark.createDataFrame(
        [(c["step"], c["id"]) for c in centers], "step bigint, center_id bigint"
    )
    stats = assigned.groupBy("center_id").agg(
        F.sum(F.when(F.col("is_delta"), 0).otherwise(1)).alias("n_base"),
        F.sum(F.when(F.col("is_delta"), 1).otherwise(0)).alias("n_delta"),
        F.round(
            F.max(F.when(~F.col("is_delta"), F.col("sq_fp"))) / 1e6, 6
        ).alias("base_radius"),
        F.round(
            F.coalesce(
                F.max(F.when(F.col("is_delta"), F.col("sq_fp"))),
                F.lit(-1000000),
            )
            / 1e6,
            6,
        ).alias("delta_radius"),
    )
    return stats.join(F.broadcast(centers_df), "center_id").select(
        "step",
        "center_id",
        "n_base",
        "n_delta",
        "base_radius",
        "delta_radius",
        (F.col("delta_radius") > F.col("base_radius")).alias("expand"),
    )
