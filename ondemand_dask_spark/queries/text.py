"""§2.K — text analysis over the `documents` table.

The LLM-pipeline text battery: language-ID, quality scoring, token
counting, fingerprinting, TF-IDF.  Every query is a narrow
scan+project or a token-level groupBy — the shapes that stay linear
at 100 TB (token explode is the only fan-out, and it feeds partial
aggregation, so the shuffle carries term counts, not tokens).

All heuristics use engine-portable primitives (substring counting,
md5-derived token ids, exact integer rolling hashes) so each query is
fully oracle-checked — the point is proving the Spark plumbing, not
linguistic accuracy on a synthetic corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ondemand_dask_spark.functions.texthash import (
    FP_BASE,
    FP_MOD,
    portable_hash64,
    rolling_fingerprint,
)
from ondemand_dask_spark.io import load_table
from ondemand_dask_spark.operators.checkpoint import RetainedCaches
from ondemand_dask_spark.registry import register

_R = 4

# Weight-table cache for the cosine-pairs inverted-index join: evicted
# at the next entry of that query (same discipline as dedup/graph).
_CACHES = RetainedCaches()
_evict_retained = _CACHES.evict
_retain = _CACHES.retain

# lang → signature substrings (trigram-profile-lite).  Deliberately
# tiny: the fixture vocabulary is shared across langs, so this tests
# deterministic scoring/argmax plumbing, not real language ID.
_PROFILES = {
    "en": ["the", "and", "is "],
    "es": ["el ", "de ", "os "],
    "de": ["der", "ein", "ch "],
    "fr": ["le ", "es ", "ou "],
    "zh": ["zh ", "shi", "de "],
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# Rolling-hash params live in functions.texthash (shared with the
# dedup family); SQL twin of portable_hash64 for the oracles.
_FP_MOD = FP_MOD
_FP_B = FP_BASE
_H_SQL = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"
_h = portable_hash64


def _count_occurrences(text: Column, pat: str) -> Column:
    """Occurrences of a literal substring: (len - len(removed)) / len(pat)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(pat), F.lit(""))))
        / F.lit(len(pat))
    ).cast("long")


def _count_sql(x: str, pat: str) -> str:
    return f"(len({x}) - len(replace({x}, '{pat}', ''))) // {len(pat)}"


def _score_sql(lang: str) -> str:
    return " + ".join(_count_sql("text", p) for p in _PROFILES[lang])


@register(
    "text_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {", ".join(f"({_score_sql(lg)}) AS s_{lg}" for lg in _PROFILES)}
      FROM documents
    )
    SELECT doc_id,
           CASE {" ".join(
               f"WHEN s_{lg} >= greatest(s_en, s_es, s_de, s_fr, s_zh) THEN '{lg}'"
               for lg in _PROFILES)}
           END AS predicted,
           (CASE {" ".join(
               f"WHEN s_{lg} >= greatest(s_en, s_es, s_de, s_fr, s_zh) THEN '{lg}'"
               for lg in _PROFILES)}
           END = lang) AS hit
    FROM scored
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via n-gram profile scoring: count signature
    substrings per language, argmax (first-wins tie break, declared
    identically in both engines).  Pure codegen — no UDF, no shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    scores = {lg: sum(
        (_count_occurrences(t, p) for p in pats), F.lit(0).cast("long")
    ) for lg, pats in _PROFILES.items()}
    best = F.greatest(*scores.values())
    pred = F
    expr = None
    for lg in _PROFILES:
        cond = scores[lg] >= best
        expr = F.when(cond, F.lit(lg)) if expr is None else expr.when(cond, F.lit(lg))
    return d.select(
        "doc_id",
        expr.alias("predicted"),
        (expr == F.col("lang")).alias("hit"),
    )


@register(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_words,
           round(CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) - 1e-9, {_R}) + 0.0
             AS chars_per_word,
           round(CAST(len(list_filter(string_split(text, ' '),
                          x -> x IN {STOPWORDS})) AS DOUBLE)
                 / len(string_split(text, ' ')) - 1e-9, {_R}) + 0.0 AS stopword_ratio,
           round(least(1.0, len(string_split(text, ' ')) / 50.0)
                 * (1.0 - CAST(len(list_filter(string_split(text, ' '),
                               x -> x IN {STOPWORDS})) AS DOUBLE)
                          / len(string_split(text, ' '))) - 1e-9, {_R}) + 0.0 AS quality
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: word count, chars/word, stopword
    ratio, combined into [0,1].  The filter-lambda runs inside
    codegen (no Python)."""
    d = load_table(spark, sf_dir, "documents")
    arr = F.split("text", " ")
    n_words = F.size(arr).cast("long")
    stop_n = F.size(F.filter(arr, lambda x: x.isin(*STOPWORDS))).cast("double")
    stop_ratio = stop_n / n_words
    quality = F.least(F.lit(1.0), n_words / F.lit(50.0)) * (F.lit(1.0) - stop_ratio)
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(F.col("n_chars").cast("double") / n_words - 1e-9, _R).alias(
            "chars_per_word"
        ),
        F.round(stop_ratio - 1e-9, _R).alias("stopword_ratio"),
        F.round(quality - 1e-9, _R).alias("quality"),
    )


@register(
    "text_token_count",
    oracle="""
    SELECT lang,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT)   AS ws_tokens,
           CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')))
                AS BIGINT) AS bpe_ish_tokens,
           count(*) AS n_docs
    FROM documents
    GROUP BY lang
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways — whitespace split and a BPE-ish regex
    lexer (letter runs / digit runs / single other chars) — rolled up
    per language.  Counts aggregate map-side; the shuffle carries 5
    rows."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.size(F.split("text", " ")).cast("long")
    bpe = F.size(
        F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
    ).cast("long")
    return d.groupBy("lang").agg(
        F.sum(ws).alias("ws_tokens"),
        F.sum(bpe).alias("bpe_ish_tokens"),
        F.count("*").alias("n_docs"),
    )


@register(
    "text_fingerprint",
    oracle=f"""
    WITH tids AS (
      SELECT doc_id,
             list_transform(string_split(text, ' '),
                            x -> {_H_SQL.format(x="x")} % {_FP_MOD}) AS tid
      FROM documents
    )
    SELECT doc_id,
           list_min(list_transform(generate_series(1, len(tid) - 3),
             i -> tid[i] * {_FP_B**3} + tid[i+1] * {_FP_B**2}
                  + tid[i+2] * {_FP_B} + tid[i+3])) AS fingerprint
    FROM tids
    WHERE len(tid) >= 4
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: min of rolling polynomial hashes over
    4-token windows (winnowing-lite).  Exact integer arithmetic —
    token id < 2^20, polynomial < 2^44 — so both engines compute the
    identical 64-bit fingerprint.  Narrow op; dedup on fingerprints
    is then an 8-byte groupBy."""
    d = load_table(spark, sf_dir, "documents")
    fp = rolling_fingerprint(F.col("text"), window=4)
    return (
        d.select("doc_id", fp.alias("fingerprint"))
        .filter(F.col("fingerprint").isNotNull())
    )


@register(
    "text_tfidf_top_term",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term AS top_term, round(tfidf - 1e-9, {_R}) + 0.0 AS tfidf
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, term) AS rnk
          FROM scored)
    WHERE rnk = 1
    """,
)
def text_tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-rolled TF-IDF, most-distinctive term per document.
    Two token-level groupBys (tf, df) + a broadcast of the df table
    (vocabulary-sized, small) + per-doc top-1 window.  The ml-lib
    HashingTF+IDF pipeline is the feature-vector variant; this SQL
    formulation is the one that oracle-checks exactly."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "doc_id",
            F.col("term").alias("top_term"),
            F.round(F.col("tfidf") - 1e-9, _R).alias("tfidf"),
        )
    )


@register(
    "text_unigram_surprisal",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    cnt AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
    tot AS (SELECT sum(c) AS n FROM cnt)
    SELECT doc_id,
           count(*) AS n_tokens,
           round(sum(-ln(CAST(c AS DOUBLE) / n)) - 1e-9, {_R}) + 0.0
             AS surprisal,
           round(sum(-ln(CAST(c AS DOUBLE) / n)) / count(*) - 1e-9, {_R}) + 0.0
             AS bits_per_token
    FROM tok JOIN cnt USING (term) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram LM surprisal per document — the cheapest perplexity
    proxy for quality filtering (gibberish scores high, boilerplate
    low).  Corpus term counts are one token-level agg whose shuffle
    carries the vocabulary; they join back per token via broadcast,
    and the per-doc sum is a second partial agg.  Two shuffles total,
    both on keys orders of magnitude smaller than the corpus."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    cnt = tok.groupBy("term").agg(F.count("*").alias("c"))
    tot = cnt.agg(F.sum("c").alias("n"))
    s = -F.log(F.col("c").cast("double") / F.col("n"))
    return (
        tok.join(F.broadcast(cnt), "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum(s) - 1e-9, _R).alias("surprisal"),
            F.round(F.sum(s) / F.count("*") - 1e-9, _R).alias("bits_per_token"),
        )
    )


@register(
    "text_zipf_fit",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ), cnt AS (
      SELECT token, count(*) AS c FROM tok GROUP BY token
    ), ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, token) AS r
      FROM cnt ORDER BY c DESC, token LIMIT 1000
    )
    SELECT round(regr_slope(ln(c), ln(r)) - 1e-9, 4) + 0.0     AS zipf_slope,
           round(regr_intercept(ln(c), ln(r)) - 1e-9, 4) + 0.0 AS zipf_intercept,
           CAST(count(*) AS BIGINT)                            AS n_ranked
    FROM ranked
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus token distribution — the
    corpus-health diagnostic (natural text gives slope near -1;
    boilerplate-heavy or synthetic corpora flatten or steepen it).
    Tokens are counted distributed (map-side partials), then only the
    top-1000 vocabulary rows pass through TakeOrderedAndProject to a
    single-task ranking — the corpus never sorts globally, so the
    plan is corpus-size-independent past the count.  The fit itself
    is the decomposable regr_slope/regr_intercept aggregate over
    (ln rank, ln count)."""
    d = load_table(spark, sf_dir, "documents")
    cnt = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("c"))
    )
    ranked = (
        cnt.orderBy(F.desc("c"), "token")
        .limit(1000)
        .select(
            "c",
            F.row_number()
            .over(Window.orderBy(F.desc("c"), "token"))
            .alias("r"),
        )
    )
    lnc, lnr = F.log(F.col("c").cast("double")), F.log(F.col("r").cast("double"))
    return ranked.agg(
        F.round(F.regr_slope(lnc, lnr) - 1e-9, 4).alias("zipf_slope"),
        F.round(F.regr_intercept(lnc, lnr) - 1e-9, 4).alias("zipf_intercept"),
        F.count("*").alias("n_ranked"),
    )


@register(
    "text_oov_rate",
    oracle=f"""
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
    ), vocab AS (
      SELECT token FROM (
        SELECT token, count(*) AS c FROM tok GROUP BY token
        ORDER BY c DESC, token LIMIT 500
      )
    )
    SELECT lang,
           count(*) AS n_tokens,
           count(*) FILTER (WHERE v.token IS NULL) AS n_oov,
           round((CAST(count(*) FILTER (WHERE v.token IS NULL) AS DOUBLE)
                  / count(*)) - 1e-9, {_R}) + 0.0 AS oov_rate
    FROM tok t LEFT JOIN vocab v ON t.token = v.token
    GROUP BY lang
    """,
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per language against a top-500
    frequency vocabulary — the tokenizer-coverage metric run before
    committing to a vocab.  The vocab is built with
    TakeOrderedAndProject (the corpus never sorts globally) and then
    BROADCAST to the token stream: the big side is joined without a
    shuffle, and the per-language rates are one hash aggregate.  The
    same plan at 100 TB: vocab is always tiny, tokens always stream."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(F.split("text", " ")).alias("token"))
    vocab = (
        tok.groupBy("token")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "token")
        .limit(500)
        .select(F.col("token").alias("v_token"))
    )
    j = tok.join(
        F.broadcast(vocab), F.col("token") == F.col("v_token"), "left"
    )
    oov = F.col("v_token").isNull()
    return j.groupBy("lang").agg(
        F.count("*").alias("n_tokens"),
        F.count_if(oov).alias("n_oov"),
        F.round(
            F.count_if(oov).cast("double") / F.count("*") - 1e-9, _R
        ).alias("oov_rate"),
    )


@register(
    "text_repetition_metrics",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(t) - 1),
                    i -> t[i] || '|' || t[i+1])) AS pair
      FROM t
    ),
    c AS (SELECT doc_id, pair, count(*) AS c FROM bg GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_bigrams,
           round(CAST(max(c) AS DOUBLE) / sum(c) - 1e-9, {_R}) + 0.0
             AS top_bigram_frac,
           round(CAST(sum(c) - count(*) AS DOUBLE) / sum(c) - 1e-9, {_R}) + 0.0
             AS dup_bigram_frac
    FROM c GROUP BY doc_id
    """,
)
def text_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition signals — the Gopher/MassiveText
    quality rules that catch boilerplate and degenerate generations:
    per document, the fraction of bigram instances claimed by the
    single most frequent bigram (top_bigram_frac) and the fraction
    that are repeats of an earlier instance (dup_bigram_frac).  One
    explode feeding one (doc_id, pair) partial-agg shuffle, then a
    per-doc rollup of the counts table — token instances never cross
    the wire, only (doc, pair, count) rows, so the operator is the
    same two-exchange shape at any corpus size.  Docs with fewer
    than two tokens have no bigrams and are excluded (identically in
    the oracle)."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    n = F.size(t)
    bigrams = F.arrays_zip(
        F.slice(t, 1, n - 1).alias("a"), F.slice(t, 2, n - 1).alias("b")
    )
    counts = (
        d.filter(n >= 2)
        .select("doc_id", F.explode(bigrams).alias("bg"))
        .select(
            "doc_id",
            F.concat_ws("|", F.col("bg.a"), F.col("bg.b")).alias("pair"),
        )
        .groupBy("doc_id", "pair")
        .agg(F.count("*").alias("c"))
    )
    tot = F.sum("c").cast("double")
    return counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.round(F.max("c") / tot - 1e-9, _R).alias("top_bigram_frac"),
        F.round((F.sum("c") - F.count("*")) / tot - 1e-9, _R).alias(
            "dup_bigram_frac"
        ),
    )


# Inverted-index cosine: stop-term cut bounds per-term posting lists
# (a term in more than max(floor, frac·n) docs contributes C(df,2)
# candidate pairs — the quadratic fan-out a hot term would cause).
_CS_DF_MIN = 5
_CS_DF_FRAC = 0.05
_CS_THRESHOLD = 0.35


@register(
    "text_tfidf_cosine_pairs",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    kept AS (
      SELECT term, df FROM df CROSS JOIN n
      WHERE df <= greatest({_CS_DF_MIN}, {_CS_DF_FRAC} * n_docs)
    ),
    w AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * ln(CAST(n.n_docs AS DOUBLE) / kept.df) AS w
      FROM tf JOIN kept USING (term) CROSS JOIN n
    ),
    norms AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id),
    dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.w * b.w) AS dot
      FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           round(dot / nullif(na.nrm * nb.nrm, 0) - 1e-9, {_R}) + 0.0
             AS cosine
    FROM dots
    JOIN norms na ON na.doc_id = doc_a
    JOIN norms nb ON nb.doc_id = doc_b
    WHERE dot / nullif(na.nrm * nb.nrm, 0) >= {_CS_THRESHOLD}
    """,
)
def text_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine similarity pairs via an inverted-index
    join — the WEIGHTED complement to dedup_ngram_jaccard's set
    similarity, and the scale shape behind 'find documents about the
    same thing' (vs near-verbatim duplicates).  No document ever
    meets another except through a shared term: candidate pairs are
    posting-list collisions, never n².  The stop-term cut (df above
    max(_CS_DF_MIN, _CS_DF_FRAC of the corpus) is removed BEFORE the join, in both
    engines) bounds every posting list, making the worst-case join
    fan-out Σ C(df_cap, 2) per term — the same discipline the
    jaccard and minhash pipelines enforce.  Weights, norms, and the
    pairwise dot all live on the pruned vocabulary, so cosine stays
    a true cosine (≤ 1) of the pruned vectors.  Three token-level
    aggs + one posting-list self-join + two |docs|-row broadcast
    joins for the norms."""
    _evict_retained()
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    kept = (
        df.crossJoin(F.broadcast(n))
        .filter(
            F.col("df")
            <= F.greatest(F.lit(_CS_DF_MIN), F.lit(_CS_DF_FRAC) * F.col("n_docs"))
        )
        .select("term", "df")
    )
    w = (
        tf.join(kept, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df"))
            ).alias("w"),
        )
        .cache()
    )
    _retain(w)
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    # a zero norm needs a doc whose kept terms ALL have idf = 0 —
    # impossible while the stop-term cut keeps df < n_docs, but on a
    # degenerate <= _CS_DF_MIN-doc corpus it can happen: nullif-guard
    # (NULL cosine fails the threshold filter in both engines) rather
    # than raising DIVIDE_BY_ZERO under ANSI.
    cos = F.col("dot") / F.nullif(
        F.col("na.nrm") * F.col("nb.nrm"), F.lit(0.0)
    )
    return (
        dots.join(F.broadcast(norms).alias("na"),
                  F.col("na.doc_id") == F.col("doc_a"))
        .join(F.broadcast(norms).alias("nb"),
              F.col("nb.doc_id") == F.col("doc_b"))
        .filter(cos >= _CS_THRESHOLD)
        .select(
            "doc_a", "doc_b",
            (F.round(cos - 1e-9, _R) + 0.0).alias("cosine"),
        )
    )


@register(
    "text_bigram_perplexity",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, pos, term FROM (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS term,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
      )
    ),
    big AS (
      SELECT doc_id, term AS w2,
             lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
      FROM tok
    ),
    bp AS (SELECT doc_id, w1, w2 FROM big WHERE w1 IS NOT NULL),
    c2 AS (SELECT w1, w2, count(*) AS c FROM bp GROUP BY w1, w2),
    c1 AS (SELECT term AS w1, count(*) AS c FROM tok GROUP BY term),
    v AS (SELECT count(DISTINCT term) AS vs FROM tok)
    SELECT bp.doc_id,
           count(*) AS n_bigrams,
           round(exp(-avg(ln(
             (c2.c + 1.0) / (c1.c + v.vs)
           ))) - 1e-9, {_R}) + 0.0 AS ppl_bigram
    FROM bp
    JOIN c2 ON c2.w1 = bp.w1 AND c2.w2 = bp.w2
    JOIN c1 ON c1.w1 = bp.w1
    CROSS JOIN v
    GROUP BY bp.doc_id
    """,
)
def text_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity per document with add-1 smoothing — one
    order up from text_unigram_surprisal, and a materially better
    gibberish/boilerplate detector (word-ORDER likelihood, not just
    word frequency).  Token positions come from posexplode; bigrams
    from a per-doc lag window (bounded by document length); corpus
    bigram counts join back on (w1, w2) — vocabulary-squared-bounded
    in principle but token-count-bounded in fact, so the join is a
    plain shuffle join, with the unigram table and the scalar |V|
    riding broadcasts.  exp∘−avg∘ln keeps the whole likelihood in
    codegen on both engines."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bp = (
        tok.select("doc_id", F.col("term").alias("w2"),
                   F.lag("term").over(w).alias("w1"))
        .where(F.col("w1").isNotNull())
    )
    c2 = bp.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = tok.groupBy(F.col("term").alias("w1")).agg(F.count("*").alias("c1"))
    v = tok.agg(F.countDistinct("term").alias("vs"))
    p = (F.col("c2") + 1.0) / (F.col("c1") + F.col("vs"))
    return (
        bp.join(c2, ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            (F.round(F.exp(-F.avg(F.log(p))) - 1e-9, _R) + 0.0).alias(
                "ppl_bigram"
            ),
        )
    )


_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_N_QUERIES = 10  # query docs: doc_id < 10
_BM25_TOP = 3


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
      ) GROUP BY doc_id, tok
    ),
    dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
    ),
    stats AS (
      SELECT count(*) AS n, avg(dl) AS avgdl FROM dl
    ),
    df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    idf AS (
      SELECT tok, ln((n - df + 0.5) / (df + 0.5) + 1.0) AS idf
      FROM df CROSS JOIN stats
    ),
    qterm AS (
      SELECT DISTINCT doc_id AS query_id, tok FROM tf
      WHERE doc_id < {_BM25_N_QUERIES}
    ),
    contrib AS (
      SELECT q.query_id, t.doc_id,
             i.idf * t.tf * ({_BM25_K1} + 1.0)
               / (t.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                  + {_BM25_B} * d.dl / s.avgdl)) AS c
      FROM qterm q
      JOIN tf t ON t.tok = q.tok AND t.doc_id <> q.query_id
      JOIN idf i ON i.tok = q.tok
      JOIN dl d ON d.doc_id = t.doc_id
      CROSS JOIN stats s
    ),
    scored AS (
      SELECT query_id, doc_id, sum(c) AS score
      FROM contrib GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id AS match_id,
           round(score - 1e-9, 4) + 0.0 AS bm25, rnk
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id
        ORDER BY round(score, 6) DESC, doc_id) AS rnk
      FROM scored)
    WHERE rnk <= {_BM25_TOP}
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval: each query document (doc_id < 10, its distinct
    tokens as the query) scores the corpus through an inverted index
    and keeps its top-3 matches — the lexical-retrieval operator
    behind dedup-by-retrieval and RAG-corpus curation.

    Scale shape: term frequencies are one (doc, tok) partial-agg
    shuffle; document frequency and idf are one more groupBy over the
    postings; the corpus-wide (N, avgdl) pair is a 1-row broadcast
    attach; scoring joins the Q·|terms| query list against the
    postings ON THE TERM KEY — cost proportional to the postings hit
    by query terms (inverted-index probe), never |queries| × |docs| —
    then one (query, doc) partial agg and a per-query top-k window
    over score-ranked candidates.  Ranking uses round(score, 6) with
    doc_id tie-break so both engines order identically despite
    float-sum reordering across partitions."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    dl = d.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    )
    df_ = tf.groupBy("tok").agg(F.count("*").alias("df"))
    idf = df_.crossJoin(F.broadcast(stats)).select(
        "tok",
        F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
              ).alias("idf"),
        "avgdl",
    )
    qterm = (
        tf.filter(F.col("doc_id") < _BM25_N_QUERIES)
        .select(F.col("doc_id").alias("query_id"), "tok")
        .distinct()
    )
    contrib = (
        qterm.join(tf, "tok")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(idf, "tok")
        .join(dl, "doc_id")
        .select(
            "query_id",
            "doc_id",
            (
                F.col("idf") * F.col("tf") * (_BM25_K1 + 1.0)
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("c"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("c").alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _BM25_TOP)
        .select(
            "query_id",
            F.col("doc_id").alias("match_id"),
            (F.round(F.col("score") - 1e-9, 4) + F.lit(0.0)).alias("bm25"),
            "rnk",
        )
    )


_PMI_MIN_COUNT = 5
_PMI_TOP_K = 20


@register(
    "text_pmi_collocations",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, pos, term FROM (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS term,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
      )
    ),
    bp AS (
      SELECT w1, w2 FROM (
        SELECT term AS w2,
               lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
        FROM tok
      ) WHERE w1 IS NOT NULL
    ),
    c2 AS (SELECT w1, w2, count(*) AS pair_count FROM bp GROUP BY w1, w2),
    c1 AS (SELECT term AS w, count(*) AS c1 FROM tok GROUP BY term),
    nb AS (SELECT count(*) AS nb FROM bp),
    nu AS (SELECT count(*) AS nu FROM tok)
    SELECT w1, w2, pair_count,
           round(ln(pair_count) + 2 * ln(nu) - ln(nb) - ln(a.c1) - ln(b.c1)
                 - 1e-9, {_R}) + 0.0 AS pmi
    FROM c2
    JOIN c1 a ON a.w = c2.w1
    JOIN c1 b ON b.w = c2.w2
    CROSS JOIN nb CROSS JOIN nu
    WHERE pair_count >= {_PMI_MIN_COUNT}
    ORDER BY pmi DESC, w1, w2
    LIMIT {_PMI_TOP_K}
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information — the
    top-{_PMI_TOP_K} adjacent word pairs that co-occur far more than
    their unigram frequencies predict (multi-word expressions,
    boilerplate phrases, the classic corpus-linguistics screen before
    tokenizer-vocabulary decisions).  PMI = ln p(a,b) − ln p(a) −
    ln p(b), computed in pure log-count arithmetic so both engines
    evaluate the identical expression; ranking is on the ROUNDED
    statistic with the (w1, w2) tiebreak per repo discipline.

    Scale shape: bigram counts come from a per-document lag window
    (bounded by document length) feeding a partial hash agg, so the
    shuffle carries pair counts, never tokens; the min-count filter
    runs BEFORE the unigram joins; the two corpus totals ride 1-row
    broadcast attaches; the top-k plans as TakeOrderedAndProject.
    Nothing here is wider than the pair-vocabulary exchange at any
    corpus size."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bp = tok.select(
        F.col("term").alias("w2"), F.lag("term").over(w).alias("w1")
    ).where(F.col("w1").isNotNull())
    c2 = bp.groupBy("w1", "w2").agg(F.count("*").alias("pair_count"))
    c1 = tok.groupBy(F.col("term").alias("w")).agg(F.count("*").alias("c1"))
    nb = bp.agg(F.count("*").alias("nb"))
    nu = tok.agg(F.count("*").alias("nu"))
    pmi = (
        F.log("pair_count")
        + 2 * F.log("nu")
        - F.log("nb")
        - F.log("a.c1")
        - F.log("b.c1")
    )
    return (
        c2.filter(F.col("pair_count") >= _PMI_MIN_COUNT)
        .join(F.broadcast(c1).alias("a"), F.col("a.w") == F.col("w1"))
        .join(F.broadcast(c1).alias("b"), F.col("b.w") == F.col("w2"))
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nu))
        .select(
            "w1", "w2", "pair_count",
            (F.round(pmi - 1e-9, _R) + 0.0).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(_PMI_TOP_K)
    )


@register(
    "text_readability",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS DOUBLE) AS sentences,
             CAST(greatest(len(regexp_extract_all(lower(text),
                                                  '[aeiouy]+')), 1)
                  AS DOUBLE) AS syllables
      FROM documents
    )
    SELECT doc_id,
           CAST(words AS BIGINT) AS n_words,
           CAST(sentences AS BIGINT) AS n_sentences,
           CAST(syllables AS BIGINT) AS n_syllables,
           round(206.835 - 1.015 * (words / sentences)
                 - 84.6 * (syllables / words) - 1e-9, {_R}) + 0.0
             AS flesch_reading_ease,
           round(0.39 * (words / sentences)
                 + 11.8 * (syllables / words) - 15.59 - 1e-9, {_R}) + 0.0
             AS fk_grade_level
    FROM m
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease + Flesch-Kincaid grade level per document,
    with the standard cheap proxies (sentences = terminal-punctuation
    runs, min 1; syllables = vowel-group runs, min 1) — the
    readability screen a pretraining quality pipeline runs alongside
    text_quality_score (which measures lexical form, not reading
    difficulty).  Both formulas are the published closed forms over
    three counts.

    Scale shape: pure codegen projection — two regexp_extract_all
    counts and a split-length per row, no shuffle at all until a
    consumer aggregates.  Counts are exact integers on both engines
    (the regex classes are ASCII and the fixture corpus is ASCII);
    only the two scores round."""
    d = load_table(spark, sf_dir, "documents")
    words = F.size(F.split("text", " ")).cast("double")
    sentences = F.greatest(
        F.size(F.expr(r"regexp_extract_all(text, '[.!?]+', 0)")),
        F.lit(1),
    ).cast("double")
    syllables = F.greatest(
        F.size(F.expr(r"regexp_extract_all(lower(text), '[aeiouy]+', 0)")),
        F.lit(1),
    ).cast("double")
    fre = 206.835 - 1.015 * (words / sentences) - 84.6 * (
        syllables / words
    )
    fkgl = 0.39 * (words / sentences) + 11.8 * (syllables / words) - 15.59
    return d.select(
        "doc_id",
        words.cast("long").alias("n_words"),
        sentences.cast("long").alias("n_sentences"),
        syllables.cast("long").alias("n_syllables"),
        (F.round(fre - 1e-9, _R) + 0.0).alias("flesch_reading_ease"),
        (F.round(fkgl - 1e-9, _R) + 0.0).alias("fk_grade_level"),
    )


_JS_SRC_A = "src1"
_JS_SRC_B = "src2"
_JS_SMOOTH = 0.5  # additive smoothing pseudo-count


@register(
    "text_js_divergence",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS term
      FROM documents WHERE source IN ('{_JS_SRC_A}', '{_JS_SRC_B}')
    ),
    counts AS (
      SELECT term,
             CAST(count(CASE WHEN source = '{_JS_SRC_A}' THEN 1 END)
                  AS DOUBLE) AS ca,
             CAST(count(CASE WHEN source = '{_JS_SRC_B}' THEN 1 END)
                  AS DOUBLE) AS cb
      FROM toks GROUP BY term
    ),
    tot AS (
      SELECT CAST(sum(ca) AS DOUBLE) AS na,
             CAST(sum(cb) AS DOUBLE) AS nb,
             CAST(count(*) AS DOUBLE) AS v
      FROM counts
    ),
    probs AS (
      SELECT (ca + {_JS_SMOOTH}) / (na + {_JS_SMOOTH} * v) AS pa,
             (cb + {_JS_SMOOTH}) / (nb + {_JS_SMOOTH} * v) AS pb,
             na, nb, v
      FROM counts, tot
    )
    SELECT CAST(max(v) AS BIGINT) AS vocab_size,
           CAST(max(na) AS BIGINT) AS n_tokens_a,
           CAST(max(nb) AS BIGINT) AS n_tokens_b,
           round(sum(0.5 * pa * ln(pa / ((pa + pb) / 2))
                     + 0.5 * pb * ln(pb / ((pa + pb) / 2)))
                 / ln(2) - 1e-9, {_R}) + 0.0 AS js_divergence_bits
    FROM probs
    """,
)
def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between two sources' unigram
    distributions (smoothed, in bits) — the symmetric, bounded
    [0, 1] drift measure for TEXT corpora, answering 'how different
    is what {_JS_SRC_A} sends vs {_JS_SRC_B}' the way dq_psi_drift
    answers it for numeric columns.  The quantity mixture designers
    watch when deciding whether two sources are near-duplicates of
    each other (JS → 0) or genuinely complementary.

    Scale shape: the token explode collapses to per-term pair counts
    in ONE partial-agg shuffle; the (na, nb, |V|) normalizer is a
    1-row aggregate of that vocabulary table attached by broadcast;
    the divergence is one more vocabulary-sized reduce.  Smoothing
    makes every term present in both distributions, so no ln(0)
    exists on either engine; the identical expression tree runs on
    exact counts."""
    toks = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("source").isin(_JS_SRC_A, _JS_SRC_B))
        .select(
            "source", F.explode(F.split("text", " ")).alias("term")
        )
    )
    counts = toks.groupBy("term").agg(
        F.count(F.when(F.col("source") == _JS_SRC_A, 1))
        .cast("double")
        .alias("ca"),
        F.count(F.when(F.col("source") == _JS_SRC_B, 1))
        .cast("double")
        .alias("cb"),
    )
    tot = counts.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.count("*").cast("double").alias("v"),
    )
    j = counts.crossJoin(F.broadcast(tot))
    pa = (F.col("ca") + _JS_SMOOTH) / (
        F.col("na") + _JS_SMOOTH * F.col("v")
    )
    pb = (F.col("cb") + _JS_SMOOTH) / (
        F.col("nb") + _JS_SMOOTH * F.col("v")
    )
    m = (pa + pb) / 2
    term_js = 0.5 * pa * F.log(pa / m) + 0.5 * pb * F.log(pb / m)
    import math

    return j.agg(
        F.max("v").cast("long").alias("vocab_size"),
        F.max("na").cast("long").alias("n_tokens_a"),
        F.max("nb").cast("long").alias("n_tokens_b"),
        (
            F.round(F.sum(term_js) / math.log(2) - 1e-9, _R) + 0.0
        ).alias("js_divergence_bits"),
    )


@register(
    "text_lexical_diversity",
    oracle=f"""
    WITH tc AS (
      SELECT source, term, CAST(count(*) AS DOUBLE) AS c
      FROM (
        SELECT source, unnest(string_split(text, ' ')) AS term
        FROM documents
      ) GROUP BY source, term
    )
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           round(count(*) / sum(c) - 1e-9, {_R}) + 0.0
             AS type_token_ratio,
           round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) / CAST(count(*)
                 AS DOUBLE) - 1e-9, {_R}) + 0.0 AS hapax_ratio,
           round(10000.0 * (sum(c * c) - sum(c)) / (sum(c) * sum(c))
                 - 1e-9, {_R}) + 0.0 AS yule_k
    FROM tc GROUP BY source ORDER BY source
    """,
)
def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity profile per source: type-token ratio, hapax
    (frequency-1) share of the vocabulary, and Yule's K = 10⁴·
    (Σc²−N)/N² — the repetitiveness characteristic that, unlike TTR,
    is insensitive to corpus length.  The corpus-level companion to
    the per-document text_repetition_metrics: mixture designers read
    these three to spot template-generated or boilerplate-heavy
    sources before they flood a training mix (low TTR + low hapax +
    high K = machine-generated suspicion).

    Scale shape: tokenize-explode collapses straight into a
    (source, term) partial-agg — the only shuffle, carrying the
    per-source vocabulary, never token instances — then a per-source
    reduce over type counts.  All moments (N, V, V₁, Σc²) are exact
    integers; the three ratios round at the output boundary only."""
    toks = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("term"))
    )
    tc = toks.groupBy("source", "term").agg(
        F.count("*").cast("double").alias("c")
    )
    c = F.col("c")
    n = F.sum(c)
    v = F.count("*")
    hap = F.sum(F.when(c == 1, 1).otherwise(0))
    return (
        tc.groupBy("source")
        .agg(
            n.cast("long").alias("n_tokens"),
            v.cast("long").alias("n_types"),
            hap.cast("long").alias("n_hapax"),
            (F.round(v / n - 1e-9, _R) + 0.0).alias("type_token_ratio"),
            (
                F.round(hap / v.cast("double") - 1e-9, _R) + 0.0
            ).alias("hapax_ratio"),
            (
                F.round(
                    10000.0 * (F.sum(c * c) - n) / (n * n) - 1e-9, _R
                )
                + 0.0
            ).alias("yule_k"),
        )
        .orderBy("source")
    )


_RAKE_TOPK = 15
_STOP_SQL = "('" + "', '".join(STOPWORDS) + "')"


@register(
    "text_keyphrase_rake",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) AS pos,
             unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    marked AS (
      SELECT doc_id, pos, w,
             CASE WHEN w IN {_STOP_SQL} THEN 1 ELSE 0 END AS st,
             sum(CASE WHEN w IN {_STOP_SQL} THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS pid
      FROM tok
    ),
    member AS (
      SELECT doc_id, pid, pos, w FROM marked WHERE st = 0 AND w <> ''
    ),
    ph AS (
      SELECT doc_id, pid, count(*) AS plen
      FROM member GROUP BY doc_id, pid
    ),
    wstat AS (
      SELECT m.w, count(*) AS freq, sum(ph.plen) AS deg
      FROM member m
      JOIN ph ON ph.doc_id = m.doc_id AND ph.pid = m.pid
      GROUP BY m.w
    ),
    scored AS (
      SELECT m.doc_id, m.pid,
             string_agg(m.w, ' ' ORDER BY m.pos) AS phrase,
             sum(CAST(ws.deg AS DOUBLE) / ws.freq) AS score
      FROM member m JOIN wstat ws ON ws.w = m.w
      GROUP BY m.doc_id, m.pid
    )
    SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
           round(max(score) - 1e-9, {_R}) + 0.0 AS rake_score
    FROM scored GROUP BY phrase
    ORDER BY rake_score DESC, phrase LIMIT {_RAKE_TOPK}
    """,
)
def text_keyphrase_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010): candidate
    phrases are maximal stopword-free token runs; each word scores
    deg/freq (deg = summed length of the phrases it appears in,
    freq = its occurrence count); a phrase scores the sum of its
    member word scores.  Reports the corpus top-{_RAKE_TOPK}
    phrases — the unsupervised keyword table a corpus curator reads
    before naming a source's topical clusters.

    Scale shape: phrase segmentation is a PER-DOCUMENT running
    count of stopword boundaries (window partitioned by doc —
    millions of tiny groups, no global sort); word statistics and
    phrase scores are two keyed groupBys plus a vocabulary-keyed
    join, all partial-aggregated; the final top-k lowers to
    TakeOrderedAndProject (per-partition heaps).  Nothing holds a
    document's tokens in one row after the explode, so arbitrarily
    long documents shard freely.  Scores order on the ROUNDED value
    with a lexicographic phrase tiebreak, so the cut line cannot
    diverge between engines.

    r15 exchange-width pass (guide §2.2): the sf1 profile showed the
    doc_id window exchange (41 MB) AQE-coalesced to ONE task with its
    three consumers (ph, wstat partials, scored) each re-reading it
    single-task — 8.2 s of the 9.7 s query in three 1-task stages —
    and AQE flip-flopping between broadcasting the vocabulary-sized
    wstat and a (single-task-coalesced) sort-merge join, a
    2.4-vs-9.5 s coin toss per run.  Both exchanges are now pinned:
    an explicit repartition(2·parallelism, doc_id) feeds the window
    (the window and both (doc_id, pid) aggregates reuse it — no
    exchange added, only the coalescible implicit one replaced), and
    the word-score attach is a SHUFFLE_HASH join co-partitioned on w
    at the same explicit width — vocabulary grows with the corpus
    (Heaps' law), so a broadcast assumption would not survive 100 TB,
    and the deterministic shuffled-hash plan beats the AQE coin
    toss's average anyway.  A/B (one warm session, interleaved,
    identity-checked): sf1 base 8.5–12.6 s / doc_id-pin only
    2.4–9.9 s bimodal / this shape 5.9–6.9 s stable; sf0.1 parity
    (1.60 vs 1.67 best)."""
    docs = load_table(spark, sf_dir, "documents")
    par2 = 2 * spark.sparkContext.defaultParallelism
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    ).repartition(par2, "doc_id")
    st = F.col("w").isin(*STOPWORDS).cast("long")
    wd = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = tok.select(
        "doc_id", "pos", "w", st.alias("st"), F.sum(st).over(wd).alias("pid")
    )
    member = marked.filter((F.col("st") == 0) & (F.col("w") != "")).select(
        "doc_id", "pid", "pos", "w"
    )
    ph = member.groupBy("doc_id", "pid").agg(F.count("*").alias("plen"))
    wstat = (
        member.join(ph, ["doc_id", "pid"])
        .groupBy("w")
        .agg(F.count("*").alias("freq"), F.sum("plen").alias("deg"))
    )
    scored = (
        member.repartition(par2, "w")
        .join(wstat.hint("shuffle_hash"), "w")
        .groupBy("doc_id", "pid")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s.getField("w"),
                ),
                " ",
            ).alias("phrase"),
            F.sum(F.col("deg").cast("double") / F.col("freq"))
            .alias("score"),
        )
    )
    return (
        scored.groupBy("phrase")
        .agg(
            F.count("*").alias("n_occurrences"),
            (F.round(F.max("score") - 1e-9, _R) + 0.0).alias("rake_score"),
        )
        .orderBy(F.desc("rake_score"), "phrase")
        .limit(_RAKE_TOPK)
    )
