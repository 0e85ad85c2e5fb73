"""Text-analysis operators (SURVEY.md section 2B): quality scoring,
language ID, token counting, document fingerprinting.

Everything is built-in column expressions (codegen, vectorized); the
same regexes/word lists are inlined into the DuckDB oracles.  DuckDB's
regexp_replace needs the explicit 'g' flag to match Spark's
replace-all default.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from near_indexer_for_explorer_spark.functions.text import (
    BPE_ISH_RE,
    STOPWORDS_DE,
    STOPWORDS_EN,
    STOPWORDS_ES,
    STOPWORDS_FR,
    stopword_hits,
    tokens,
    word_shingles,
    word_shingles_sql,
)
from near_indexer_for_explorer_spark.sources.tables import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _sql_list(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


# ---------------------------------------------------------------------------
# B7 quality scoring
# ---------------------------------------------------------------------------
ORACLES["text_quality"] = f"""
    WITH t AS (
      SELECT doc_id,
             length(text) AS n_chars_raw,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
             length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                             x -> x IN ({_sql_list(STOPWORDS_EN)}))) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST(n_alpha AS DOUBLE) / n_chars_raw AS alpha_ratio,
           CAST(n_punct AS DOUBLE) / n_chars_raw AS punct_ratio,
           CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
           LEAST(1.0, n_tokens / 200.0) * 0.5
             + (CAST(n_alpha AS DOUBLE) / n_chars_raw) * 0.3
             + (CAST(n_stop AS DOUBLE) / n_tokens) * 0.2 AS quality_score
    FROM t
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score from length/alpha/punct/stopword ratios
    (the C4/Gopher-style rule family, as pure column arithmetic)."""
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    tok = F.col("t")
    n_chars = F.length("text")
    n_tokens = F.size(tok)
    n_alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace("text", "[^.,;:!?]", ""))
    n_stop = stopword_hits("t", STOPWORDS_EN)
    alpha_ratio = n_alpha.cast("double") / n_chars
    punct_ratio = n_punct.cast("double") / n_chars
    stop_ratio = n_stop.cast("double") / n_tokens
    quality = (
        F.least(F.lit(1.0), n_tokens / F.lit(200.0)) * 0.5
        + alpha_ratio * 0.3
        + stop_ratio * 0.2
    )
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        alpha_ratio.alias("alpha_ratio"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality_score"),
    )


QUERIES["text_quality"] = text_quality


# ---------------------------------------------------------------------------
# B8 language ID
# ---------------------------------------------------------------------------
ORACLES["text_lang_id"] = f"""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '\\s+') AS tok
      FROM documents
    ), s AS (
      SELECT doc_id,
             len(list_filter(tok, x -> x IN ({_sql_list(STOPWORDS_EN)}))) AS s_en,
             len(list_filter(tok, x -> x IN ({_sql_list(STOPWORDS_DE)}))) AS s_de,
             len(list_filter(tok, x -> x IN ({_sql_list(STOPWORDS_FR)}))) AS s_fr,
             len(list_filter(tok, x -> x IN ({_sql_list(STOPWORDS_ES)}))) AS s_es
      FROM t
    )
    SELECT doc_id, s_en, s_de, s_fr, s_es,
           CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
                WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
                WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
                WHEN s_es > 0 THEN 'es'
                ELSE 'unknown' END AS lang_pred
    FROM s
"""


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit argmax language ID with a fixed tie-break precedence
    (en > de > fr > es > unknown) so the prediction is deterministic."""
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    tok = F.col("t")
    scored = docs.select(
        "doc_id",
        stopword_hits("t", STOPWORDS_EN).cast("long").alias("s_en"),
        stopword_hits("t", STOPWORDS_DE).cast("long").alias("s_de"),
        stopword_hits("t", STOPWORDS_FR).cast("long").alias("s_fr"),
        stopword_hits("t", STOPWORDS_ES).cast("long").alias("s_es"),
    )
    en, de, fr, es = (F.col(c) for c in ("s_en", "s_de", "s_fr", "s_es"))
    lang = (
        F.when((en >= de) & (en >= fr) & (en >= es) & (en > 0), "en")
        .when((de >= fr) & (de >= es) & (de > 0), "de")
        .when((fr >= es) & (fr > 0), "fr")
        .when(es > 0, "es")
        .otherwise("unknown")
    )
    return scored.withColumn("lang_pred", lang)


QUERIES["text_lang_id"] = text_lang_id


# ---------------------------------------------------------------------------
# B9 token counting
# ---------------------------------------------------------------------------
ORACLES["text_token_count"] = rf"""
    SELECT doc_id,
           len(string_split_regex(lower(trim(text)), '\s+')) AS ws_tokens,
           len(regexp_extract_all(text, '{BPE_ISH_RE}')) AS bpe_ish_tokens,
           CAST(length(text) AS DOUBLE)
             / len(string_split_regex(lower(trim(text)), '\s+')) AS chars_per_token
    FROM documents
"""


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + BPE-ish lexer tokens (alpha runs / digit
    runs / single symbols) via regexp_count — no tokenizer library, no
    UDF, linear scan."""
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    tok = F.col("t")
    return docs.select(
        "doc_id",
        F.size(tok).cast("long").alias("ws_tokens"),
        F.regexp_count("text", F.lit(BPE_ISH_RE)).cast("long").alias("bpe_ish_tokens"),
        (F.length("text").cast("double") / F.size(tok)).alias("chars_per_token"),
    )


QUERIES["text_token_count"] = text_token_count


# ---------------------------------------------------------------------------
# B10 document fingerprinting
# ---------------------------------------------------------------------------
ORACLES["doc_fingerprint"] = r"""
    WITH toks AS (
      SELECT doc_id, text,
             string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents
    ),
    sh AS (
      SELECT doc_id, MIN(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS fp_min_shingle
      FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)
      GROUP BY doc_id
    )
    SELECT toks.doc_id,
           md5(text) AS fp_full,
           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp_norm,
           sh.fp_min_shingle
    FROM toks LEFT JOIN sh ON toks.doc_id = sh.doc_id
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: raw md5, normalized md5, and the minimum
    shingle hash (a 1-element MinHash — the winnowing primitive)."""
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    tok = F.col("t")
    shingle_hashes = F.expr(
        f"transform({word_shingles_sql('t')}, x -> md5(x))"
    )
    return docs.select(
        "doc_id",
        F.md5("text").alias("fp_full"),
        F.md5(
            F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "))
        ).alias("fp_norm"),
        F.array_min(shingle_hashes).alias("fp_min_shingle"),
    )


QUERIES["doc_fingerprint"] = doc_fingerprint


# ---------------------------------------------------------------------------
# B14 TF-IDF top terms (inverted-index analytics: the args-field search
# index the reference builds in migrations/2021-05-10-084700_indexer_on
# _args_field, re-expressed as a ranking query)
# ---------------------------------------------------------------------------
ORACLES["tfidf_top_terms"] = r"""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split_regex(lower(trim(text)), '\s+')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    )
    SELECT doc_id, term, tfidf
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, term ASC) AS rn
          FROM scored) t
    WHERE rn <= 3
"""


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document: explode -> tf agg -> df agg
    (broadcast back) -> window top-k.

    Scale notes: two aggregations on naturally-partitioned keys; the
    document-frequency table is VOCABULARY-sized, so its join is
    size-gated (functions/dims.py): broadcast while the corpus is
    under the gate, plain shuffle equi-join on term above it — an
    unconditional broadcast of a 100 TB corpus's vocabulary would be
    a multi-GB relation on every executor.  The tf*idf product is a
    per-row double op (identical across engines); ROUND(,6) before
    ranking keeps the top-k stable."""
    from near_indexer_for_explorer_spark.functions.dims import (
        dim_join,
        vocab_dims_fit,
    )

    fits = vocab_dims_fit(sf_dir)
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    tok = docs.select("doc_id", F.explode(F.col("t")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    # Corpus size folded into the DAG as a broadcast 1-row scalar agg —
    # no driver-side action, the whole query stays one self-contained plan.
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(dim_join(df, fits), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
    )


QUERIES["tfidf_top_terms"] = tfidf_top_terms


# ---------------------------------------------------------------------------
# B15 text scrubbing (PII-style redaction: the pre-training cleanup op;
# patterns kept RE2-and-Java-compatible so both engines agree)
# ---------------------------------------------------------------------------
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
_URL_RE = "https?://[^ ]+"

ORACLES["text_scrub"] = f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(text, '{_URL_RE}')) AS n_urls,
           md5(trim(regexp_replace(regexp_replace(regexp_replace(
                 text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                       '{_URL_RE}', '<URL>', 'g'),
                       '\\s+', ' ', 'g'))) AS scrubbed_md5
    FROM documents
"""


def text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction pass: count + replace emails/URLs, collapse
    whitespace, fingerprint the scrubbed text.  Pure regexp column ops
    (one scan, no UDF); the md5 proves both engines produced the
    byte-identical scrubbed document."""
    docs = load_table(spark, sf_dir, "documents")
    scrubbed = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
                _URL_RE,
                "<URL>",
            ),
            r"\s+",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count("text", F.lit(_URL_RE)).cast("long").alias("n_urls"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


QUERIES["text_scrub"] = text_scrub


# ---------------------------------------------------------------------------
# B25 C4/Gopher-style quality FILTER (per-rule flags + kept verdict)
# ---------------------------------------------------------------------------
# text_quality (B7) emits a score; this emits the *filter decision* the
# way C4 (Raffel et al. 2020) / Gopher (Rae et al. 2021) pipelines
# apply it: independent boolean rules, each kept as its own column so
# downstream can audit WHICH rule dropped a document, plus the ANDed
# `kept`.  Rules: word-count bounds, mean-word-length bounds, a
# language-aware stopword floor (docs in a language without a curated
# list auto-pass), and the duplicate-2-gram repetition cap.  Every rule
# is per-row array arithmetic -- the operator has NO shuffle at all and
# scales embarrassingly at 100 TB.
_QF_MIN_WORDS = 25
_QF_MAX_WORDS = 95
_QF_MIN_MEAN_WLEN = 3.0
_QF_MAX_MEAN_WLEN = 10.0
_QF_MIN_STOP_FRAC = 0.05
_QF_MAX_DUP2 = 0.08

_QF_LANG_LISTS = {
    "en": STOPWORDS_EN,
    "de": STOPWORDS_DE,
    "fr": STOPWORDS_FR,
    "es": STOPWORDS_ES,
}

ORACLES["quality_filter_c4"] = f"""
    WITH t AS (
      SELECT doc_id, lang,
             string_split_regex(lower(trim(text)), '\\s+') AS tk
      FROM documents
    ), m AS (
      SELECT doc_id, lang,
             len(tk) AS n_words,
             CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE)
               / len(tk) AS mean_word_len,
             CASE lang
               WHEN 'en' THEN CAST(len(list_filter(tk, x -> x IN ({_sql_list(STOPWORDS_EN)}))) AS DOUBLE) / len(tk)
               WHEN 'de' THEN CAST(len(list_filter(tk, x -> x IN ({_sql_list(STOPWORDS_DE)}))) AS DOUBLE) / len(tk)
               WHEN 'fr' THEN CAST(len(list_filter(tk, x -> x IN ({_sql_list(STOPWORDS_FR)}))) AS DOUBLE) / len(tk)
               WHEN 'es' THEN CAST(len(list_filter(tk, x -> x IN ({_sql_list(STOPWORDS_ES)}))) AS DOUBLE) / len(tk)
               ELSE CAST(NULL AS DOUBLE) END AS stop_frac,
             CASE WHEN len(tk) < 2 THEN 0.0
                  ELSE 1.0 - CAST(len(list_distinct(list_transform(
                         range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])))
                       AS DOUBLE) / (len(tk) - 1) END AS dup_frac_2gram
      FROM t
    )
    SELECT doc_id, lang,
           CAST(n_words AS BIGINT) AS n_words, mean_word_len, stop_frac,
           dup_frac_2gram,
           n_words BETWEEN {_QF_MIN_WORDS} AND {_QF_MAX_WORDS} AS ok_n_words,
           mean_word_len BETWEEN {_QF_MIN_MEAN_WLEN} AND {_QF_MAX_MEAN_WLEN}
             AS ok_mean_word_len,
           COALESCE(stop_frac >= {_QF_MIN_STOP_FRAC}, TRUE) AS ok_stopwords,
           dup_frac_2gram <= {_QF_MAX_DUP2} AS ok_repetition,
           (n_words BETWEEN {_QF_MIN_WORDS} AND {_QF_MAX_WORDS})
             AND (mean_word_len BETWEEN {_QF_MIN_MEAN_WLEN} AND {_QF_MAX_MEAN_WLEN})
             AND COALESCE(stop_frac >= {_QF_MIN_STOP_FRAC}, TRUE)
             AND dup_frac_2gram <= {_QF_MAX_DUP2} AS kept
    FROM m
"""


def quality_filter_columns(docs: DataFrame) -> DataFrame:
    """The B25 rule columns over any (doc_id, text, lang) frame —
    shared verbatim by the batch operator and the C12 streaming corpus
    intake (per-row arithmetic only, so it lifts to a stream as-is)."""
    docs = docs.withColumn("t", tokens("text"))
    tok = F.col("t")
    n_words = F.size(tok)
    mean_wlen = (
        F.expr(
            "aggregate(transform(t, x -> length(x)), 0, "
            "(acc, x) -> acc + x)"
        ).cast("double")
        / n_words
    )
    stop_frac = F.lit(None).cast("double")
    for code, words in _QF_LANG_LISTS.items():
        stop_frac = F.when(
            F.col("lang") == code,
            stopword_hits("t", words).cast("double") / n_words,
        ).otherwise(stop_frac)
    g2 = word_shingles("t", 2)
    dup2 = F.when(n_words < 2, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(g2)).cast("double") / (n_words - 1)
    )
    ok_nw = F.col("n_words").between(_QF_MIN_WORDS, _QF_MAX_WORDS)
    ok_mwl = F.col("mean_word_len").between(_QF_MIN_MEAN_WLEN, _QF_MAX_MEAN_WLEN)
    ok_stop = F.coalesce(F.col("stop_frac") >= _QF_MIN_STOP_FRAC, F.lit(True))
    ok_rep = F.col("dup_frac_2gram") <= _QF_MAX_DUP2
    return (
        docs.select(
            "doc_id",
            "lang",
            n_words.cast("long").alias("n_words"),
            mean_wlen.alias("mean_word_len"),
            stop_frac.alias("stop_frac"),
            dup2.alias("dup_frac_2gram"),
        )
        .withColumn("ok_n_words", ok_nw)
        .withColumn("ok_mean_word_len", ok_mwl)
        .withColumn("ok_stopwords", ok_stop)
        .withColumn("ok_repetition", ok_rep)
        .withColumn("kept", ok_nw & ok_mwl & ok_stop & ok_rep)
    )


def quality_filter_c4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit-friendly quality filter: per-rule booleans + ANDed kept."""
    return quality_filter_columns(load_table(spark, sf_dir, "documents"))


def frozen_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-doc B25 metric/rule relation, session-frozen (the B94
    `b20_components` discipline): quality scoring is computed once per
    corpus and served to every downstream consumer — the production
    shape at 100 TB is this skinny relation written to the lake beside
    the corpus.  The fresh build stays benched and driver-gated under
    `quality_filter_c4` itself; the build is deterministic, so composed
    queries' oracles are unchanged."""
    from near_indexer_for_explorer_spark.operators.frozen import frozen

    (m,) = frozen(
        "b25_quality_metrics",
        spark,
        sf_dir,
        lambda: (quality_filter_c4(spark, sf_dir),),
    )
    return m


QUERIES["quality_filter_c4"] = quality_filter_c4


# ---------------------------------------------------------------------------
# B26 vocabulary build + per-doc OOV coverage
# ---------------------------------------------------------------------------
# The tokenizer-prep primitive: build the top-V corpus vocabulary by
# frequency (deterministic count-desc/token-asc order), then score every
# document's out-of-vocabulary rate against it.  Two shuffles total:
# the (token) count agg (map-side combined) and the doc_id re-agg; the
# vocab itself is a TakeOrdered of V rows broadcast back -- at 100 TB
# the vocab stays driver-small (V entries) no matter the corpus size.
_VOCAB_V = 20

ORACLES["vocab_coverage"] = f"""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '\\s+') AS tk
      FROM documents
    ),
    tok AS (SELECT doc_id, UNNEST(tk) AS token FROM t),
    counts AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
    vocab AS (SELECT token FROM counts ORDER BY cnt DESC, token ASC
              LIMIT {_VOCAB_V}),
    scored AS (
      SELECT tok.doc_id,
             COUNT(*) AS n_tokens,
             SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS n_oov
      FROM tok LEFT JOIN vocab v ON tok.token = v.token
      GROUP BY tok.doc_id
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_oov AS BIGINT) AS n_oov,
           CAST(n_oov AS DOUBLE) / n_tokens AS oov_rate
    FROM scored
"""


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, n_oov, oov_rate) against the corpus top-V
    frequency vocabulary (count-desc, token-asc tie-break)."""
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    tok = docs.select("doc_id", F.explode("t").alias("token"))
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(_VOCAB_V)
        .select("token", F.lit(True).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_oov").cast("long").alias("n_oov"),
            (F.col("n_oov").cast("double") / F.col("n_tokens")).alias("oov_rate"),
        )
    )


QUERIES["vocab_coverage"] = vocab_coverage


# ---------------------------------------------------------------------------
# B49 Zipf-law fit (LM-corpus diagnostics: a healthy natural-language
# corpus shows ln(freq) ~ a + s*ln(rank) with s near -1; boilerplate-
# or spam-heavy crawls bend the curve — this is the standard one-glance
# corpus health check next to B7/B25's per-doc filters).
#
# Regression AS aggregation: the least-squares fit over the top-V
# frequency curve needs only five sums — and because each ln() output
# is rounded at 6 then quantized to decimal (the B27/B33 libm-1-ulp
# discipline), all five sums are EXACT decimals whose products/ratios
# evaluate in IEEE doubles identically in both engines.  Top-V is
# TakeOrdered-bounded; the rank window runs over V=500 rows.
# ---------------------------------------------------------------------------
_ZIPF_V = 500


def vocab_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_terms, zipf_slope, intercept, r2): OLS of ln(freq) on
    ln(rank) over the top-500 frequency vocabulary."""
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    freq = (
        docs.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("w"))
        .limit(_ZIPF_V)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("freq"), F.asc("w"))
    xy = freq.withColumn("rank", F.row_number().over(w)).select(
        F.round(F.log(F.col("rank").cast("double")), 6)
        .cast("decimal(12,6)")
        .alias("x"),
        F.round(F.log(F.col("freq").cast("double")), 6)
        .cast("decimal(12,6)")
        .alias("y"),
    )
    m = xy.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = num / denx
    return m.select(
        F.col("n").cast("long").alias("n_terms"),
        slope.alias("zipf_slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("intercept"),
        ((num * num) / (denx * deny)).alias("r2"),
    )


QUERIES["vocab_zipf_fit"] = vocab_zipf_fit

ORACLES["vocab_zipf_fit"] = rf"""
    WITH toks AS (
      SELECT UNNEST(string_split_regex(lower(trim(text)), '\s+')) AS w
      FROM documents
    ),
    freq AS (
      SELECT w, COUNT(*) AS freq FROM toks GROUP BY w
      ORDER BY freq DESC, w ASC LIMIT {_ZIPF_V}
    ),
    xy AS (
      SELECT CAST(ROUND(ln(CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, w ASC)
                               AS DOUBLE)), 6) AS DECIMAL(12,6)) AS x,
             CAST(ROUND(ln(CAST(freq AS DOUBLE)), 6) AS DECIMAL(12,6)) AS y
      FROM freq
    ),
    m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(y * y) AS DOUBLE) AS syy
      FROM xy
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS zipf_slope,
           (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
             AS intercept,
           ((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
    FROM m
"""


# ---------------------------------------------------------------------------
# B67 BM25 retrieval scoring (Robertson & Sparck Jones; the Okapi
# BM25 formula in its Lucene-style non-negative-idf form) — the
# SEARCH counterpart of B14's TF-IDF ranking and the standard
# relevance primitive over any corpus index (the reference's analog
# surface: the tx-args/event text the explorer indexes for lookup).
# A fixed literal query set is scored against the whole corpus:
#
#   score(q, d) = sum_{t in q} idf(t) * tf * (k1+1)
#                 / (tf + k1 * (1 - b + b * dl/avgdl))
#   idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)
#
# Plan shape: one token explode joined to the broadcast query-term
# dim -> (term, doc) tf aggregate; df/idf is a term-keyed aggregate
# (vocab-bounded, broadcast); dl is a map-side array size; avgdl and N
# enter as broadcast 1-row aggregates (the r2 TF-IDF lesson — no
# driver actions).  Per-term contributions are pinned IEEE
# expressions rounded-6 then decimal-summed per (query, doc) (B33
# discipline), ranking ties broken on doc_id.  Everything shuffles on
# term or (query_id, doc_id) — linear at any corpus size.
# ---------------------------------------------------------------------------
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOP_K = 10
_BM25_QUERIES: list[tuple[int, str]] = [
    (1, "hash join"),
    (2, "window merge sort"),
    (3, "spark stream batch"),
]


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, score, rank): BM25 top-10 documents for each
    fixed query."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    dl = docs.select("doc_id", F.size("t").alias("dl"))
    tok = docs.select("doc_id", F.explode("t").alias("term"))
    qterms = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(qid).alias("query_id"), F.lit(term).alias("term")
                    )
                    for qid, q in _BM25_QUERIES
                    for term in q.split()
                ]
            )
        ).alias("qt")
    ).select("qt.query_id", "qt.term")
    corpus_stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.size("t")).cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    # r14: filter the token stream to query terms ONCE and checkpoint
    # it — df and tf both consume it, each otherwise re-tokenizing and
    # re-exploding the corpus (the dedup posting-list move; the
    # filtered stream is tiny: query-term postings only)
    qtok = tok.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    ).localCheckpoint(eager=False)
    df_counts = qtok.groupBy("term").agg(
        F.count_distinct("doc_id").alias("df")
    )
    tf = (
        qtok.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    contrib = F.round(
        idf
        * (
            (F.col("tf") * F.lit(_BM25_K1 + 1.0))
            / (
                F.col("tf")
                + F.lit(_BM25_K1)
                * (
                    F.lit(1.0 - _BM25_B)
                    + F.lit(_BM25_B)
                    * (F.col("dl").cast("double") / F.col("avgdl"))
                )
            )
        ),
        6,
    )
    scored = (
        tf.join(F.broadcast(df_counts), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus_stats))
        .select("query_id", "doc_id", contrib.alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("c").cast("decimal(20,6)")).cast("double").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _BM25_TOP_K)
        .select("query_id", "doc_id", "score", "rank")
    )


QUERIES["bm25_search"] = bm25_search


def _bm25_oracle_sql() -> str:
    qvals = ", ".join(
        f"({qid}, '{term}')"
        for qid, q in _BM25_QUERIES
        for term in q.split()
    )
    return f"""
    WITH d AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    dl AS (SELECT doc_id, len(t) AS dl FROM d),
    tok AS (SELECT doc_id, UNNEST(t) AS term FROM d),
    qt AS (SELECT * FROM (VALUES {qvals}) v(query_id, term)),
    cs AS (SELECT COUNT(*) AS n_docs,
                  CAST(SUM(len(t)) AS DOUBLE) / COUNT(*) AS avgdl
           FROM d),
    dfc AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok
      WHERE term IN (SELECT DISTINCT term FROM qt)
      GROUP BY term
    ),
    tf AS (
      SELECT qt.query_id, tok.term, tok.doc_id, COUNT(*) AS tf
      FROM tok JOIN qt ON tok.term = qt.term
      GROUP BY qt.query_id, tok.term, tok.doc_id
    ),
    scored AS (
      SELECT tf.query_id, tf.doc_id,
             CAST(CAST(SUM(CAST(ROUND(
               ln((cs.n_docs - dfc.df + 0.5) / (dfc.df + 0.5) + 1.0)
               * ((tf.tf * {_BM25_K1 + 1.0!r})
                  / (tf.tf + {_BM25_K1!r}
                     * ({1.0 - _BM25_B!r}
                        + {_BM25_B!r} * (CAST(dl.dl AS DOUBLE) / cs.avgdl))))
             , 6) AS DECIMAL(20,6))) AS VARCHAR) AS DOUBLE) AS score
      FROM tf
      JOIN dfc ON tf.term = dfc.term
      JOIN dl ON tf.doc_id = dl.doc_id, cs
      GROUP BY tf.query_id, tf.doc_id
    )
    SELECT query_id, doc_id, score, rank
    FROM (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY score DESC, doc_id ASC)
                         AS INTEGER) AS rank
          FROM scored) t
    WHERE rank <= {_BM25_TOP_K}
"""


ORACLES["bm25_search"] = _bm25_oracle_sql()


# ---------------------------------------------------------------------------
# B82 term burstiness + cross-source dispersion (oracle-checked).
# Two classic lexical-statistics curation signals (Church & Gale 1995
# burstiness; chi-square dispersion a la Gries' DP): burstiness =
# cf/df (how much a term CLUMPS inside the documents that contain it
# — topical terms clump, function words spread), and a chi-square of
# the term's per-source counts against the sources' token-mass
# expectation (terms that live in one source are boilerplate/domain
# markers; candidates for source-specific stopword lists).
# Engine-stability: per-source chi-square contributions are rounded
# to 8 dp and summed as DECIMAL (the B76 Heaps discipline) so the
# cross-source sum is order-free.  Scale shape: one token explode,
# one (term, source) aggregate, equi-joins on term/source, one
# broadcast corpus-total scalar; output bounded by the cf floor.
# ---------------------------------------------------------------------------
_BURST_MIN_CF = 20


def term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, cf, df, burstiness, chi2_dispersion) for terms with
    collection frequency >= _BURST_MIN_CF.

    burstiness = cf/df exactly (integer inputs, one IEEE division);
    chi2_dispersion sums round-8 decimal per-source contributions, so
    both engines aggregate identical values in any order."""
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    tok = docs.select("doc_id", "source", F.explode("t").alias("term"))
    per_term = tok.groupBy("term").agg(
        F.count(F.lit(1)).alias("cf"),
        F.countDistinct("doc_id").alias("df"),
    )
    per_cell = tok.groupBy("term", "source").agg(
        F.count(F.lit(1)).alias("obs")
    )
    per_source = tok.groupBy("source").agg(F.count(F.lit(1)).alias("ts"))
    total = tok.agg(F.count(F.lit(1)).alias("tt"))
    kept = per_term.where(F.col("cf") >= _BURST_MIN_CF)
    exp = (
        F.col("cf").cast("double")
        * F.col("ts").cast("double")
        / F.col("tt").cast("double")
    )
    cells = (
        per_cell.join(kept, "term")
        .join(per_source, "source")
        .crossJoin(F.broadcast(total))
        .select(
            "term",
            F.round(
                (F.col("obs").cast("double") - exp)
                * (F.col("obs").cast("double") - exp)
                / exp,
                8,
            )
            .cast("decimal(24,8)")
            .alias("chi_term"),
        )
    )
    chi = cells.groupBy("term").agg(
        F.sum("chi_term").cast("decimal(30,8)").alias("chi8")
    )
    return (
        kept.join(chi, "term")
        .select(
            "term",
            "cf",
            "df",
            F.round(F.col("cf").cast("double") / F.col("df"), 6).alias(
                "burstiness"
            ),
            F.round(F.col("chi8").cast("string").cast("double"), 6).alias(
                "chi2_dispersion"
            ),
        )
    )


QUERIES["term_burstiness"] = term_burstiness

ORACLES["term_burstiness"] = f"""
    WITH tok AS (
      SELECT doc_id, source, UNNEST(string_split_regex(lower(trim(text)),
                                    '\\s+')) AS term
      FROM documents
    ),
    per_term AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS cf,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM tok GROUP BY term
    ),
    per_cell AS (
      SELECT term, source, COUNT(*) AS obs FROM tok GROUP BY term, source
    ),
    per_source AS (SELECT source, COUNT(*) AS ts FROM tok GROUP BY source),
    total AS (SELECT COUNT(*) AS tt FROM tok),
    kept AS (SELECT * FROM per_term WHERE cf >= {_BURST_MIN_CF}),
    cells AS (
      SELECT c.term,
             CAST(ROUND((CAST(c.obs AS DOUBLE)
                         - CAST(k.cf AS DOUBLE) * CAST(s.ts AS DOUBLE)
                           / CAST(t.tt AS DOUBLE))
                        * (CAST(c.obs AS DOUBLE)
                           - CAST(k.cf AS DOUBLE) * CAST(s.ts AS DOUBLE)
                             / CAST(t.tt AS DOUBLE))
                        / (CAST(k.cf AS DOUBLE) * CAST(s.ts AS DOUBLE)
                           / CAST(t.tt AS DOUBLE)), 8)
                  AS DECIMAL(24,8)) AS chi_term
      FROM per_cell c JOIN kept k ON c.term = k.term
      JOIN per_source s ON c.source = s.source
      CROSS JOIN total t
    ),
    chi AS (
      SELECT term, CAST(SUM(chi_term) AS DECIMAL(30,8)) AS chi8
      FROM cells GROUP BY term
    )
    SELECT k.term, k.cf, k.df,
           ROUND(CAST(k.cf AS DOUBLE) / k.df, 6) AS burstiness,
           ROUND(CAST(CAST(c.chi8 AS VARCHAR) AS DOUBLE), 6)
             AS chi2_dispersion
    FROM kept k JOIN chi c ON k.term = c.term
"""


# ---------------------------------------------------------------------------
# B86 induced stopword lists (oracle-checked).  B7/B25 consume CURATED
# stopword lists; real pipelines INDUCE them from the corpus (terms
# whose document-frequency ratio within a language exceeds a floor are
# function words for that corpus, whatever the dictionary says).
# Emitting the curated-list membership beside the induced decision is
# the evaluation-as-data check: a healthy corpus induces mostly
# curated words; divergence flags domain boilerplate.  Scale shape:
# one distinct-(doc, term) explode, one (lang, term) aggregate, one
# broadcast per-lang doc-count join; output bounded by the df floor.
# ---------------------------------------------------------------------------
_INDUCE_DF_RATIO = 0.5


def induced_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, term, df, n_docs, df_ratio, is_curated): terms appearing
    in >= _INDUCE_DF_RATIO of a language's documents.

    The induction threshold compares exact integers (df * 10 >=
    n_docs * 5), so no float decides membership; df_ratio is emitted
    round-6 for reading."""
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    dt = docs.select(
        "lang", "doc_id", F.explode(F.array_distinct("t")).alias("term")
    )
    df_rel = dt.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("df"))
    nd = docs.groupBy("lang").agg(F.countDistinct("doc_id").alias("n_docs"))
    curated = (
        F.when(F.col("lang") == "en", F.col("term").isin(STOPWORDS_EN))
        .when(F.col("lang") == "fr", F.col("term").isin(STOPWORDS_FR))
        .when(F.col("lang") == "de", F.col("term").isin(STOPWORDS_DE))
        .when(F.col("lang") == "es", F.col("term").isin(STOPWORDS_ES))
        .otherwise(F.lit(False))
    )
    return (
        df_rel.join(F.broadcast(nd), "lang")
        .where(F.col("df") * 10 >= F.col("n_docs") * 5)
        .select(
            "lang",
            "term",
            "df",
            "n_docs",
            F.round(F.col("df").cast("double") / F.col("n_docs"), 6).alias(
                "df_ratio"
            ),
            curated.alias("is_curated"),
        )
    )


QUERIES["induced_stopwords"] = induced_stopwords

ORACLES["induced_stopwords"] = f"""
    WITH dt AS (
      SELECT DISTINCT lang, doc_id,
             UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ),
    df_rel AS (
      SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS df
      FROM dt GROUP BY lang, term
    ),
    nd AS (
      SELECT lang, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM documents GROUP BY lang
    )
    SELECT d.lang, d.term, d.df, n.n_docs,
           ROUND(CAST(d.df AS DOUBLE) / n.n_docs, 6) AS df_ratio,
           CASE WHEN d.lang = 'en' THEN d.term IN ({_sql_list(STOPWORDS_EN)})
                WHEN d.lang = 'fr' THEN d.term IN ({_sql_list(STOPWORDS_FR)})
                WHEN d.lang = 'de' THEN d.term IN ({_sql_list(STOPWORDS_DE)})
                WHEN d.lang = 'es' THEN d.term IN ({_sql_list(STOPWORDS_ES)})
                ELSE FALSE END AS is_curated
    FROM df_rel d JOIN nd n ON d.lang = n.lang
    WHERE d.df * 10 >= n.n_docs * 5
"""


# ---------------------------------------------------------------------------
# B88 cross-language vocabulary overlap (oracle-checked).  B46
# estimates SOURCE overlap with MinHash; this measures the exact
# lexical overlap between LANGUAGES — high overlap between two lang
# labels flags mislabeled documents or script-sharing (the lang-ID
# confusion's lexical counterpart, B80's cousin in token space).
# Scale shape: one distinct (lang, term) relation, a term-keyed
# equi self-join (linear: a term joins only across the handful of
# langs containing it), one 6-row pair aggregate; all-integer inputs.
# ---------------------------------------------------------------------------
def cross_lang_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang_1, lang_2, n_common, n_1, n_2, jaccard, containment):
    exact vocabulary overlap for every unordered language pair."""
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    vocab = docs.select(
        "lang", F.explode(F.array_distinct("t")).alias("term")
    ).distinct()
    sizes = vocab.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    a = vocab.select(F.col("lang").alias("lang_1"), "term")
    b = vocab.select(F.col("lang").alias("lang_2"), "term")
    common = (
        a.join(b, "term")
        .where(F.col("lang_1") < F.col("lang_2"))
        .groupBy("lang_1", "lang_2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    s1 = sizes.select(F.col("lang").alias("lang_1"), F.col("n").alias("n_1"))
    s2 = sizes.select(F.col("lang").alias("lang_2"), F.col("n").alias("n_2"))
    return (
        common.join(F.broadcast(s1), "lang_1")
        .join(F.broadcast(s2), "lang_2")
        .select(
            "lang_1",
            "lang_2",
            "n_common",
            "n_1",
            "n_2",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_1") + F.col("n_2") - F.col("n_common")),
                6,
            ).alias("jaccard"),
            F.round(
                F.col("n_common").cast("double")
                / F.least("n_1", "n_2"),
                6,
            ).alias("containment"),
        )
    )


QUERIES["cross_lang_vocab_overlap"] = cross_lang_vocab_overlap

ORACLES["cross_lang_vocab_overlap"] = """
    WITH vocab AS (
      SELECT DISTINCT lang,
             UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ),
    sizes AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
              FROM vocab GROUP BY lang),
    common AS (
      SELECT a.lang AS lang_1, b.lang AS lang_2,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM vocab a JOIN vocab b ON a.term = b.term AND a.lang < b.lang
      GROUP BY a.lang, b.lang
    )
    SELECT c.lang_1, c.lang_2, c.n_common, s1.n AS n_1, s2.n AS n_2,
           ROUND(CAST(c.n_common AS DOUBLE)
                 / (s1.n + s2.n - c.n_common), 6) AS jaccard,
           ROUND(CAST(c.n_common AS DOUBLE) / LEAST(s1.n, s2.n), 6)
             AS containment
    FROM common c
    JOIN sizes s1 ON c.lang_1 = s1.lang
    JOIN sizes s2 ON c.lang_2 = s2.lang
"""


# ---------------------------------------------------------------------------
# B93 borderline-document review queue (oracle-checked).  The curation
# action between keep and drop: documents failing EXACTLY ONE of the
# B25 rules are the cheap wins — fix the one defect (or relax the one
# threshold) and the doc re-enters the corpus.  Real pipelines route
# these to human review / secondary classifiers instead of discarding
# them with the hopeless multi-rule failures.  Scale shape: the B25
# per-row rule columns (shared fn — no drift) plus one integer filter;
# no joins, no shuffle beyond the source scan.
# ---------------------------------------------------------------------------
def borderline_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, failed_rule, n_words, mean_word_len, stop_frac,
    dup_frac_2gram): documents failing exactly one B25 rule, labeled
    with which.

    Reads the session-frozen B25 metric relation: deriving the filter
    and the rule label from the raw projection re-inlines the
    interpreted higher-order tokenizer into EVERY consumer expression
    after project-collapse (the optimized plan carried 21 `split(`
    nodes vs B25's one — measured ~18x the B25 runtime); against the
    frozen relation every rule reads a computed column once."""
    cols = frozen_quality_metrics(spark, sf_dir)
    n_failed = (
        (~F.col("ok_n_words")).cast("int")
        + (~F.col("ok_mean_word_len")).cast("int")
        + (~F.col("ok_stopwords")).cast("int")
        + (~F.col("ok_repetition")).cast("int")
    )
    failed_rule = (
        F.when(~F.col("ok_n_words"), "n_words")
        .when(~F.col("ok_mean_word_len"), "mean_word_len")
        .when(~F.col("ok_stopwords"), "stopwords")
        .otherwise("repetition")
    )
    return (
        cols.where(n_failed == 1)
        .select(
            "doc_id",
            "lang",
            failed_rule.alias("failed_rule"),
            "n_words",
            F.round("mean_word_len", 6).alias("mean_word_len"),
            F.round("stop_frac", 6).alias("stop_frac"),
            F.round("dup_frac_2gram", 6).alias("dup_frac_2gram"),
        )
    )


QUERIES["borderline_docs"] = borderline_docs


def _borderline_oracle_sql() -> str:
    return f"""
    WITH qf AS ({ORACLES["quality_filter_c4"]}),
    flagged AS (
      SELECT *,
             CAST(NOT ok_n_words AS INTEGER)
             + CAST(NOT ok_mean_word_len AS INTEGER)
             + CAST(NOT ok_stopwords AS INTEGER)
             + CAST(NOT ok_repetition AS INTEGER) AS n_failed
      FROM qf
    )
    SELECT doc_id, lang,
           CASE WHEN NOT ok_n_words THEN 'n_words'
                WHEN NOT ok_mean_word_len THEN 'mean_word_len'
                WHEN NOT ok_stopwords THEN 'stopwords'
                ELSE 'repetition' END AS failed_rule,
           n_words,
           ROUND(mean_word_len, 6) AS mean_word_len,
           ROUND(stop_frac, 6) AS stop_frac,
           ROUND(dup_frac_2gram, 6) AS dup_frac_2gram
    FROM flagged
    WHERE n_failed = 1
    """


ORACLES["borderline_docs"] = _borderline_oracle_sql()


# ---------------------------------------------------------------------------
# B99 vocabulary-size OOV operating curve — the sizing knob behind
# B26's fixed-V coverage (the tuning-curve discipline: B51/B63/B65/
# B69/B71/B97/B98): per candidate vocabulary size V, how much of the
# corpus token mass the top-V frequency vocabulary covers.  Tokenizer
# and hash-space sizing reads exactly this curve (diminishing OOV
# returns per 4x vocabulary growth).
#
# Scale shape: one map-combined token aggregate; the ranked relation
# is TakeOrdered-bounded at the LARGEST grid V (the rank window runs
# over <= max(V) rows, never the vocabulary); the whole V grid is
# conditional sums over that bounded relation + one 1-row totals
# broadcast.
# ---------------------------------------------------------------------------
_OOV_CURVE_SIZES = [16, 64, 256, 1024]


def vocab_oov_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vocab_size, n_vocab_types, covered_tokens, total_tokens,
    oov_rate): corpus token coverage of the top-V frequency
    vocabulary, per candidate V."""
    from pyspark.sql import Window

    vmax = max(_OOV_CURVE_SIZES)
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    tok = docs.select(F.explode("t").alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").cast("long").alias("total_tokens"),
    )
    top = (
        counts.orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(vmax)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
            ),
        )
    )
    base = top.agg(
        *[
            F.sum(F.when(F.col("rk") <= v, F.col("cnt")).otherwise(0))
            .cast("long")
            .alias(f"cov{v}")
            for v in _OOV_CURVE_SIZES
        ],
        *[
            F.sum(F.when(F.col("rk") <= v, 1).otherwise(0))
            .cast("long")
            .alias(f"nt{v}")
            for v in _OOV_CURVE_SIZES
        ],
    )
    ex = base.crossJoin(F.broadcast(totals)).select(
        "total_tokens",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(v).cast("long").alias("vocab_size"),
                        F.col(f"nt{v}").alias("n_vocab_types"),
                        F.col(f"cov{v}").alias("covered_tokens"),
                    )
                    for v in _OOV_CURVE_SIZES
                ]
            )
        ).alias("row"),
    )
    return ex.select(
        F.col("row.vocab_size").alias("vocab_size"),
        F.col("row.n_vocab_types").alias("n_vocab_types"),
        F.col("row.covered_tokens").alias("covered_tokens"),
        "total_tokens",
        (
            (F.col("total_tokens") - F.col("row.covered_tokens")).cast("double")
            / F.col("total_tokens")
        ).alias("oov_rate"),
    )


QUERIES["vocab_oov_curve"] = vocab_oov_curve


def _oov_curve_oracle_sql() -> str:
    vmax = max(_OOV_CURVE_SIZES)
    cov_cols = ",\n             ".join(
        f"CAST(SUM(CASE WHEN rk <= {v} THEN cnt ELSE 0 END) AS BIGINT) AS cov{v},"
        f" CAST(SUM(CASE WHEN rk <= {v} THEN 1 ELSE 0 END) AS BIGINT) AS nt{v}"
        for v in _OOV_CURVE_SIZES
    )
    grid = "\n      UNION ALL ".join(
        f"SELECT CAST({v} AS BIGINT) AS vocab_size, nt{v} AS n_vocab_types,"
        f" cov{v} AS covered_tokens FROM base"
        for v in _OOV_CURVE_SIZES
    )
    return rf"""
    WITH t AS (
      SELECT string_split_regex(lower(trim(text)), '\s+') AS tk FROM documents
    ),
    tok AS (SELECT UNNEST(tk) AS token FROM t),
    counts AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
    ranked AS (
      SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS rk
      FROM counts
    ),
    top AS (SELECT * FROM ranked WHERE rk <= {vmax}),
    totals AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_tokens FROM counts),
    base AS (
      SELECT {cov_cols}
      FROM top
    ),
    grid AS (
      {grid}
    )
    SELECT vocab_size, n_vocab_types, covered_tokens, t.total_tokens,
           CAST(t.total_tokens - covered_tokens AS DOUBLE) / t.total_tokens
             AS oov_rate
    FROM grid CROSS JOIN totals t
    """


ORACLES["vocab_oov_curve"] = _oov_curve_oracle_sql()


# ---------------------------------------------------------------------------
# B111 Gopher-rules quality filter (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", Appendix A1.1) — the OTHER canonical curation
# rule family next to B25's C4 rules: word-count bounds, mean-word-
# length bounds, an alphabetic-word floor, a symbol-to-word ceiling
# (hash marks + ellipses), and a distinct-stopword floor.  Deliberately
# a different rule set and different thresholds from B25 so the two
# filters disagree on real documents (their intersection/difference is
# what corpus curation actually tunes).
#
# Scale shape: map-only per-row expressions over one scan — no joins,
# no shuffle, linear at any corpus size (the B25 shape).  Every rule
# flag compares EXACT INTEGERS (3n <= sum_len <= 10n; 5*alpha >= 4*n;
# 10*symbols <= n; distinct-stops >= 2), so no float threshold can
# flip a boolean between engines; the reported ratio columns are
# single integer/integer divisions (bit-identical IEEE in both).
# Reference analog: the explorer validates rows with DB constraints
# (migrations/2020-12-07-153402_initial_schema/up.sql); a corpus
# engine must run its row-level rules in the scan.
# ---------------------------------------------------------------------------
_GP_MIN_WORDS = 10
_GP_MAX_WORDS = 80
_GP_MIN_MWL = 3  # mean word length lower bound (exact: 3n <= sum_len)
_GP_MAX_MWL = 10  # upper bound (exact: sum_len <= 10n)
_GP_ALPHA_NUM = 4  # alpha-word floor 4/5 (exact: 5*alpha >= 4*n)
_GP_ALPHA_DEN = 5
_GP_SYMBOL_DEN = 10  # symbol ceiling 1/10 (exact: 10*sym <= n)
_GP_MIN_DISTINCT_STOPS = 2


def gopher_filter_columns(docs: DataFrame) -> DataFrame:
    """The B111 rule columns over any (doc_id, text, lang) frame —
    per-row arithmetic only (the B25 `quality_filter_columns`
    discipline), so the same kernel lifts to a stream unchanged."""
    toked = docs.withColumn("t", tokens("text"))
    tok = F.col("t")
    n_words = F.size(tok).cast("long")
    sum_len = F.expr(
        "aggregate(transform(t, x -> length(x)), 0, (acc, x) -> acc + x)"
    ).cast("long")
    n_alpha = F.expr("size(filter(t, x -> x RLIKE '[a-z]'))").cast("long")
    n_sym = (
        F.regexp_count(F.col("text"), F.lit("#"))
        + F.regexp_count(F.col("text"), F.lit(r"\.\.\."))
    ).cast("long")
    n_stops = F.lit(None).cast("long")
    for code, words in _QF_LANG_LISTS.items():
        lst = ", ".join("'" + w + "'" for w in words)
        n_stops = F.when(
            F.col("lang") == code,
            F.expr(
                f"size(array_distinct(filter(t, x -> x IN ({lst}))))"
            ).cast("long"),
        ).otherwise(n_stops)
    m = toked.select(
        "doc_id",
        "lang",
        n_words.alias("n_words"),
        sum_len.alias("sum_word_len"),
        n_alpha.alias("n_alpha_words"),
        n_sym.alias("n_symbols"),
        n_stops.alias("n_distinct_stops"),
    )
    ok_nw = F.col("n_words").between(_GP_MIN_WORDS, _GP_MAX_WORDS)
    ok_mwl = (
        F.col("sum_word_len") >= _GP_MIN_MWL * F.col("n_words")
    ) & (F.col("sum_word_len") <= _GP_MAX_MWL * F.col("n_words"))
    ok_alpha = (
        _GP_ALPHA_DEN * F.col("n_alpha_words")
        >= _GP_ALPHA_NUM * F.col("n_words")
    )
    ok_sym = _GP_SYMBOL_DEN * F.col("n_symbols") <= F.col("n_words")
    ok_stop = F.coalesce(
        F.col("n_distinct_stops") >= _GP_MIN_DISTINCT_STOPS, F.lit(True)
    )
    return m.select(
        "doc_id",
        "lang",
        "n_words",
        (F.col("sum_word_len").cast("double") / F.col("n_words")).alias(
            "mean_word_len"
        ),
        (F.col("n_alpha_words").cast("double") / F.col("n_words")).alias(
            "alpha_word_frac"
        ),
        (F.col("n_symbols").cast("double") / F.col("n_words")).alias(
            "symbol_ratio"
        ),
        "n_distinct_stops",
        ok_nw.alias("ok_n_words"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_alpha.alias("ok_alpha_words"),
        ok_sym.alias("ok_symbol_ratio"),
        ok_stop.alias("ok_distinct_stops"),
        (ok_nw & ok_mwl & ok_alpha & ok_sym & ok_stop).alias("kept"),
    )


def quality_filter_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, n_words, mean_word_len, alpha_word_frac,
    symbol_ratio, n_distinct_stops, ok_* x5, kept): the Gopher rule
    family as an audit-friendly per-rule report.

    r15 negative result (kept as the record): routing the scan through
    parallelize_small_scan (the r13 multimodal pattern) was measured
    and REJECTED — interleaved A/B at sf0.1, noop sink: 2.10 s vs
    1.95 s medians with fully overlapping runs (flat), while under a
    count() action (the bench's timing) the added round-robin exchange
    is NOT pruned with the kernel columns and costs ~0.1 s outright
    (1.02 -> 1.12 s).  The r14 scaling anomaly on this row (0.41x at
    8 -> 32 cores) is a count()-action artifact: count prunes the
    map-only rule columns, so the bench row never executes the kernel
    this change would have parallelized."""
    return gopher_filter_columns(load_table(spark, sf_dir, "documents"))


QUERIES["quality_filter_gopher"] = quality_filter_gopher


def _gopher_oracle_sql() -> str:
    stop_case = " ".join(
        f"WHEN '{code}' THEN len(list_distinct(list_filter(tk, "
        f"x -> x IN ({_sql_list(words)}))))"
        for code, words in _QF_LANG_LISTS.items()
    )
    return f"""
    WITH t AS (
      SELECT doc_id, lang,
             string_split_regex(lower(trim(text)), '\\s+') AS tk,
             text
      FROM documents
    ), m AS (
      SELECT doc_id, lang,
             CAST(len(tk) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(tk, x -> length(x))) AS BIGINT)
               AS sum_word_len,
             CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-z]')))
               AS BIGINT) AS n_alpha_words,
             CAST(len(regexp_extract_all(text, '#'))
               + len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT)
               AS n_symbols,
             CAST(CASE lang {stop_case} ELSE NULL END AS BIGINT)
               AS n_distinct_stops
      FROM t
    )
    SELECT doc_id, lang, n_words,
           CAST(sum_word_len AS DOUBLE) / n_words AS mean_word_len,
           CAST(n_alpha_words AS DOUBLE) / n_words AS alpha_word_frac,
           CAST(n_symbols AS DOUBLE) / n_words AS symbol_ratio,
           n_distinct_stops,
           n_words BETWEEN {_GP_MIN_WORDS} AND {_GP_MAX_WORDS} AS ok_n_words,
           sum_word_len >= {_GP_MIN_MWL} * n_words
             AND sum_word_len <= {_GP_MAX_MWL} * n_words AS ok_mean_word_len,
           {_GP_ALPHA_DEN} * n_alpha_words >= {_GP_ALPHA_NUM} * n_words
             AS ok_alpha_words,
           {_GP_SYMBOL_DEN} * n_symbols <= n_words AS ok_symbol_ratio,
           COALESCE(n_distinct_stops >= {_GP_MIN_DISTINCT_STOPS}, TRUE)
             AS ok_distinct_stops,
           (n_words BETWEEN {_GP_MIN_WORDS} AND {_GP_MAX_WORDS})
             AND sum_word_len >= {_GP_MIN_MWL} * n_words
             AND sum_word_len <= {_GP_MAX_MWL} * n_words
             AND {_GP_ALPHA_DEN} * n_alpha_words >= {_GP_ALPHA_NUM} * n_words
             AND {_GP_SYMBOL_DEN} * n_symbols <= n_words
             AND COALESCE(n_distinct_stops >= {_GP_MIN_DISTINCT_STOPS}, TRUE)
             AS kept
    FROM m
    """


ORACLES["quality_filter_gopher"] = _gopher_oracle_sql()


# ---------------------------------------------------------------------------
# B112 language-ID confidence margin — the routing signal on top of
# B8's argmax: how far ahead is the winning language's stopword score?
# Production LID pipelines (CCNet, fastText-based curation) act on the
# CONFIDENCE, not the label: low-margin docs go to a heavier model or
# get dropped; zero-score docs are 'none' (no evidence at all).
#
# Scale shape: B8's map-only scoring plus a 4-element sort_array —
# still zero joins / zero shuffle.  Buckets compare exact integers
# (top == 0; top == second; 2*(top-second) < top i.e. margin-ratio
# < 1/2), so the label can never flip between engines; margin_ratio
# is one integer/integer division.
# ---------------------------------------------------------------------------
def lang_id_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang_pred, top_score, second_score, margin,
    margin_ratio, confidence): B8's prediction with its evidence
    margin and a deterministic confidence bucket."""
    scored = text_lang_id(spark, sf_dir)
    srt = F.sort_array(
        F.array(
            F.col("s_en"), F.col("s_de"), F.col("s_fr"), F.col("s_es")
        ),
        asc=False,
    )
    with_rank = scored.select(
        "doc_id",
        "lang_pred",
        F.element_at(srt, 1).cast("long").alias("top_score"),
        F.element_at(srt, 2).cast("long").alias("second_score"),
    )
    top, second = F.col("top_score"), F.col("second_score")
    confidence = (
        F.when(top == 0, "none")
        .when(top == second, "ambiguous")
        .when(2 * (top - second) < top, "weak")
        .otherwise("strong")
    )
    return with_rank.select(
        "doc_id",
        "lang_pred",
        "top_score",
        "second_score",
        (top - second).alias("margin"),
        F.when(top > 0, (top - second).cast("double") / top).alias(
            "margin_ratio"
        ),
        confidence.alias("confidence"),
    )


QUERIES["lang_id_margin"] = lang_id_margin

ORACLES["lang_id_margin"] = f"""
    WITH b8 AS ({ORACLES["text_lang_id"]}),
    r AS (
      SELECT doc_id, lang_pred,
             CAST(list_sort([s_en, s_de, s_fr, s_es], 'DESC')[1] AS BIGINT)
               AS top_score,
             CAST(list_sort([s_en, s_de, s_fr, s_es], 'DESC')[2] AS BIGINT)
               AS second_score
      FROM b8
    )
    SELECT doc_id, lang_pred, top_score, second_score,
           top_score - second_score AS margin,
           CASE WHEN top_score > 0
                THEN CAST(top_score - second_score AS DOUBLE) / top_score
                ELSE NULL END AS margin_ratio,
           CASE WHEN top_score = 0 THEN 'none'
                WHEN top_score = second_score THEN 'ambiguous'
                WHEN 2 * (top_score - second_score) < top_score THEN 'weak'
                ELSE 'strong' END AS confidence
    FROM r
"""


# ---------------------------------------------------------------------------
# B113 PII incidence by source — the curation decision B15 only
# enables: scrubbing redacts per document, but the KEEP/DROP/re-crawl
# decision is made per SOURCE from its exposure profile (how many docs
# carry emails/URLs/IPs/phones, and how dense).  Extends B15's pattern
# set with IPv4 and two phone shapes, all RE2-and-Java-compatible so
# both engines count identical matches.
#
# Scale shape: one scan, map-side regexp counts, ONE map-combinable
# aggregate to the bounded source grain — linear at any corpus size.
# Rates are integer/integer divisions (bit-identical IEEE).
# ---------------------------------------------------------------------------
_IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
# international (+NNNNNNN..) and dashed (NNN-NNN(N)-NNNN) shapes only:
# unambiguous under both RE2 and Java leftmost matching.
_PHONE_RE = r"\+[0-9]{7,12}|[0-9]{3}-[0-9]{3,4}-[0-9]{4}"


_PII_CELL_COLS = [
    "n_docs",
    "docs_with_pii",
    "n_emails",
    "n_urls",
    "n_ipv4",
    "n_phones",
    "docs_with_email",
    "docs_with_url",
    "docs_with_ipv4",
    "docs_with_phone",
]


def pii_source_cells(docs: DataFrame) -> DataFrame:
    """Per-source ADDITIVE exposure cells over any (source, text)
    frame — the C32-style delta grain: cells from disjoint batches SUM
    to the corpus cells, so the batch report and the C39 streaming
    monitor share this kernel verbatim."""
    counts = docs.select(
        "source",
        F.regexp_count("text", F.lit(_EMAIL_RE)).cast("long").alias("e"),
        F.regexp_count("text", F.lit(_URL_RE)).cast("long").alias("u"),
        F.regexp_count("text", F.lit(_IPV4_RE)).cast("long").alias("i"),
        F.regexp_count("text", F.lit(_PHONE_RE)).cast("long").alias("p"),
    )
    hit = (
        (F.col("e") > 0) | (F.col("u") > 0) | (F.col("i") > 0)
        | (F.col("p") > 0)
    ).cast("long")
    return counts.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(hit).cast("long").alias("docs_with_pii"),
        F.sum("e").cast("long").alias("n_emails"),
        F.sum("u").cast("long").alias("n_urls"),
        F.sum("i").cast("long").alias("n_ipv4"),
        F.sum("p").cast("long").alias("n_phones"),
        F.sum((F.col("e") > 0).cast("long")).cast("long").alias(
            "docs_with_email"
        ),
        F.sum((F.col("u") > 0).cast("long")).cast("long").alias(
            "docs_with_url"
        ),
        F.sum((F.col("i") > 0).cast("long")).cast("long").alias(
            "docs_with_ipv4"
        ),
        F.sum((F.col("p") > 0).cast("long")).cast("long").alias(
            "docs_with_phone"
        ),
    )


def pii_report_from_cells(cells: DataFrame) -> DataFrame:
    """Fold additive cells to the source grain and project the rate —
    shared verbatim by B113 and the C39 read path (a fold of one cell
    set is the identity, so the batch report is unchanged)."""
    agg = cells.groupBy("source").agg(
        *[F.sum(c).cast("long").alias(c) for c in _PII_CELL_COLS]
    )
    return agg.select(
        "source",
        "n_docs",
        "docs_with_pii",
        (F.col("docs_with_pii").cast("double") / F.col("n_docs")).alias(
            "pii_doc_rate"
        ),
        "n_emails",
        "n_urls",
        "n_ipv4",
        "n_phones",
        "docs_with_email",
        "docs_with_url",
        "docs_with_ipv4",
        "docs_with_phone",
    )


def pii_incidence_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, docs_with_pii, pii_doc_rate, n_emails, n_urls,
    n_ipv4, n_phones, docs_with_email, docs_with_url, docs_with_ipv4,
    docs_with_phone): per-source PII exposure profile (cells kernel +
    rate projection, shared with the C39 streaming monitor)."""
    return pii_report_from_cells(
        pii_source_cells(load_table(spark, sf_dir, "documents"))
    )


QUERIES["pii_incidence_by_source"] = pii_incidence_by_source

ORACLES["pii_incidence_by_source"] = f"""
    WITH c AS (
      SELECT source,
             len(regexp_extract_all(text, '{_EMAIL_RE}')) AS e,
             len(regexp_extract_all(text, '{_URL_RE}')) AS u,
             len(regexp_extract_all(text, '{_IPV4_RE}')) AS i,
             len(regexp_extract_all(text, '{_PHONE_RE}')) AS p
      FROM documents
    ),
    a AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN e > 0 OR u > 0 OR i > 0 OR p > 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
             CAST(SUM(e) AS BIGINT) AS n_emails,
             CAST(SUM(u) AS BIGINT) AS n_urls,
             CAST(SUM(i) AS BIGINT) AS n_ipv4,
             CAST(SUM(p) AS BIGINT) AS n_phones,
             CAST(SUM(CASE WHEN e > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_with_email,
             CAST(SUM(CASE WHEN u > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_with_url,
             CAST(SUM(CASE WHEN i > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_with_ipv4,
             CAST(SUM(CASE WHEN p > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_with_phone
      FROM c GROUP BY source
    )
    SELECT source, n_docs, docs_with_pii,
           CAST(docs_with_pii AS DOUBLE) / n_docs AS pii_doc_rate,
           n_emails, n_urls, n_ipv4, n_phones,
           docs_with_email, docs_with_url, docs_with_ipv4, docs_with_phone
    FROM a
"""


# ---------------------------------------------------------------------------
# B114 tokenizer fertility by (lang, source) — the tokenizer-COST
# plan: fertility (BPE-ish subword tokens per whitespace word) is the
# per-language multiplier between corpus word counts and the token
# budget a training run actually pays; high-fertility slices argue for
# vocabulary or data-mix changes.  Composes B9's two counters at the
# (lang, source) grain.
#
# Scale shape: one scan, map-side counts, ONE map-combinable aggregate
# to the bounded (lang, source) grain.  All ratios are exact-integer-
# sum divisions, so parity cannot drift with partitioning.
# ---------------------------------------------------------------------------
def token_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, source, n_docs, ws_tokens, bpe_ish_tokens, n_chars,
    fertility, chars_per_word, chars_per_token): corpus-exact token
    accounting per language x source slice."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "t", tokens("text")
    )
    per = docs.select(
        "lang",
        "source",
        F.size("t").cast("long").alias("ws"),
        F.regexp_count("text", F.lit(BPE_ISH_RE)).cast("long").alias("bp"),
        F.length("text").cast("long").alias("ch"),
    )
    agg = per.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ws").cast("long").alias("ws_tokens"),
        F.sum("bp").cast("long").alias("bpe_ish_tokens"),
        F.sum("ch").cast("long").alias("n_chars"),
    )
    return agg.select(
        "lang",
        "source",
        "n_docs",
        "ws_tokens",
        "bpe_ish_tokens",
        "n_chars",
        (F.col("bpe_ish_tokens").cast("double") / F.col("ws_tokens")).alias(
            "fertility"
        ),
        (F.col("n_chars").cast("double") / F.col("ws_tokens")).alias(
            "chars_per_word"
        ),
        (
            F.col("n_chars").cast("double") / F.col("bpe_ish_tokens")
        ).alias("chars_per_token"),
    )


QUERIES["token_fertility_by_lang"] = token_fertility_by_lang

ORACLES["token_fertility_by_lang"] = rf"""
    WITH c AS (
      SELECT lang, source,
             len(string_split_regex(lower(trim(text)), '\s+')) AS ws,
             len(regexp_extract_all(text, '{BPE_ISH_RE}')) AS bp,
             length(text) AS ch
      FROM documents
    ),
    a AS (
      SELECT lang, source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(ws) AS BIGINT) AS ws_tokens,
             CAST(SUM(bp) AS BIGINT) AS bpe_ish_tokens,
             CAST(SUM(ch) AS BIGINT) AS n_chars
      FROM c GROUP BY lang, source
    )
    SELECT lang, source, n_docs, ws_tokens, bpe_ish_tokens, n_chars,
           CAST(bpe_ish_tokens AS DOUBLE) / ws_tokens AS fertility,
           CAST(n_chars AS DOUBLE) / ws_tokens AS chars_per_word,
           CAST(n_chars AS DOUBLE) / bpe_ish_tokens AS chars_per_token
    FROM a
"""


# ---------------------------------------------------------------------------
# B116 rule-family agreement — B25 (C4 rules) x B111 (Gopher rules) as
# a per-source confusion matrix.  Two filters that agree everywhere
# are redundant; the off-diagonal cells (kept by one, dropped by the
# other) are precisely the documents a curation pass reviews when
# tuning thresholds, and their per-source mix shows WHICH sources the
# two philosophies disagree about.  Jaccard-of-kept-sets summarizes
# the overlap in one number per source.
#
# Scale shape: composes two map-only rule kernels on ONE scan (the
# flags are columns of the same projection), one map-combinable
# aggregate to the bounded source grain.  All cells exact integers;
# the agreement ratios are int/int divisions.
# ---------------------------------------------------------------------------
def quality_rules_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, kept_both, kept_c4_only, kept_gopher_only,
    dropped_both, agree_rate, kept_jaccard): per source, the confusion
    matrix between the C4 and Gopher rule families."""
    docs = load_table(spark, sf_dir, "documents")
    c4 = quality_filter_columns(docs).select(
        "doc_id", F.col("kept").alias("kept_c4")
    )
    gp = gopher_filter_columns(docs).select(
        "doc_id", F.col("kept").alias("kept_gp")
    )
    src = docs.select("doc_id", "source")
    joined = src.join(c4, "doc_id").join(gp, "doc_id")
    agg = joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("kept_c4") & F.col("kept_gp")).cast("long"))
        .cast("long")
        .alias("kept_both"),
        F.sum((F.col("kept_c4") & ~F.col("kept_gp")).cast("long"))
        .cast("long")
        .alias("kept_c4_only"),
        F.sum((~F.col("kept_c4") & F.col("kept_gp")).cast("long"))
        .cast("long")
        .alias("kept_gopher_only"),
        F.sum((~F.col("kept_c4") & ~F.col("kept_gp")).cast("long"))
        .cast("long")
        .alias("dropped_both"),
    )
    kept_union = (
        F.col("kept_both") + F.col("kept_c4_only") + F.col("kept_gopher_only")
    )
    return agg.select(
        "source",
        "n_docs",
        "kept_both",
        "kept_c4_only",
        "kept_gopher_only",
        "dropped_both",
        (
            (F.col("kept_both") + F.col("dropped_both")).cast("double")
            / F.col("n_docs")
        ).alias("agree_rate"),
        F.when(
            kept_union > 0,
            F.col("kept_both").cast("double") / kept_union,
        ).alias("kept_jaccard"),
    )


QUERIES["quality_rules_agreement"] = quality_rules_agreement

ORACLES["quality_rules_agreement"] = f"""
    WITH c4 AS (
      SELECT doc_id, kept AS kept_c4 FROM ({ORACLES["quality_filter_c4"]})
    ),
    gp AS (
      SELECT doc_id, kept AS kept_gp
      FROM ({ORACLES["quality_filter_gopher"]})
    ),
    j AS (
      SELECT d.source, c4.kept_c4, gp.kept_gp
      FROM documents d
      JOIN c4 ON d.doc_id = c4.doc_id
      JOIN gp ON d.doc_id = gp.doc_id
    ),
    a AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN kept_c4 AND kept_gp THEN 1 ELSE 0 END)
               AS BIGINT) AS kept_both,
             CAST(SUM(CASE WHEN kept_c4 AND NOT kept_gp THEN 1 ELSE 0 END)
               AS BIGINT) AS kept_c4_only,
             CAST(SUM(CASE WHEN NOT kept_c4 AND kept_gp THEN 1 ELSE 0 END)
               AS BIGINT) AS kept_gopher_only,
             CAST(SUM(CASE WHEN NOT kept_c4 AND NOT kept_gp THEN 1 ELSE 0 END)
               AS BIGINT) AS dropped_both
      FROM j GROUP BY source
    )
    SELECT source, n_docs, kept_both, kept_c4_only, kept_gopher_only,
           dropped_both,
           CAST(kept_both + dropped_both AS DOUBLE) / n_docs AS agree_rate,
           CASE WHEN kept_both + kept_c4_only + kept_gopher_only > 0
                THEN CAST(kept_both AS DOUBLE)
                     / (kept_both + kept_c4_only + kept_gopher_only)
                ELSE NULL END AS kept_jaccard
    FROM a
"""


# ---------------------------------------------------------------------------
# B118 per-source document-length lognormal fit — the corpus-QA
# distribution check: web-scale document lengths are approximately
# lognormal, and a source whose empirical tail departs from its own
# fitted tail (crawler truncation caps, concatenation bugs, template
# stuffing) shows up as a fitted-vs-empirical p90 gap long before a
# mean shift would.  Moment fit in log space (mu, sigma), fitted
# median/p90 from the lognormal quantile form (z_0.9 as a parsed
# literal, the B63 discipline), empirical p90 via the A51 gated
# percentile.
#
# Parity: per-row ln() rounds to 6dp then sums as exact DECIMAL (the
# A67 two-exact-sums variance discipline), so the moments are
# partitioning- and engine-independent; downstream double arithmetic
# uses identical expression order in both engines.
# ---------------------------------------------------------------------------
_Z90 = 1.281552  # Phi^-1(0.9), parsed literal


def doc_length_lognormal_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, mu_log, sigma_log, fitted_p90_log, emp_p90,
    emp_p90_log, p90_log_gap): per source, the log-space moment fit
    and the fitted-vs-empirical tail agreement.  All fitted outputs
    stay in LOG SPACE: exp() is not correctly-rounded libm and a JVM
    vs libc 1-ULP disagreement was measured flipping a round-6 digit
    at sf0.01 — mu + z*sigma is pure arithmetic, so the log-space form
    is engine-exact (the gap reads as a relative gap).

    Residual exposure (r8 advice): ln() itself carries the same 1-ULP
    libm freedom — the per-row x6 and the emp_p90 log still evaluate
    ln() in both engines, so a value landing within one ULP of a 5e-7
    rounding boundary could in principle flip a round-6 digit
    cross-engine.  Never observed across all SFs/seeds tested; if it
    ever flakes, coarsen the pre-decimal rounding to 5 digits (widens
    the boundary margin ~10x) rather than chasing libm."""
    from near_indexer_for_explorer_spark.functions.percentiles import (
        exact_percentiles_fit,
        gated_percentile,
    )

    docs = load_table(spark, sf_dir, "documents")
    x6 = F.round(F.log(F.col("n_chars").cast("double")), 6).cast(
        "decimal(20,6)"
    )
    exact = exact_percentiles_fit(sf_dir, "documents")
    agg = docs.select("source", x6.alias("x"), "n_chars").groupBy(
        "source"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
        gated_percentile(F.col("n_chars").cast("double"), 0.9, exact).alias(
            "emp_p90_raw"
        ),
    )
    mu = F.col("s1").cast("double") / F.col("n_docs")
    var = (
        F.col("s2").cast("double") - F.col("n_docs") * mu * mu
    ) / F.col("n_docs")
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    fitted_p90_log = F.round(mu + _Z90 * sigma, 6)
    emp_p90 = F.round(F.col("emp_p90_raw"), 6)
    emp_p90_log = F.round(F.log(F.col("emp_p90_raw")), 6)
    return agg.select(
        "source",
        "n_docs",
        F.round(mu, 6).alias("mu_log"),
        F.round(sigma, 6).alias("sigma_log"),
        fitted_p90_log.alias("fitted_p90_log"),
        emp_p90.alias("emp_p90"),
        emp_p90_log.alias("emp_p90_log"),
        F.round(fitted_p90_log - emp_p90_log, 6).alias("p90_log_gap"),
    )


QUERIES["doc_length_lognormal_fit"] = doc_length_lognormal_fit

ORACLES["doc_length_lognormal_fit"] = f"""
    WITH x AS (
      SELECT source,
             CAST(ROUND(ln(CAST(n_chars AS DOUBLE)), 6) AS DECIMAL(20,6))
               AS x,
             n_chars
      FROM documents
    ),
    a AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             SUM(x) AS s1,
             SUM(x * x) AS s2,
             percentile_cont(0.9) WITHIN GROUP (ORDER BY CAST(n_chars AS DOUBLE))
               AS emp_p90_raw
      FROM x GROUP BY source
    ),
    m AS (
      SELECT source, n_docs,
             CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n_docs AS mu,
             (CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
              - n_docs * (CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n_docs)
                       * (CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n_docs))
             / n_docs AS var,
             emp_p90_raw
      FROM a
    )
    SELECT source, n_docs,
           ROUND(mu, 6) AS mu_log,
           ROUND(sqrt(GREATEST(var, 0.0)), 6) AS sigma_log,
           ROUND(mu + {_Z90} * sqrt(GREATEST(var, 0.0)), 6)
             AS fitted_p90_log,
           ROUND(emp_p90_raw, 6) AS emp_p90,
           ROUND(ln(emp_p90_raw), 6) AS emp_p90_log,
           ROUND(ROUND(mu + {_Z90} * sqrt(GREATEST(var, 0.0)), 6)
                 - ROUND(ln(emp_p90_raw), 6), 6) AS p90_log_gap
    FROM m
"""


# ---------------------------------------------------------------------------
# B126 scrub effectiveness audit — the closed loop between B15 (the
# redaction pass) and B113 (the detectors): re-run EVERY detector on
# the SCRUBBED text and report, per source, what survived.  This is
# the audit a privacy reviewer actually signs off on — the scrub
# handles emails/URLs, so nonzero residual ipv4/phone counts are the
# actionable gap, and a nonzero residual email count would mean the
# replacement regex and the detection regex disagree (they are the
# same constant here, so that column doubles as a self-check).
# Scale shape: per-row regex arithmetic then ONE source-grain
# aggregate with map-side partials — no joins, linear in corpus
# bytes, source-grain output.
# ---------------------------------------------------------------------------
ORACLES["scrub_effectiveness"] = f"""
    WITH s AS (
      SELECT source,
             len(regexp_extract_all(text, '{_EMAIL_RE}')) AS pre_e,
             len(regexp_extract_all(text, '{_URL_RE}')) AS pre_u,
             trim(regexp_replace(regexp_replace(regexp_replace(
                 text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                       '{_URL_RE}', '<URL>', 'g'),
                       '\\s+', ' ', 'g')) AS scrubbed
      FROM documents
    ),
    r AS (
      SELECT source, pre_e, pre_u,
             len(regexp_extract_all(scrubbed, '{_EMAIL_RE}')) AS res_e,
             len(regexp_extract_all(scrubbed, '{_URL_RE}')) AS res_u,
             len(regexp_extract_all(scrubbed, '{_IPV4_RE}')) AS res_i,
             len(regexp_extract_all(scrubbed, '{_PHONE_RE}')) AS res_p
      FROM s
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(pre_e) AS BIGINT) AS n_pre_emails,
           CAST(SUM(pre_u) AS BIGINT) AS n_pre_urls,
           CAST(SUM(res_e) AS BIGINT) AS n_res_emails,
           CAST(SUM(res_u) AS BIGINT) AS n_res_urls,
           CAST(SUM(res_i) AS BIGINT) AS n_res_ipv4,
           CAST(SUM(res_p) AS BIGINT) AS n_res_phones,
           CAST(SUM(CASE WHEN res_e + res_u + res_i + res_p > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_residual,
           CASE WHEN SUM(pre_e) = 0 THEN NULL
                ELSE ROUND(1.0 - CAST(SUM(res_e) AS DOUBLE)
                           / SUM(pre_e), 6) END AS email_removal_rate,
           CASE WHEN SUM(pre_u) = 0 THEN NULL
                ELSE ROUND(1.0 - CAST(SUM(res_u) AS DOUBLE)
                           / SUM(pre_u), 6) END AS url_removal_rate
    FROM r GROUP BY source
"""


def scrub_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_pre_emails, n_pre_urls, n_res_emails,
    n_res_urls, n_res_ipv4, n_res_phones, docs_with_residual,
    email_removal_rate, url_removal_rate): B15's scrub re-audited by
    B113's detectors — residual PII per source after redaction."""
    docs = load_table(spark, sf_dir, "documents")
    scrubbed = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
                _URL_RE,
                "<URL>",
            ),
            r"\s+",
            " ",
        )
    )
    per_doc = docs.select(
        "source",
        F.regexp_count("text", F.lit(_EMAIL_RE)).cast("long").alias("pre_e"),
        F.regexp_count("text", F.lit(_URL_RE)).cast("long").alias("pre_u"),
        scrubbed.alias("scrubbed"),
    ).select(
        "source",
        "pre_e",
        "pre_u",
        F.regexp_count("scrubbed", F.lit(_EMAIL_RE)).cast("long").alias("res_e"),
        F.regexp_count("scrubbed", F.lit(_URL_RE)).cast("long").alias("res_u"),
        F.regexp_count("scrubbed", F.lit(_IPV4_RE)).cast("long").alias("res_i"),
        F.regexp_count("scrubbed", F.lit(_PHONE_RE)).cast("long").alias("res_p"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("pre_e").cast("long").alias("n_pre_emails"),
        F.sum("pre_u").cast("long").alias("n_pre_urls"),
        F.sum("res_e").cast("long").alias("n_res_emails"),
        F.sum("res_u").cast("long").alias("n_res_urls"),
        F.sum("res_i").cast("long").alias("n_res_ipv4"),
        F.sum("res_p").cast("long").alias("n_res_phones"),
        F.sum(
            (
                (F.col("res_e") + F.col("res_u") + F.col("res_i") + F.col("res_p"))
                > 0
            ).cast("long")
        )
        .cast("long")
        .alias("docs_with_residual"),
    )
    def rate(pre: str, res: str):
        return F.when(F.col(pre) == 0, F.lit(None).cast("double")).otherwise(
            F.round(1.0 - F.col(res).cast("double") / F.col(pre), 6)
        )

    return agg.select(
        "source",
        "n_docs",
        "n_pre_emails",
        "n_pre_urls",
        "n_res_emails",
        "n_res_urls",
        "n_res_ipv4",
        "n_res_phones",
        "docs_with_residual",
        rate("n_pre_emails", "n_res_emails").alias("email_removal_rate"),
        rate("n_pre_urls", "n_res_urls").alias("url_removal_rate"),
    )


QUERIES["scrub_effectiveness"] = scrub_effectiveness


# ---------------------------------------------------------------------------
# B127 per-document character entropy — the gibberish/encoded-blob
# detector quality pipelines run BEFORE tokenization (base64 dumps,
# minified code, and key mashing all sit far from natural-language
# character distributions; cf. the entropy rule in CCNet/Gopher-style
# filter stacks).  Engine-stability: each -p*ln(p) term is rounded to
# 8 decimals and cast DECIMAL(20,8) BEFORE summation, and both sides
# sum decimals exactly, so the fold order never matters (the
# user_event_entropy discipline applied inside a higher-order
# function).  Scale shape: MAP-ONLY — the character histogram is
# per-row array arithmetic (O(n_chars x n_distinct) inside codegen),
# no shuffle at all; at 100 TB this is the ideal embarrassingly
# parallel scan shape.
# ---------------------------------------------------------------------------
_ENTROPY_GIBBERISH_NATS = 2.0
_ENTROPY_MIN_CHARS = 50

ORACLES["doc_char_entropy"] = f"""
    WITH c AS (
      SELECT doc_id, length(text) AS n,
             list_transform(range(1, length(text) + 1),
                            i -> substr(text, CAST(i AS INTEGER), 1)) AS chs
      FROM documents
    ),
    h AS (
      SELECT doc_id, n,
             len(list_distinct(chs)) AS n_distinct,
             CAST(COALESCE(list_sum(list_transform(list_distinct(chs),
               c -> CAST(ROUND(
                      -(CAST(len(list_filter(chs, x -> x = c)) AS DOUBLE) / n)
                      * ln(CAST(len(list_filter(chs, x -> x = c)) AS DOUBLE) / n),
                      8) AS DECIMAL(20,8)))), 0) AS DECIMAL(24,8)) AS h8
      FROM c WHERE n > 0
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_chars,
           CAST(n_distinct AS BIGINT) AS n_distinct_chars,
           ROUND(CAST(CAST(h8 AS VARCHAR) AS DOUBLE), 6) AS char_entropy,
           n >= {_ENTROPY_MIN_CHARS}
             AND CAST(CAST(h8 AS VARCHAR) AS DOUBLE)
                 < {_ENTROPY_GIBBERISH_NATS} AS is_low_entropy
    FROM h
"""


def doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_chars, n_distinct_chars, char_entropy,
    is_low_entropy): Shannon character entropy (nats) per document,
    flagging long low-entropy docs (repetitive filler / mashing) the
    way a pre-tokenization quality gate does."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.length("text")
    chs = "transform(sequence(1, length(text)), i -> substring(text, i, 1))"
    pc = (
        f"(CAST(size(filter({chs}, x -> x = c)) AS DOUBLE) / length(text))"
    )
    per = docs.where(n > 0).select(
        "doc_id",
        n.cast("long").alias("n_chars"),
        F.expr(f"size(array_distinct({chs}))")
        .cast("long")
        .alias("n_distinct_chars"),
        F.expr(
            f"aggregate("
            f"transform(array_distinct({chs}), c -> "
            f"CAST(round((-{pc}) * ln({pc}), 8) AS DECIMAL(20,8))), "
            f"CAST(0 AS DECIMAL(24,8)), "
            f"(acc, x) -> CAST(acc + x AS DECIMAL(24,8)))"
        ).alias("h8"),
    )
    h_d = F.col("h8").cast("string").cast("double")
    return per.select(
        "doc_id",
        "n_chars",
        "n_distinct_chars",
        F.round(h_d, 6).alias("char_entropy"),
        (
            (F.col("n_chars") >= _ENTROPY_MIN_CHARS)
            & (h_d < _ENTROPY_GIBBERISH_NATS)
        ).alias("is_low_entropy"),
    )


QUERIES["doc_char_entropy"] = doc_char_entropy


# ---------------------------------------------------------------------------
# B130 language-ID confusion matrix — B8's predictions evaluated
# against the corpus's labeled lang column: the per-pair confusion
# counts plus row-recall and column-precision, which is the eval
# artifact that decides whether a lang-ID model is good enough to
# route documents (B112 gives the per-doc margin; this gives the
# aggregate quality).  Scale shape: B8's per-row scoring (map-only)
# then ONE (true, pred) aggregate + two grain-sized re-aggregates —
# output is at most |langs|^2 rows regardless of corpus size.
# ---------------------------------------------------------------------------
ORACLES["lang_id_confusion"] = f"""
    WITH t AS (
      SELECT doc_id, lang,
             string_split_regex(lower(trim(text)), '\\s+') AS tok
      FROM documents
    ), s AS (
      SELECT doc_id, lang,
             len(list_filter(tok, x -> x IN ({_sql_list(STOPWORDS_EN)}))) AS s_en,
             len(list_filter(tok, x -> x IN ({_sql_list(STOPWORDS_DE)}))) AS s_de,
             len(list_filter(tok, x -> x IN ({_sql_list(STOPWORDS_FR)}))) AS s_fr,
             len(list_filter(tok, x -> x IN ({_sql_list(STOPWORDS_ES)}))) AS s_es
      FROM t
    ), p AS (
      SELECT lang AS lang_true,
             CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
                  WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
                  WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
                  WHEN s_es > 0 THEN 'es'
                  ELSE 'unknown' END AS lang_pred
      FROM s
    ), cm AS (
      SELECT lang_true, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM p GROUP BY lang_true, lang_pred
    )
    SELECT lang_true, lang_pred, n_docs,
           ROUND(CAST(n_docs AS DOUBLE)
                 / SUM(n_docs) OVER (PARTITION BY lang_true), 6) AS recall,
           ROUND(CAST(n_docs AS DOUBLE)
                 / SUM(n_docs) OVER (PARTITION BY lang_pred), 6) AS precision,
           lang_true = lang_pred AS is_correct
    FROM cm
"""


def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang_true, lang_pred, n_docs, recall, precision, is_correct):
    B8's stopword-argmax predictions cross-tabulated against the
    labeled lang column."""
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    tok = F.col("t")
    scored = docs.select(
        F.col("lang").alias("lang_true"),
        stopword_hits("t", STOPWORDS_EN).cast("long").alias("s_en"),
        stopword_hits("t", STOPWORDS_DE).cast("long").alias("s_de"),
        stopword_hits("t", STOPWORDS_FR).cast("long").alias("s_fr"),
        stopword_hits("t", STOPWORDS_ES).cast("long").alias("s_es"),
    )
    en, de, fr, es = (F.col(c) for c in ("s_en", "s_de", "s_fr", "s_es"))
    pred = (
        F.when((en >= de) & (en >= fr) & (en >= es) & (en > 0), "en")
        .when((de >= fr) & (de >= es) & (de > 0), "de")
        .when((fr >= es) & (fr > 0), "fr")
        .when(es > 0, "es")
        .otherwise("unknown")
    )
    from pyspark.sql import Window

    cm = scored.select("lang_true", pred.alias("lang_pred")).groupBy(
        "lang_true", "lang_pred"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    w_true = Window.partitionBy("lang_true")
    w_pred = Window.partitionBy("lang_pred")
    return cm.select(
        "lang_true",
        "lang_pred",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double") / F.sum("n_docs").over(w_true), 6
        ).alias("recall"),
        F.round(
            F.col("n_docs").cast("double") / F.sum("n_docs").over(w_pred), 6
        ).alias("precision"),
        (F.col("lang_true") == F.col("lang_pred")).alias("is_correct"),
    )


QUERIES["lang_id_confusion"] = lang_id_confusion


# ---------------------------------------------------------------------------
# B134 quality-signal calibration — do the independent curation
# signals AGREE?  Bucket documents by the B7 quality score and report,
# per bucket, the exact-duplicate rate, the PII-exposure rate, and the
# mean length: a well-calibrated score should show dup/PII rates
# falling as quality rises, and this one table is how a curation
# reviewer checks that before trusting a single-number threshold.
# Engine-stability: the score is ROUNDED TO 6 DECIMALS before the
# fixed-edge bucketing (floor(score*10), clamped to [0,9]) so a 1-ulp
# score difference can never flip a bucket; char sums are exact
# integers.  Scale shape: B7's map-only scoring + one md5-keyed dup
# aggregate joined back + ONE bucket-grain rollup — linear, output 10
# rows.
# ---------------------------------------------------------------------------
ORACLES["quality_signal_calibration"] = f"""
    WITH t AS (
      SELECT doc_id, text, source,
             length(text) AS n_chars_raw,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                             x -> x IN ({_sql_list(STOPWORDS_EN)}))) AS n_stop
      FROM documents
    ),
    s AS (
      SELECT doc_id, text, n_chars_raw,
             ROUND(LEAST(1.0, n_tokens / 200.0) * 0.5
                   + (CAST(n_alpha AS DOUBLE) / n_chars_raw) * 0.3
                   + (CAST(n_stop AS DOUBLE) / n_tokens) * 0.2, 6) AS q
      FROM t
    ),
    hc AS (
      SELECT md5(text) AS h, COUNT(*) AS c FROM documents GROUP BY md5(text)
    ),
    b AS (
      SELECT s.doc_id, s.n_chars_raw,
             LEAST(9, GREATEST(0, CAST(floor(s.q * 10) AS BIGINT))) AS bucket,
             CASE WHEN hc.c > 1 THEN 1 ELSE 0 END AS is_dup,
             CASE WHEN len(regexp_extract_all(s.text, '{_EMAIL_RE}')) > 0
                    OR len(regexp_extract_all(s.text, '{_URL_RE}')) > 0
                    OR len(regexp_extract_all(s.text, '{_IPV4_RE}')) > 0
                    OR len(regexp_extract_all(s.text, '{_PHONE_RE}')) > 0
                  THEN 1 ELSE 0 END AS has_pii
      FROM s JOIN hc ON md5(s.text) = hc.h
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(is_dup) AS DOUBLE) / COUNT(*), 6) AS dup_rate,
           ROUND(CAST(SUM(has_pii) AS DOUBLE) / COUNT(*), 6) AS pii_rate,
           ROUND(CAST(SUM(n_chars_raw) AS DOUBLE) / COUNT(*), 6)
             AS mean_chars
    FROM b GROUP BY bucket
"""


def quality_signal_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket, n_docs, dup_rate, pii_rate, mean_chars): the B7
    quality score bucketed on fixed decile edges, cross-tabulated with
    exact-dup membership and PII exposure — the calibration table that
    justifies (or kills) a single-score curation threshold."""
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    tok = F.col("t")
    n_chars = F.length("text")
    n_tokens = F.size(tok)
    n_alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
    n_stop = stopword_hits("t", STOPWORDS_EN)
    q = F.round(
        F.least(F.lit(1.0), n_tokens / F.lit(200.0)) * 0.5
        + (n_alpha.cast("double") / n_chars) * 0.3
        + (n_stop.cast("double") / n_tokens) * 0.2,
        6,
    )
    pii = (
        (F.regexp_count("text", F.lit(_EMAIL_RE)) > 0)
        | (F.regexp_count("text", F.lit(_URL_RE)) > 0)
        | (F.regexp_count("text", F.lit(_IPV4_RE)) > 0)
        | (F.regexp_count("text", F.lit(_PHONE_RE)) > 0)
    )
    scored = docs.select(
        "doc_id",
        F.md5("text").alias("h"),
        n_chars.cast("long").alias("n_chars_raw"),
        F.least(F.lit(9), F.greatest(F.lit(0), F.floor(q * 10)))
        .cast("long")
        .alias("bucket"),
        pii.cast("long").alias("has_pii"),
    )
    hc = scored.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    b = scored.join(hc, "h").select(
        "bucket",
        "n_chars_raw",
        (F.col("c") > 1).cast("long").alias("is_dup"),
        "has_pii",
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.sum("is_dup").cast("double") / F.count(F.lit(1)), 6).alias(
            "dup_rate"
        ),
        F.round(F.sum("has_pii").cast("double") / F.count(F.lit(1)), 6).alias(
            "pii_rate"
        ),
        F.round(
            F.sum("n_chars_raw").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_chars"),
    )


QUERIES["quality_signal_calibration"] = quality_signal_calibration


# ---------------------------------------------------------------------------
# B137 readability scoring (Flesch reading-ease / FK grade with the
# standard vowel-group syllable approximation) — the classic
# audience-level curation signal (Kincaid et al. 1975); pipelines use
# it to balance corpora across difficulty bands and to catch
# telegraphic/boilerplate text that word-count rules miss.  All three
# inputs are exact integer counts (words, sentences, vowel-group
# syllables); the two formula evaluations are IEEE arithmetic over
# those exact integers, identical cross-engine, round-6.  Map-only per
# row plus one optional source rollup — here the doc grain is emitted
# (the band column makes it a filterable gate).  Scale: linear, zero
# shuffles.
# ---------------------------------------------------------------------------
_SYLLABLE_RE = "[aeiouyAEIOUY]+"
_SENTENCE_RE = "[.!?]+"

ORACLES["text_readability"] = f"""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '\\s+') AS tk,
             greatest(1, len(regexp_extract_all(text, '{_SENTENCE_RE}')))
               AS n_sents
      FROM documents
    ),
    m AS (
      SELECT doc_id, n_sents,
             len(tk) AS n_words,
             COALESCE(list_sum(list_transform(tk,
               w -> greatest(1, len(regexp_extract_all(w, '{_SYLLABLE_RE}'))))),
               0) AS n_syll
      FROM t
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sents AS BIGINT) AS n_sents,
           CAST(n_syll AS BIGINT) AS n_syllables,
           ROUND(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
                 - 84.6 * (CAST(n_syll AS DOUBLE) / n_words), 6)
             AS flesch_ease,
           ROUND(0.39 * (CAST(n_words AS DOUBLE) / n_sents)
                 + 11.8 * (CAST(n_syll AS DOUBLE) / n_words) - 15.59, 6)
             AS fk_grade,
           CASE WHEN 206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
                     - 84.6 * (CAST(n_syll AS DOUBLE) / n_words) >= 60
                THEN 'easy'
                WHEN 206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
                     - 84.6 * (CAST(n_syll AS DOUBLE) / n_words) >= 30
                THEN 'medium'
                ELSE 'hard' END AS band
    FROM m WHERE n_words > 0
"""


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_words, n_sents, n_syllables, flesch_ease, fk_grade,
    band): Flesch reading-ease + FK grade from exact integer counts
    (vowel-group syllable approximation, sentences floored at 1)."""
    docs = load_table(spark, sf_dir, "documents").withColumn("tk", tokens("text"))
    tk = F.col("tk")
    n_words = F.size(tk)
    n_sents = F.greatest(
        F.lit(1), F.regexp_count("text", F.lit(_SENTENCE_RE))
    )
    n_syll = F.expr(
        f"aggregate(transform(tk, w -> GREATEST(1, "
        f"regexp_count(w, '{_SYLLABLE_RE}'))), 0, (acc, x) -> acc + x)"
    )
    per = docs.where(n_words > 0).select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        n_sents.cast("long").alias("n_sents"),
        n_syll.cast("long").alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sents")
    spw = F.col("n_syllables").cast("double") / F.col("n_words")
    ease = 206.835 - 1.015 * wps - 84.6 * spw
    grade = 0.39 * wps + 11.8 * spw - 15.59
    return per.select(
        "doc_id",
        "n_words",
        "n_sents",
        "n_syllables",
        F.round(ease, 6).alias("flesch_ease"),
        F.round(grade, 6).alias("fk_grade"),
        F.when(ease >= 60, "easy")
        .when(ease >= 30, "medium")
        .otherwise("hard")
        .alias("band"),
    )


QUERIES["text_readability"] = text_readability


# ---------------------------------------------------------------------------
# B148 code-vs-prose routing — the classifier every mixed crawl
# pipeline runs BEFORE tokenization/quality (code routes to a code
# tokenizer and different quality gates; prose to B25/B111; CodeParrot
# / StarCoder-style pipelines).  The shipped corpus is prose-only, so
# a deterministic mixed corpus is synthesized (the A30/A118 modeled-
# input discipline): every 4th document is rewritten into a pseudo-
# code form (def header, 4-space-indented bracketed assignments,
# semicolon line ends) with plain `replace`, so BOTH engines construct
# byte-identical inputs.  The DETECTOR never branches on the
# construction spec: it measures symbol density ([]();= chars),
# semicolon density, and indented-line density on whatever text it is
# given, and thresholds one IEEE score — the features any real code
# router starts from.  Map-only codegen; zero Python.
# ---------------------------------------------------------------------------
_CODE_SYMBOL_RE = r"[\[\]();=]"
_CODE_SCORE_THRESHOLD = 0.05


def synthesize_mixed_corpus(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, source, t): every 4th doc rewritten into
    the deterministic pseudo-code form, the rest verbatim prose."""
    code_form = F.concat(
        F.lit("def fn_"),
        F.col("doc_id").cast("string"),
        F.lit("():\n    x = ["),
        F.replace(F.col("text"), F.lit(" "), F.lit("];\n    x = [")),
        F.lit("];\n    return x;"),
    )
    t = F.when(F.col("doc_id") % 4 == 0, code_form).otherwise(F.col("text"))
    return docs.select("doc_id", "source", t.alias("t"))


def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, n_chars, symbol_count, semi_count,
    indent_lines, code_score, is_code): the routing verdict per
    document over the synthesized mixed corpus — symbol/semicolon/
    indent densities folded into one thresholded score."""
    mixed = synthesize_mixed_corpus(load_table(spark, sf_dir, "documents"))
    n = F.length("t")
    symbol_count = n - F.length(F.regexp_replace("t", _CODE_SYMBOL_RE, ""))
    semi_count = n - F.length(F.replace(F.col("t"), F.lit(";"), F.lit("")))
    indent_lines = (
        n - F.length(F.replace(F.col("t"), F.lit("\n    "), F.lit("\n")))
    ) / 4
    score = (symbol_count * 3.0 + semi_count * 2.0 + indent_lines * 4.0) / n
    return mixed.select(
        "doc_id",
        "source",
        n.cast("long").alias("n_chars"),
        symbol_count.cast("long").alias("symbol_count"),
        semi_count.cast("long").alias("semi_count"),
        indent_lines.cast("long").alias("indent_lines"),
        F.round(score, 6).alias("code_score"),
        (score > _CODE_SCORE_THRESHOLD).alias("is_code"),
    )


QUERIES["text_code_detect"] = text_code_detect

# the boolean compares the UNROUNDED ratio on both engines (identical
# integer operands -> identical IEEE double -> identical compare);
# only the emitted score is rounded
ORACLES["text_code_detect"] = f"""
    WITH mixed AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 4 = 0
                  THEN 'def fn_' || CAST(doc_id AS VARCHAR)
                       || '():' || chr(10) || '    x = ['
                       || replace(text, ' ',
                                  '];' || chr(10) || '    x = [')
                       || '];' || chr(10) || '    return x;'
                  ELSE text END AS t
      FROM documents
    ),
    feats AS (
      SELECT doc_id, source, length(t) AS n,
             length(t) - length(regexp_replace(t, '{_CODE_SYMBOL_RE}', '', 'g'))
               AS symbol_count,
             length(t) - length(replace(t, ';', '')) AS semi_count,
             (length(t) - length(replace(t, chr(10) || '    ', chr(10)))) // 4
               AS indent_lines
      FROM mixed
    )
    SELECT doc_id, source,
           CAST(n AS BIGINT) AS n_chars,
           CAST(symbol_count AS BIGINT) AS symbol_count,
           CAST(semi_count AS BIGINT) AS semi_count,
           CAST(indent_lines AS BIGINT) AS indent_lines,
           ROUND((symbol_count * 3.0 + semi_count * 2.0 + indent_lines * 4.0)
                 / n, 6) AS code_score,
           (symbol_count * 3.0 + semi_count * 2.0 + indent_lines * 4.0) / n
             > {_CODE_SCORE_THRESHOLD} AS is_code
    FROM feats
"""
