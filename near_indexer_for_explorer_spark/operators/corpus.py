"""Corpus-preparation operators for LLM training-data pipelines
(SURVEY.md section 2B, rows B16-B19): eval-set decontamination,
intra-document repetition metrics, deterministic train/val/test
splitting with stratified sampling, and corpus-level n-gram statistics.

These extend the dedup/text family (operators/dedup.py, textops.py)
with the remaining steps a production pretraining pipeline runs between
"raw documents" and "training shards".  The reference's analog surface
is its idempotent keyed ingestion (ON CONFLICT DO NOTHING,
database/src/adapters/transactions.rs) and arg/event text indexing;
the operators here are the LLM-corpus counterparts the task brief asks
for as first-class components.

Hashing discipline matches operators/dedup.py: md5 is the only hash
(both engines share it), so every "random" assignment is deterministic
and every oracle replicates the pipeline bit-for-bit.  No Python UDFs
anywhere — pure built-in column expressions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from near_indexer_for_explorer_spark.functions.dims import (
    dim_join,
    vocab_dims_fit,
)
from near_indexer_for_explorer_spark.functions.text import tokens, word_shingles
from near_indexer_for_explorer_spark.sources.tables import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# ---------------------------------------------------------------------------
# shared hashing helpers
# ---------------------------------------------------------------------------
# canonical definitions live in functions/hashing.py (shared with
# operators/dedup.py and the streaming pipelines); the private aliases
# predate the move and are kept for the many call sites below.
from near_indexer_for_explorer_spark.functions.hashing import (  # noqa: E402
    POWERS8 as _POWERS8,
    md5_u32 as _hash_bucket,
    md5_u32_sql as _hash_bucket_sql,
)


def _gram_sql(n: int) -> str:
    """DuckDB word-n-gram from token list `t` (1-based, empty when the
    doc has fewer than n tokens — range() is empty then), mirroring
    functions/text.py::word_shingles."""
    parts = " || ' ' || ".join(f"t[i+{k}]" if k else "t[i]" for k in range(n))
    return f"SELECT doc_id, {parts} AS sh FROM toks, UNNEST(range(1, len(t) - {n - 2})) AS r(i)"


_TOKS_CTE = r"""
    toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents
    )
"""

# ---------------------------------------------------------------------------
# B16 eval-set decontamination (n-gram collision against the train split)
# ---------------------------------------------------------------------------
_DECON_N = 8  # standard 8-13 gram window for benchmark decontamination
_DECON_MOD = 10  # train buckets 0-7, eval 8-9
_DECON_FRAC = 0.05  # flag eval docs with >= 5% of grams seen in train

ORACLES["decontaminate_overlap"] = f"""
    WITH {_TOKS_CTE},
    split AS (
      SELECT doc_id, t,
             {_hash_bucket_sql("doc_id", "decon:", _DECON_MOD)} < 8 AS is_train
      FROM toks
    ),
    grams AS (
      SELECT DISTINCT doc_id, sh FROM (
        {_gram_sql(_DECON_N).replace("FROM toks", "FROM split")}
      )
    ),
    train_grams AS (
      SELECT DISTINCT g.sh FROM grams g JOIN split s ON g.doc_id = s.doc_id
      WHERE s.is_train
    ),
    eval_docs AS (
      SELECT s.doc_id,
             len(list_distinct(
               CASE WHEN len(t) >= {_DECON_N}
                 THEN list_transform(range(1, len(t) - {_DECON_N - 2}),
                        i -> {" || ' ' || ".join(f"t[i+{k}]" if k else "t[i]" for k in range(_DECON_N))})
                 ELSE [] END)) AS n_grams
      FROM split s WHERE NOT s.is_train
    ),
    hits AS (
      SELECT g.doc_id, COUNT(*) AS n_overlap
      FROM grams g
      JOIN split s ON g.doc_id = s.doc_id AND NOT s.is_train
      JOIN train_grams tg ON g.sh = tg.sh
      GROUP BY g.doc_id
    )
    SELECT e.doc_id,
           CAST(e.n_grams AS BIGINT) AS n_grams,
           CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
           CASE WHEN e.n_grams = 0 THEN 0.0
                ELSE CAST(COALESCE(h.n_overlap, 0) AS DOUBLE) / e.n_grams
           END AS overlap_frac,
           CASE WHEN e.n_grams = 0 THEN FALSE
                ELSE CAST(COALESCE(h.n_overlap, 0) AS DOUBLE) / e.n_grams
                     >= {_DECON_FRAC}
           END AS contaminated
    FROM eval_docs e LEFT JOIN hits h ON e.doc_id = h.doc_id
"""


def decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: which eval-split documents share word
    8-grams with the train split, and what fraction of their grams leak.

    Shape: deterministic md5 split -> distinct per-doc gram explode ->
    semi-shaped equi-join against the DISTINCT train gram set ->
    per-eval-doc count.  The train side is distinct grams (each gram
    once), so join fan-out is bounded by the eval posting lists — no
    hot-gram quadratic blowup, unlike a raw posting self-join; at 100 TB
    this is one shuffle on `sh` (sort-merge) plus one on doc_id, both
    linear.  Zero-gram eval docs survive via the left join (n_overlap 0).
    """
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    split = docs.withColumn(
        "is_train", _hash_bucket(F.col("doc_id"), "decon:", _DECON_MOD) < 8
    )
    grams = split.select(
        "doc_id",
        "is_train",
        F.explode(F.array_distinct(word_shingles("t", _DECON_N))).alias("sh"),
    )
    train_grams = grams.where("is_train").select("sh").distinct()
    eval_grams = grams.where(~F.col("is_train")).select("doc_id", "sh")
    hits = (
        eval_grams.join(train_grams, "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    eval_docs = split.where(~F.col("is_train")).select(
        "doc_id",
        F.size(F.array_distinct(word_shingles("t", _DECON_N)))
        .cast("long")
        .alias("n_grams"),
    )
    n_overlap = F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long")
    frac = F.when(F.col("n_grams") == 0, F.lit(0.0)).otherwise(
        n_overlap.cast("double") / F.col("n_grams")
    )
    return eval_docs.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        n_overlap.alias("n_overlap"),
        frac.alias("overlap_frac"),
        F.when(F.col("n_grams") == 0, F.lit(False))
        .otherwise(frac >= _DECON_FRAC)
        .alias("contaminated"),
    )


QUERIES["decontaminate_overlap"] = decontaminate_overlap

# ---------------------------------------------------------------------------
# B17 intra-document repetition (Gopher-style duplicate n-gram fractions)
# ---------------------------------------------------------------------------
_REP_DUP_FRAC = 0.2
_REP_MAX_REPEAT = 3

ORACLES["doc_repetition"] = f"""
    WITH {_TOKS_CTE},
    arr AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 2
               THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
               ELSE [] END AS g2,
             CASE WHEN len(t) >= 3
               THEN list_transform(range(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
               ELSE [] END AS g3
      FROM toks
    ),
    fr AS (
      SELECT doc_id,
             len(g2) AS n_2grams, len(list_distinct(g2)) AS d2,
             len(g3) AS n_3grams, len(list_distinct(g3)) AS d3
      FROM arr
    ),
    rep AS (
      SELECT doc_id, MAX(c) AS max_3gram_repeat FROM (
        SELECT doc_id, COUNT(*) AS c
        FROM (SELECT doc_id, UNNEST(g3) AS sh FROM arr)
        GROUP BY doc_id, sh
      ) GROUP BY doc_id
    )
    SELECT f.doc_id,
           CAST(f.n_2grams AS BIGINT) AS n_2grams,
           CASE WHEN f.n_2grams = 0 THEN 0.0
                ELSE 1.0 - CAST(f.d2 AS DOUBLE) / f.n_2grams END AS dup_frac_2gram,
           CAST(f.n_3grams AS BIGINT) AS n_3grams,
           CASE WHEN f.n_3grams = 0 THEN 0.0
                ELSE 1.0 - CAST(f.d3 AS DOUBLE) / f.n_3grams END AS dup_frac_3gram,
           CAST(COALESCE(r.max_3gram_repeat, 0) AS BIGINT) AS max_3gram_repeat,
           (CASE WHEN f.n_3grams = 0 THEN 0.0
                 ELSE 1.0 - CAST(f.d3 AS DOUBLE) / f.n_3grams END) > {_REP_DUP_FRAC}
             OR COALESCE(r.max_3gram_repeat, 0) >= {_REP_MAX_REPEAT} AS repetitive
    FROM fr f LEFT JOIN rep r ON f.doc_id = r.doc_id
"""


def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition metrics (the Gopher/MassiveText repetition
    rule family): duplicate 2-gram and 3-gram fractions plus the highest
    single-3-gram repeat count, and a combined `repetitive` flag.

    The duplicate fractions are per-row array arithmetic (size vs
    array_distinct size — no shuffle at all); only the max-repeat needs
    an explode, and it pre-aggregates on (doc_id, gram) before the
    per-doc max, so both shuffles are keyed on doc_id and map-side
    combine applies.  Linear at any corpus size; per-doc cost is bounded
    by document length, never corpus size."""
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    arr = docs.select(
        "doc_id",
        word_shingles("t", 2).alias("g2"),
        word_shingles("t", 3).alias("g3"),
    )
    rep = (
        arr.select("doc_id", F.explode("g3").alias("sh"))
        .groupBy("doc_id", "sh")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_3gram_repeat"))
    )
    n2, n3 = F.size("g2"), F.size("g3")
    d2 = F.size(F.array_distinct("g2"))
    d3 = F.size(F.array_distinct("g3"))
    dup2 = F.when(n2 == 0, F.lit(0.0)).otherwise(1.0 - d2.cast("double") / n2)
    dup3 = F.when(n3 == 0, F.lit(0.0)).otherwise(1.0 - d3.cast("double") / n3)
    maxrep = F.coalesce(F.col("max_3gram_repeat"), F.lit(0)).cast("long")
    return (
        arr.join(rep, "doc_id", "left")
        .select(
            "doc_id",
            n2.cast("long").alias("n_2grams"),
            dup2.alias("dup_frac_2gram"),
            n3.cast("long").alias("n_3grams"),
            dup3.alias("dup_frac_3gram"),
            maxrep.alias("max_3gram_repeat"),
            ((dup3 > _REP_DUP_FRAC) | (maxrep >= _REP_MAX_REPEAT)).alias("repetitive"),
        )
    )


QUERIES["doc_repetition"] = doc_repetition

# ---------------------------------------------------------------------------
# B18 deterministic split + per-language stratified sample
# ---------------------------------------------------------------------------
_SPLIT_MOD = 40  # 32/4/4 -> 80% train, 10% val, 10% test
_SAMPLE_FRAC = 0.2

ORACLES["corpus_split_sample"] = f"""
    WITH b AS (
      SELECT doc_id, lang,
             {_hash_bucket_sql("doc_id", "split:", _SPLIT_MOD)} AS sb,
             {_hash_bucket_sql("doc_id", "samp:", 1 << 31)} AS rk_key
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN sb < 32 THEN 'train'
                WHEN sb < 36 THEN 'val' ELSE 'test' END AS split,
           CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY rk_key, doc_id)
                AS BIGINT) AS strat_rank,
           CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n_lang,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY rk_key, doc_id)
             <= ceil({_SAMPLE_FRAC} * COUNT(*) OVER (PARTITION BY lang))
             AS in_sample
    FROM b
"""


_SPLIT_RANK_BUCKETS_BITS = 4  # 16 range buckets per language stratum


def _split_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, sb, rk_key): the deterministic md5 split bucket and
    the independent md5 rank key shared by both rank implementations."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        _hash_bucket(F.col("doc_id"), "split:", _SPLIT_MOD).alias("sb"),
        _hash_bucket(F.col("doc_id"), "samp:", 1 << 31).alias("rk_key"),
    )


def _split_select(b: DataFrame, rank: F.Column, n_lang: F.Column) -> DataFrame:
    split = (
        F.when(F.col("sb") < 32, "train").when(F.col("sb") < 36, "val").otherwise("test")
    )
    return b.select(
        "doc_id",
        "lang",
        split.alias("split"),
        rank.alias("strat_rank"),
        n_lang.alias("n_lang"),
        (rank <= F.ceil(F.lit(_SAMPLE_FRAC) * n_lang)).alias("in_sample"),
    )


def corpus_split_sample_plain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-window reference implementation: rank and stratum size in
    one pass partitioned by lang.  Correct, but a skewed language
    stratum (90% English at 100 TB) lands on ONE task.  Kept as the
    property-test twin of the salted path below."""
    b = _split_keys(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy("rk_key", "doc_id")
    wn = Window.partitionBy("lang")
    return _split_select(
        b, F.row_number().over(w).cast("long"), F.count(F.lit(1)).over(wn).cast("long")
    )


def corpus_split_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (md5 bucket of doc_id —
    stable under reshuffles and re-runs, unlike rand()) plus an exactly-
    sized per-language stratified sample: rank docs inside each language
    by an independent md5 key and keep the top 20%.

    THE code path is the skew-proof two-phase rank (this is what runs
    in the registry; corpus_split_sample_plain is the test twin):

    1. bucket = the top ``_SPLIT_RANK_BUCKETS_BITS`` bits of the
       uniform rk_key — a RANGE bucketing, so the within-bucket
       (rk_key, doc_id) order concatenated across buckets IS the
       global stratum order (no re-sort needed, unlike modulo salt);
    2. row_number inside each (lang, bucket) — the biggest window
       partition shrinks by 2^bits, so a 90%-of-corpus language
       stratum spreads over 16 tasks instead of one;
    3. per-(lang, bucket) counts (tiny: n_langs x 16 rows) yield each
       bucket's rank offset and the stratum size via a prefix-sum
       window over the counts only; broadcast-joined back.

    Output is row-identical to the plain single-window version
    (property-tested in tests/test_properties.py) and to the oracle's
    ROW_NUMBER, which is why the same oracle SQL gates both."""
    b = _split_keys(spark, sf_dir)
    bucket = F.shiftright(F.col("rk_key"), 31 - _SPLIT_RANK_BUCKETS_BITS)
    bb = b.withColumn("bucket", bucket)
    w_in = Window.partitionBy("lang", "bucket").orderBy("rk_key", "doc_id")
    ranked = bb.withColumn("rk_in_bucket", F.row_number().over(w_in).cast("long"))
    counts = bb.groupBy("lang", "bucket").agg(F.count(F.lit(1)).alias("n_bucket"))
    w_off = (
        Window.partitionBy("lang")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy("lang")
    offsets = counts.select(
        "lang",
        "bucket",
        F.coalesce(F.sum("n_bucket").over(w_off), F.lit(0)).cast("long").alias("offset"),
        F.sum("n_bucket").over(w_tot).cast("long").alias("n_lang_tot"),
    )
    joined = ranked.join(F.broadcast(offsets), ["lang", "bucket"])
    return _split_select(
        joined, F.col("offset") + F.col("rk_in_bucket"), F.col("n_lang_tot")
    )


QUERIES["corpus_split_sample"] = corpus_split_sample

# ---------------------------------------------------------------------------
# B19 corpus n-gram statistics (LM corpus profiling)
# ---------------------------------------------------------------------------
_NGRAM_TOPK = 50

ORACLES["corpus_ngram_stats"] = f"""
    WITH {_TOKS_CTE},
    grams AS ({_gram_sql(3)}),
    per_doc AS (
      SELECT sh, doc_id, COUNT(*) AS c FROM grams GROUP BY sh, doc_id
    ),
    stats AS (
      SELECT sh AS gram, SUM(c) AS tf, COUNT(*) AS df FROM per_doc GROUP BY sh
    )
    SELECT gram, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
    FROM stats
    ORDER BY tf DESC, gram ASC
    LIMIT {_NGRAM_TOPK}
"""


def corpus_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_NGRAM_TOPK} corpus 3-grams by total term frequency, with
    document frequency — the corpus-profiling pass an LM data pipeline
    runs for boilerplate detection and df-cap calibration (it feeds
    operators/dedup.py's df-prune threshold).

    Two-level aggregation: (gram, doc) partial counts first — map-side
    combine collapses within-doc repeats before the shuffle — then one
    shuffle on gram computes tf=sum and df=count without countDistinct's
    expand.  Top-k is orderBy+limit, which Spark executes as
    TakeOrderedAndProject (per-partition heaps, no global sort).  The
    (tf DESC, gram ASC) total order makes the boundary deterministic in
    both engines."""
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    grams = docs.select("doc_id", F.explode(word_shingles("t", 3)).alias("sh"))
    per_doc = grams.groupBy("sh", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    stats = per_doc.groupBy("sh").agg(
        F.sum("c").cast("long").alias("tf"), F.count(F.lit(1)).cast("long").alias("df")
    )
    return (
        stats.select(F.col("sh").alias("gram"), "tf", "df")
        .orderBy(F.desc("tf"), F.asc("gram"))
        .limit(_NGRAM_TOPK)
    )


QUERIES["corpus_ngram_stats"] = corpus_ngram_stats

# ---------------------------------------------------------------------------
# B21 corpus source/language mix (sampling-weight calibration)
# ---------------------------------------------------------------------------

ORACLES["corpus_source_mix"] = """
    WITH per AS (
      SELECT source, lang, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM documents GROUP BY source, lang
    ),
    tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS corpus_chars FROM documents)
    SELECT p.source, p.lang, p.n_docs, p.total_chars,
           CAST(p.total_chars AS DOUBLE) / p.n_docs AS avg_chars,
           CAST(p.total_chars AS DOUBLE) / t.corpus_chars AS char_share
    FROM per p CROSS JOIN tot t
"""


def corpus_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, language) corpus composition: doc counts, exact
    character totals, and each stratum's share of the whole corpus —
    the table a pretraining pipeline calibrates sampling weights and
    dedup budgets against (and the reference's per-shard/per-kind
    volume dashboards mirror shape-wise).

    One shuffle for the stratum aggregate; the corpus total is the sum
    of the stratum sums via a broadcast 1-row aggregate (no second
    scan, no driver action).  Integer-exact sums; the two divisions
    are identical double ops in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    tot = per.agg(F.sum("total_chars").cast("long").alias("corpus_chars"))
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "lang",
        "n_docs",
        "total_chars",
        (F.col("total_chars").cast("double") / F.col("n_docs")).alias("avg_chars"),
        (F.col("total_chars").cast("double") / F.col("corpus_chars")).alias(
            "char_share"
        ),
    )


QUERIES["corpus_source_mix"] = corpus_source_mix


# ---------------------------------------------------------------------------
# B27 bigram PMI collocation statistics
# ---------------------------------------------------------------------------
# Pointwise mutual information over adjacent word pairs — the classic
# collocation/phrase-induction signal (word2vec phrase merging, BPE
# merge scoring both rank candidate merges this way).  pmi(a,b) =
# ln( (c2/N2) / ((c1a/N1)(c1b/N1)) ), reported round-6 so both
# engines' libm ln() agree at the hash level (same discipline as the
# round-6 cosines).
#
# Scale shape: one (token) agg and one (bigram) agg, both map-side
# combined; the two unigram joins broadcast the vocab-sized count
# table; the corpus totals are broadcast scalar aggregates.  Nothing
# here grows with corpus size except the two linear scans.
_PMI_MIN_COUNT = 10


ORACLES["token_bigram_pmi"] = f"""
    WITH {_TOKS_CTE},
    uni AS (
      SELECT token, COUNT(*) AS c1 FROM (
        SELECT UNNEST(t) AS token FROM toks) GROUP BY token
    ),
    big AS (
      SELECT sh, COUNT(*) AS c2 FROM ({_gram_sql(2)}) GROUP BY sh
    ),
    n1 AS (SELECT SUM(c1) AS n FROM uni),
    n2 AS (SELECT SUM(c2) AS n FROM big),
    sp AS (
      SELECT string_split(sh, ' ')[1] AS w1, string_split(sh, ' ')[2] AS w2,
             c2 FROM big WHERE c2 >= {_PMI_MIN_COUNT}
    )
    SELECT sp.w1, sp.w2, CAST(sp.c2 AS BIGINT) AS c_bigram,
           CAST(a.c1 AS BIGINT) AS c_w1, CAST(b.c1 AS BIGINT) AS c_w2,
           ROUND(ln((CAST(sp.c2 AS DOUBLE) / n2.n)
                    / ((CAST(a.c1 AS DOUBLE) / n1.n)
                       * (CAST(b.c1 AS DOUBLE) / n1.n))), 6) AS pmi
    FROM sp JOIN uni a ON sp.w1 = a.token
            JOIN uni b ON sp.w2 = b.token, n1, n2
"""


def token_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w1, w2, c_bigram, c_w1, c_w2, pmi) for bigrams with count >=
    _PMI_MIN_COUNT."""
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    uni = (
        docs.select(F.explode("t").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    big = (
        docs.select(F.explode(word_shingles("t", 2)).alias("sh"))
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    n1 = uni.agg(F.sum("c1").alias("n1"))
    n2 = big.agg(F.sum("c2").alias("n2"))
    sp = big.where(F.col("c2") >= _PMI_MIN_COUNT).select(
        F.split("sh", " ").getItem(0).alias("w1"),
        F.split("sh", " ").getItem(1).alias("w2"),
        "c2",
    )
    a = uni.select(F.col("token").alias("w1"), F.col("c1").alias("c_w1"))
    b = uni.select(F.col("token").alias("w2"), F.col("c1").alias("c_w2"))
    pmi = F.round(
        F.log(
            (F.col("c2").cast("double") / F.col("n2"))
            / (
                (F.col("c_w1").cast("double") / F.col("n1"))
                * (F.col("c_w2").cast("double") / F.col("n1"))
            )
        ),
        6,
    )
    fits = vocab_dims_fit(sf_dir)
    return (
        sp.join(dim_join(a, fits), "w1")
        .join(dim_join(b, fits), "w2")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            "w1",
            "w2",
            F.col("c2").cast("long").alias("c_bigram"),
            F.col("c_w1").cast("long").alias("c_w1"),
            F.col("c_w2").cast("long").alias("c_w2"),
            pmi.alias("pmi"),
        )
    )


QUERIES["token_bigram_pmi"] = token_bigram_pmi


# ---------------------------------------------------------------------------
# B29 token-budget shard packing
# ---------------------------------------------------------------------------
# The last step before training: lay documents end-to-end in ingest
# order (doc_id) inside each split and cut shards every _PACK_BUDGET
# tokens — every doc gets (shard_id, offset_in_shard), i.e. exactly
# where its tokens land in the packed token stream (Megatron-style
# sample packing).  The running token offset is computed with the same
# skew-proof two-phase scheme as B18's stratified rank: local cumsum
# inside (split, doc_id-range bucket) + broadcast per-bucket prefix
# offsets — a 90%-of-corpus split never lands on one task.  All
# arithmetic is exact integers; the oracle is the plain single-window
# cumsum, which the two-phase form equals row-for-row.
_PACK_BUDGET = 2048  # tokens per shard
_PACK_BUCKET_SHIFT = 10  # ~1k docs per range bucket

ORACLES["corpus_shard_pack"] = f"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN {_hash_bucket_sql("doc_id", "split:", _SPLIT_MOD)} < 32
                  THEN 'train'
                  WHEN {_hash_bucket_sql("doc_id", "split:", _SPLIT_MOD)} < 36
                  THEN 'val' ELSE 'test' END AS split,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, split, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY split ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS start_off
      FROM d
    )
    SELECT doc_id, split, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(start_off // {_PACK_BUDGET} AS BIGINT) AS shard_id,
           CAST(start_off % {_PACK_BUDGET} AS BIGINT) AS offset_in_shard
    FROM c
"""


def corpus_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, split, n_tokens, shard_id, offset_in_shard): greedy
    token-budget packing in ingest order, two-phase skew-proof."""
    docs = load_table(spark, sf_dir, "documents")
    sb = _hash_bucket(F.col("doc_id"), "split:", _SPLIT_MOD)
    split = F.when(sb < 32, "train").when(sb < 36, "val").otherwise("test")
    d = docs.select(
        "doc_id",
        split.alias("split"),
        F.size(tokens("text")).cast("long").alias("n_tokens"),
        F.shiftright(F.col("doc_id"), _PACK_BUCKET_SHIFT).alias("bucket"),
    )
    w_local = (
        Window.partitionBy("split", "bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = d.withColumn("c_local", F.sum("n_tokens").over(w_local))
    counts = d.groupBy("split", "bucket").agg(F.sum("n_tokens").alias("tot"))
    w_off = (
        Window.partitionBy("split")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "split",
        "bucket",
        F.coalesce(F.sum("tot").over(w_off), F.lit(0)).cast("long").alias("off"),
    )
    start = (F.col("off") + F.col("c_local") - F.col("n_tokens")).alias("start_off")
    return (
        local.join(F.broadcast(offsets), ["split", "bucket"])
        .withColumn("start_off", start)
        .select(
            "doc_id",
            "split",
            "n_tokens",
            # `div`, not `/`: Spark '/' on longs is IEEE double
            # division, whose half-ulp near 2^52 can cross an integer
            # and misassign the shard; `div` stays exact on longs,
            # matching the oracle's integer `//`.
            F.expr(f"start_off div {_PACK_BUDGET}").alias("shard_id"),
            (F.col("start_off") % _PACK_BUDGET).cast("long").alias("offset_in_shard"),
        )
    )


QUERIES["corpus_shard_pack"] = corpus_shard_pack


# ---------------------------------------------------------------------------
# B33 unigram-LM cross-entropy scoring (CCNet-style perplexity filter)
# ---------------------------------------------------------------------------
# CCNet (Wenzek et al. 2020) ranks web documents by LM perplexity;
# the distributable core is: fit token probabilities on the train
# split, score every doc by average negative log-likelihood.  Here the
# LM is add-one-smoothed unigram: p(w) = (c_train(w)+1) / (N+V), OOV
# -> 1/(N+V).  Float discipline: each token's ln p is rounded to 6
# decimals (libm ln may differ 1 ulp across engines; round-6 absorbs
# it), then summed as DECIMAL(20,6) — exact and order-independent —
# before the final divide.  Scale shape: the LM is a vocab-sized
# broadcast; scoring is one explode + one doc_id-keyed agg.
def unigram_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, split, n_tokens, xent): add-one unigram cross-entropy
    of every document under the train-split LM."""
    docs = load_table(spark, sf_dir, "documents")
    sb = _hash_bucket(F.col("doc_id"), "split:", _SPLIT_MOD)
    split = F.when(sb < 32, "train").when(sb < 36, "val").otherwise("test")
    tok = docs.select(
        "doc_id", split.alias("split"), F.explode(tokens("text")).alias("token")
    )
    train_counts = (
        tok.where(F.col("split") == "train")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = train_counts.agg(
        F.sum("c").alias("n_train"), F.count(F.lit(1)).alias("v_train")
    )
    lp = F.round(
        F.log(
            (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
            / (F.col("n_train") + F.col("v_train"))
        ),
        6,
    )
    return (
        tok.join(dim_join(train_counts, vocab_dims_fit(sf_dir)), "token", "left")
        .crossJoin(F.broadcast(totals))
        .select("doc_id", "split", lp.alias("lp"))
        .groupBy("doc_id", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            # NO final round: the decimal sum casts to an identical
            # double in both engines and the division is one IEEE op,
            # so the quotient is bit-identical — a round-6 here can
            # only ADD divergence (hit at sf0.1: a quotient landed
            # within 1 ulp of a .5e-6 boundary and the engines'
            # rounding implementations split).
            (
                -F.sum(F.col("lp").cast("decimal(20,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("xent"),
        )
    )


QUERIES["unigram_xent"] = unigram_xent

ORACLES["unigram_xent"] = f"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN {_hash_bucket_sql("doc_id", "split:", _SPLIT_MOD)} < 32
                  THEN 'train'
                  WHEN {_hash_bucket_sql("doc_id", "split:", _SPLIT_MOD)} < 36
                  THEN 'val' ELSE 'test' END AS split,
             string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    tok AS (SELECT doc_id, split, UNNEST(t) AS token FROM d),
    tc AS (
      SELECT token, COUNT(*) AS c FROM tok WHERE split = 'train'
      GROUP BY token
    ),
    tot AS (SELECT SUM(c) AS n_train, COUNT(*) AS v_train FROM tc),
    lp AS (
      SELECT tok.doc_id, tok.split,
             ROUND(ln(CAST(COALESCE(tc.c, 0) + 1 AS DOUBLE)
                      / (tot.n_train + tot.v_train)), 6) AS lp
      FROM tok LEFT JOIN tc ON tok.token = tc.token, tot
    )
    SELECT doc_id, split, COUNT(*) AS n_tokens,
           -CAST(CAST(SUM(CAST(lp AS DECIMAL(20,6))) AS VARCHAR) AS DOUBLE)
                 / COUNT(*) AS xent
    FROM lp
    GROUP BY doc_id, split
"""


# ---------------------------------------------------------------------------
# B34 corpus-duplicated span fractions (substring-dedup signal)
# ---------------------------------------------------------------------------
# Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
# Better") removes exact substrings shared across documents; the
# distributable approximation at gram granularity: for every document,
# the fraction of its word-8-gram spans that occur in ANY other
# document.  Unlike B17 (intra-doc repetition) and B16 (eval-vs-train
# leakage), this is corpus-wide self-duplication — the "how much of
# this doc is boilerplate" ranking signal.  Shape: distinct per-doc
# grams -> gram df agg (map-combined) -> join back -> doc agg; all
# shuffles keyed on the gram or doc_id, linear in corpus size.
_SPAN_N = 8


def dedup_common_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_spans, n_shared, shared_frac): per-doc fraction of
    distinct 8-gram spans that appear in >= 2 documents."""
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    grams = docs.select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles("t", _SPAN_N))).alias("g"),
    )
    df_counts = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    joined = grams.join(df_counts, "g")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_spans",
            "n_shared",
            (F.col("n_shared").cast("double") / F.col("n_spans")).alias(
                "shared_frac"
            ),
        )
    )


QUERIES["dedup_common_spans"] = dedup_common_spans

ORACLES["dedup_common_spans"] = f"""
    WITH {_TOKS_CTE},
    grams AS (
      SELECT DISTINCT doc_id, sh AS g FROM ({_gram_sql(_SPAN_N)})
    ),
    dfc AS (SELECT g, COUNT(*) AS df FROM grams GROUP BY g)
    SELECT grams.doc_id,
           COUNT(*) AS n_spans,
           -- BIGINT cast: DuckDB SUM(int) yields HUGEINT, which the
           -- driver's pandas fetch renders as float64 ("498.0" vs "498")
           -- and the value-hash diverges even though values are equal.
           CAST(SUM(CASE WHEN dfc.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared,
           CAST(SUM(CASE WHEN dfc.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS shared_frac
    FROM grams JOIN dfc ON grams.g = dfc.g
    GROUP BY grams.doc_id
"""


# ---------------------------------------------------------------------------
# B36 paragraph-level maximal shared spans (run-granular substring dedup)
# ---------------------------------------------------------------------------
# The suffix-array-free approximation of Lee et al. 2021 exact
# substring dedup one level above B34's gram-granular fractions: a
# word-8-gram POSITION in a document is "shared" when its gram occurs
# in at least one OTHER document (cross-doc df >= 2; intra-doc repeats
# are B17's signal); maximal runs of CONSECUTIVE shared positions are
# the document's shared spans (a run of L consecutive shared 8-gram
# positions certifies an L+7-token substring duplicated somewhere in
# the corpus).  Everything falls out of ONE ordered window pass per
# document:
#
#   prev      = lag(pos)                 -- gap to the previous shared pos
#   new_run   = prev is null or gap != 1 -- run boundary
#   run_start = running MAX of boundary positions (positions ascend, so
#               the latest boundary IS the current run's start; MAX
#               skips the nulls on non-boundary rows)
#   contrib   = min(8, gap)              -- EXACT interval-union token
#               coverage: position i covers tokens [i, i+7], so each
#               new position extends the union by min(8, gap) tokens
#
# then one doc_id aggregation: n_runs = sum(new_run), longest span =
# max(pos - run_start + 1) + 7, covered_tokens = sum(contrib).  Two
# shuffles total on top of the gram-df leg (g, doc_id), both linear;
# the window partition key is doc_id so the following groupBy reuses
# its partitioning.  Reference analog: the receipt-arg byte-span
# comparisons in database/src/adapters/transactions.rs (args dedup
# shapes) — re-expressed as corpus-scale span accounting.


def dedup_span_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, n_spans, n_runs, max_run_tokens,
    covered_tokens, dup_token_frac): maximal cross-doc shared spans per
    document — run count, longest duplicated span in tokens, and the
    exact token count covered by the union of shared 8-gram windows."""
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    base = docs.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.greatest(F.size("t") - F.lit(_SPAN_N - 1), F.lit(0))
        .cast("long")
        .alias("n_spans"),
    )
    grams = docs.select(
        "doc_id",
        F.posexplode(word_shingles("t", _SPAN_N)).alias("pos", "g"),
    )
    shared_grams = (
        grams.select("doc_id", "g")
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= 2)
        .select("g")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = (
        grams.join(shared_grams, "g")
        .select("doc_id", "pos", F.lag("pos").over(w).alias("prev"))
        .withColumn(
            "new_run",
            F.when(
                F.col("prev").isNull() | (F.col("pos") - F.col("prev") != 1), 1
            ).otherwise(0),
        )
        .withColumn(
            "run_start",
            F.max(F.when(F.col("new_run") == 1, F.col("pos"))).over(wrun),
        )
        .withColumn(
            "contrib",
            F.when(F.col("prev").isNull(), F.lit(_SPAN_N)).otherwise(
                F.least(F.lit(_SPAN_N), F.col("pos") - F.col("prev"))
            ),
        )
    )
    agg = flagged.groupBy("doc_id").agg(
        F.sum("new_run").cast("long").alias("n_runs"),
        (F.max(F.col("pos") - F.col("run_start") + 1) + F.lit(_SPAN_N - 1))
        .cast("long")
        .alias("max_run_tokens"),
        F.sum("contrib").cast("long").alias("covered_tokens"),
    )
    return base.join(agg, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "n_spans",
        F.coalesce("n_runs", F.lit(0)).cast("long").alias("n_runs"),
        F.coalesce("max_run_tokens", F.lit(0)).cast("long").alias("max_run_tokens"),
        F.coalesce("covered_tokens", F.lit(0)).cast("long").alias("covered_tokens"),
        (
            F.coalesce("covered_tokens", F.lit(0)).cast("double")
            / F.col("n_tokens")
        ).alias("dup_token_frac"),
    )


QUERIES["dedup_span_runs"] = dedup_span_runs

ORACLES["dedup_span_runs"] = f"""
    WITH {_TOKS_CTE},
    base AS (
      SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
             CAST(greatest(len(t) - {_SPAN_N - 1}, 0) AS BIGINT) AS n_spans
      FROM toks
    ),
    grams AS (
      SELECT doc_id, i - 1 AS pos, sh AS g
      FROM ({_gram_sql(_SPAN_N).replace("SELECT doc_id,", "SELECT doc_id, i,")})
    ),
    shared AS (
      SELECT g FROM (
        SELECT g, COUNT(*) AS df
        FROM (SELECT DISTINCT doc_id, g FROM grams) GROUP BY g
      ) WHERE df >= 2
    ),
    flag AS (
      SELECT doc_id, pos, lag(pos) OVER w AS prev,
             CASE WHEN lag(pos) OVER w IS NULL
                       OR pos - lag(pos) OVER w != 1
                  THEN 1 ELSE 0 END AS new_run
      FROM grams JOIN shared USING (g)
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    runs AS (
      SELECT doc_id, pos, prev, new_run,
             MAX(CASE WHEN new_run = 1 THEN pos END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS UNBOUNDED PRECEDING) AS run_start,
             CASE WHEN prev IS NULL THEN {_SPAN_N}
                  ELSE least({_SPAN_N}, pos - prev) END AS contrib
      FROM flag
    ),
    agg AS (
      SELECT doc_id,
             CAST(SUM(new_run) AS BIGINT) AS n_runs,
             CAST(MAX(pos - run_start + 1) + {_SPAN_N - 1} AS BIGINT)
               AS max_run_tokens,
             CAST(SUM(contrib) AS BIGINT) AS covered_tokens
      FROM runs GROUP BY doc_id
    )
    SELECT base.doc_id, base.n_tokens, base.n_spans,
           COALESCE(agg.n_runs, 0) AS n_runs,
           COALESCE(agg.max_run_tokens, 0) AS max_run_tokens,
           COALESCE(agg.covered_tokens, 0) AS covered_tokens,
           CAST(COALESCE(agg.covered_tokens, 0) AS DOUBLE) / base.n_tokens
             AS dup_token_frac
    FROM base LEFT JOIN agg ON base.doc_id = agg.doc_id
"""


# ---------------------------------------------------------------------------
# B41 temperature-reweighted source sampling (data-mixture recipe)
# ---------------------------------------------------------------------------
# The multi-source mixing step of LLM data recipes (alpha-weighted
# sampling a la multilingual BERT / XLM-R, alpha = 0.5): raw source
# shares are flattened to share^alpha and renormalized, up-weighting
# the tail sources.  alpha = 0.5 is deliberate: the reweight is
# sqrt(), which IEEE requires to be CORRECTLY rounded — so unlike a
# general pow() the whole pipeline stays bit-reproducible across
# engines.  Rounding discipline: shares quantize in decimal space
# (B32), sqrt runs on the quantized double, weights re-quantize to
# decimal for an order-independent total, and the final probabilities
# divide in decimal space.  One source-keyed shuffle + two broadcast
# scalars; linear at any corpus size.


def corpus_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_chars, share, alpha_weight, p_sampled):
    alpha=0.5 temperature-reweighted sampling distribution over
    sources."""
    docs = load_table(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("n_chars"),
    )
    total = docs.agg(F.sum(F.length("text")).cast("long").alias("tc"))
    share6 = (
        (F.col("n_chars").cast("decimal(20,14)") / F.col("tc"))
        .cast("decimal(24,6)")
    )
    with_share = src.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "n_chars",
        share6.alias("share6"),
        F.round(F.sqrt(share6.cast("double")), 6)
        .cast("decimal(12,6)")
        .alias("w6"),
    )
    tw = with_share.agg(F.sum("w6").alias("tw"))
    p = (
        (F.col("w6").cast("decimal(20,14)") / F.col("tw"))
        .cast("decimal(24,6)")
        .cast("double")
    )
    return with_share.crossJoin(F.broadcast(tw)).select(
        "source",
        "n_docs",
        "n_chars",
        F.col("share6").cast("double").alias("share"),
        F.col("w6").cast("double").alias("alpha_weight"),
        p.alias("p_sampled"),
    )


QUERIES["corpus_temperature_weights"] = corpus_temperature_weights

ORACLES["corpus_temperature_weights"] = """
    WITH src AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(length(text)) AS BIGINT) AS n_chars
      FROM documents GROUP BY source
    ),
    total AS (SELECT SUM(length(text)) AS tc FROM documents),
    ws AS (
      SELECT source, n_docs, n_chars,
             CAST(CAST(n_chars AS DECIMAL(20,14)) / tc AS DECIMAL(24,6))
               AS share6,
             CAST(ROUND(sqrt(CAST(CAST(CAST(n_chars AS DECIMAL(20,14)) / tc
                          AS DECIMAL(24,6)) AS DOUBLE)), 6) AS DECIMAL(12,6))
               AS w6
      FROM src, total
    ),
    tw AS (SELECT SUM(w6) AS tw FROM ws)
    SELECT source, n_docs, n_chars,
           CAST(share6 AS DOUBLE) AS share,
           CAST(w6 AS DOUBLE) AS alpha_weight,
           CAST(CAST(CAST(w6 AS DECIMAL(20,14)) / tw.tw AS DECIMAL(24,6))
                AS DOUBLE) AS p_sampled
    FROM ws, tw
"""


# ---------------------------------------------------------------------------
# B42 composed corpus keep-list (the pipeline's final verdict)
# ---------------------------------------------------------------------------
# What a user of the engine actually materializes before training: ONE
# keep/drop decision per document with the reason, composed from the
# already-verified stages — exact dedup (B1 min-id representative),
# near-dup clusters (B20 components over verified MinHash pairs, keep
# the representative), and the C4 quality filter (B25).  Reason
# precedence mirrors production pipelines (cheapest-first): exact_dup
# > near_dup > quality > kept.  Because every stage is deterministic
# and oracle-replicated, the COMPOSED decision is hash-checked too —
# the oracle stitches the three stages' oracle texts into one query.
# Scale: each stage is its own linear plan; the composition adds only
# doc_id equi-joins.


def corpus_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, keep, reason): final per-document corpus decision from
    exact dedup, near-dup clustering, and the quality filter."""
    from near_indexer_for_explorer_spark.operators.dedup import (
        components_view,
        dedup_exact_docs,
    )
    from near_indexer_for_explorer_spark.operators.textops import (
        quality_filter_c4,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    exact = dedup_exact_docs(spark, sf_dir).select(
        F.col("text_hash").alias("h"), F.col("keep_id")
    )
    with_hash = docs.select("doc_id", F.md5("text").alias("h"))
    exact_drop = (
        with_hash.join(exact, "h")
        .where(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id", F.lit("exact_dup").alias("r1"))
    )
    near_drop = (
        components_view(spark, sf_dir)
        .where(~F.col("is_representative"))
        .select("doc_id", F.lit("near_dup").alias("r2"))
    )
    qual_drop = (
        quality_filter_c4(spark, sf_dir)
        .where(~F.col("kept"))
        .select("doc_id", F.lit("quality").alias("r3"))
    )
    out = (
        docs.select("doc_id")
        .join(exact_drop, "doc_id", "left")
        .join(near_drop, "doc_id", "left")
        .join(qual_drop, "doc_id", "left")
    )
    reason = F.coalesce(
        F.col("r1"), F.col("r2"), F.col("r3"), F.lit("kept")
    )
    return out.select(
        "doc_id",
        (reason == "kept").alias("keep"),
        reason.alias("reason"),
    )


QUERIES["corpus_keep_list"] = corpus_keep_list


def _keep_list_oracle_sql() -> str:
    from near_indexer_for_explorer_spark.operators.dedup import (
        ORACLES as _DEDUP_ORACLES,
    )
    from near_indexer_for_explorer_spark.operators.textops import (
        ORACLES as _TEXT_ORACLES,
    )

    return f"""
    WITH exact AS (
      SELECT d.doc_id, 'exact_dup' AS r1
      FROM documents d JOIN ({_DEDUP_ORACLES["dedup_exact_docs"]}) e
        ON md5(d.text) = e.text_hash
      WHERE d.doc_id != e.keep_id
    ),
    near AS (
      SELECT doc_id, 'near_dup' AS r2
      FROM ({_DEDUP_ORACLES["dedup_components"]}) c
      WHERE NOT c.is_representative
    ),
    qual AS (
      SELECT doc_id, 'quality' AS r3
      FROM ({_TEXT_ORACLES["quality_filter_c4"]}) q
      WHERE NOT q.kept
    )
    SELECT d.doc_id,
           COALESCE(e.r1, n.r2, q.r3, 'kept') = 'kept' AS keep,
           COALESCE(e.r1, n.r2, q.r3, 'kept') AS reason
    FROM documents d
    LEFT JOIN exact e ON d.doc_id = e.doc_id
    LEFT JOIN near n ON d.doc_id = n.doc_id
    LEFT JOIN qual q ON d.doc_id = q.doc_id
"""


ORACLES["corpus_keep_list"] = _keep_list_oracle_sql()


# ---------------------------------------------------------------------------
# B48 doc-pair alignment stats (SURVEY r6 candidate "doc-pair alignment
# stats"): the pairwise completion of the substring-dedup story — B34
# counts shared grams corpus-wide, B36 finds each doc's maximal shared
# runs against ANYONE, B37 scores candidate pairs by edit distance;
# THIS aligns each LSH candidate PAIR positionally.  Two positions
# (p1, p2) sharing an 8-gram lie on diagonal p1 - p2; maximal runs of
# consecutive p1 along one diagonal are the pair's aligned blocks
# (the dot-plot / Lee et al. 2021 picture), so
# longest_align_tokens = longest common contiguous token block >= 8.
# Coverage per side is the exact interval union of the matched 8-gram
# windows (B36's min(8, gap) trick over distinct positions).
#
# Scale: matches are bounded by the LSH candidate set x shared-gram
# occurrences (never all pairs); the diagonal windows partition on
# (pair, diagonal) — high cardinality, skew-free.  Shares B3's
# candidate CTEs in the oracle (B37 precedent), so candidates cannot
# drift between the operators.
# ---------------------------------------------------------------------------
def dedup_pair_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id_1, doc_id_2, n_matches, longest_align_tokens,
    cov1_tokens, cov2_tokens) per MinHash/LSH candidate pair."""
    from near_indexer_for_explorer_spark.operators.dedup import (
        frozen_lsh_candidates,
    )

    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    # session-frozen shared leg (dedup.py frozen_minhash_index) —
    # already an eager checkpoint, so no extra lazy checkpoint needed
    cand = frozen_lsh_candidates(spark, sf_dir)
    grams = docs.select(
        "doc_id", F.posexplode(word_shingles("t", 8)).alias("pos", "g")
    ).localCheckpoint(eager=False)  # feeds BOTH sides of the match join
    g1 = grams.select(
        F.col("doc_id").alias("doc_id_1"),
        F.col("pos").alias("p1"),
        F.col("g").alias("g1"),
    )
    g2 = grams.select(
        F.col("doc_id").alias("d2k"),
        F.col("pos").alias("p2"),
        F.col("g").alias("g2"),
    )
    matches = (
        cand.join(g1, "doc_id_1")
        .join(
            g2,
            (F.col("doc_id_2") == F.col("d2k")) & (F.col("g1") == F.col("g2")),
        )
        .select("doc_id_1", "doc_id_2", "p1", "p2")
    ).localCheckpoint(eager=False)

    wd = Window.partitionBy("doc_id_1", "doc_id_2", "dg").orderBy("p1")
    wrun = wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    runs = (
        matches.withColumn("dg", F.col("p1") - F.col("p2"))
        .withColumn("prev", F.lag("p1").over(wd))
        .withColumn(
            "new_run",
            F.when(
                F.col("prev").isNull() | (F.col("p1") - F.col("prev") != 1), 1
            ).otherwise(0),
        )
        .withColumn(
            "run_start",
            F.max(F.when(F.col("new_run") == 1, F.col("p1"))).over(wrun),
        )
        .groupBy("doc_id_1", "doc_id_2")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            (F.max(F.col("p1") - F.col("run_start") + 1) + F.lit(7))
            .cast("long")
            .alias("longest_align_tokens"),
        )
    )

    def coverage(pcol: str, alias: str) -> DataFrame:
        wq = Window.partitionBy("doc_id_1", "doc_id_2").orderBy(pcol)
        return (
            matches.select("doc_id_1", "doc_id_2", pcol)
            .distinct()
            .withColumn("prev", F.lag(pcol).over(wq))
            .withColumn(
                "contrib",
                F.when(F.col("prev").isNull(), F.lit(8)).otherwise(
                    F.least(F.lit(8), F.col(pcol) - F.col("prev"))
                ),
            )
            .groupBy("doc_id_1", "doc_id_2")
            .agg(F.sum("contrib").cast("long").alias(alias))
        )

    keys = ["doc_id_1", "doc_id_2"]
    return (
        cand.join(runs, keys, "left")
        .join(coverage("p1", "cov1_tokens"), keys, "left")
        .join(coverage("p2", "cov2_tokens"), keys, "left")
        .select(
            *keys,
            F.coalesce("n_matches", F.lit(0)).cast("long").alias("n_matches"),
            F.coalesce("longest_align_tokens", F.lit(0))
            .cast("long")
            .alias("longest_align_tokens"),
            F.coalesce("cov1_tokens", F.lit(0)).cast("long").alias("cov1_tokens"),
            F.coalesce("cov2_tokens", F.lit(0)).cast("long").alias("cov2_tokens"),
        )
    )


QUERIES["dedup_pair_alignment"] = dedup_pair_alignment


def _pair_alignment_oracle_sql() -> str:
    from near_indexer_for_explorer_spark.operators.dedup import (
        _minhash_cand_ctes,
    )

    gram8 = " || ' ' || ".join(f"t[i+{k}]" if k else "t[i]" for k in range(8))
    return f"""
    {_minhash_cand_ctes()},
    toks8 AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    pg AS (
      SELECT doc_id, i - 1 AS pos, {gram8} AS g
      FROM toks8, UNNEST(range(1, len(t) - 6)) AS r(i)
    ),
    matches AS (
      SELECT c.d1, c.d2, a.pos AS p1, b.pos AS p2
      FROM cand c
      JOIN pg a ON a.doc_id = c.d1
      JOIN pg b ON b.doc_id = c.d2 AND b.g = a.g
    ),
    diag AS (
      SELECT d1, d2, p1, p2, p1 - p2 AS dg,
             lag(p1) OVER (PARTITION BY d1, d2, p1 - p2 ORDER BY p1) AS prev
      FROM matches
    ),
    flagged AS (
      SELECT d1, d2, p1, dg,
             CASE WHEN prev IS NULL OR p1 - prev != 1 THEN 1 ELSE 0 END AS new_run
      FROM diag
    ),
    runs0 AS (
      SELECT d1, d2, p1,
             MAX(CASE WHEN new_run = 1 THEN p1 END)
               OVER (PARTITION BY d1, d2, dg ORDER BY p1
                     ROWS UNBOUNDED PRECEDING) AS run_start
      FROM flagged
    ),
    runs AS (
      SELECT d1, d2, CAST(COUNT(*) AS BIGINT) AS n_matches,
             CAST(MAX(p1 - run_start + 1) + 7 AS BIGINT) AS longest_align_tokens
      FROM runs0 GROUP BY d1, d2
    ),
    cov1 AS (
      SELECT d1, d2, CAST(SUM(contrib) AS BIGINT) AS cov1_tokens FROM (
        SELECT d1, d2,
               CASE WHEN lag(p1) OVER w IS NULL THEN 8
                    ELSE least(8, p1 - lag(p1) OVER w) END AS contrib
        FROM (SELECT DISTINCT d1, d2, p1 FROM matches)
        WINDOW w AS (PARTITION BY d1, d2 ORDER BY p1)
      ) GROUP BY d1, d2
    ),
    cov2 AS (
      SELECT d1, d2, CAST(SUM(contrib) AS BIGINT) AS cov2_tokens FROM (
        SELECT d1, d2,
               CASE WHEN lag(p2) OVER w IS NULL THEN 8
                    ELSE least(8, p2 - lag(p2) OVER w) END AS contrib
        FROM (SELECT DISTINCT d1, d2, p2 FROM matches)
        WINDOW w AS (PARTITION BY d1, d2 ORDER BY p2)
      ) GROUP BY d1, d2
    )
    SELECT c.d1 AS doc_id_1, c.d2 AS doc_id_2,
           COALESCE(r.n_matches, 0) AS n_matches,
           COALESCE(r.longest_align_tokens, 0) AS longest_align_tokens,
           COALESCE(c1.cov1_tokens, 0) AS cov1_tokens,
           COALESCE(c2.cov2_tokens, 0) AS cov2_tokens
    FROM cand c
    LEFT JOIN runs r ON r.d1 = c.d1 AND r.d2 = c.d2
    LEFT JOIN cov1 c1 ON c1.d1 = c.d1 AND c1.d2 = c.d2
    LEFT JOIN cov2 c2 ON c2.d1 = c.d1 AND c2.d2 = c.d2
    """


ORACLES["dedup_pair_alignment"] = _pair_alignment_oracle_sql()


# ---------------------------------------------------------------------------
# B57 sliding-window context chunking: the LLM-ingest step between raw
# documents and fixed-budget training sequences.  B29 packs WHOLE
# documents into token-budget shards; long documents must first be cut
# into model-context-sized windows, and production pipelines overlap
# consecutive windows (stride < window) so no semantic boundary is
# ever lost to a hard cut.  Pure map-side: tokenize, explode one row
# per window start (0, S, 2S, ...), slice — zero shuffle,
# embarrassingly parallel, the same plan at 100 TB.
#
# Window math is shared exactly with the oracle: n_chunks =
# 1 + ceil(max(0, len - N) / S) computed as integer division of
# NON-NEGATIVE terms only — Spark's `div` truncates toward zero while
# DuckDB's `//` floors, so a negative numerator would silently
# diverge between engines (the greatest(0, ...) sits INSIDE the
# numerator for exactly that reason).  The chunk content is emitted
# as an md5 hash: content-addressed, hash-checked, and the output
# relation stays narrow.
#
# Reference analog: chunked receipt-args storage (args split across
# rows, database/src/adapters/transactions.rs).
# ---------------------------------------------------------------------------
_CHUNK_N = 64  # window: tokens per chunk
_CHUNK_STRIDE = 48  # overlap of 16 tokens between consecutive chunks


def corpus_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_idx, start_tok, n_tokens, chunk_hash): each
    document cut into 64-token windows at stride 48 (16-token
    overlap), last window ragged; chunk content content-addressed by
    md5."""
    n, s = _CHUNK_N, _CHUNK_STRIDE
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("t")
    )
    base = docs.withColumn("len", F.size("t"))
    nch = F.lit(1) + F.expr(
        f"(greatest(0, len - {n}) + {s} - 1) div {s}"
    )
    exploded = base.select(
        "doc_id",
        "t",
        "len",
        F.explode(F.sequence(F.lit(0), nch - 1)).alias("i"),
    )
    start = F.col("i") * s
    upper = F.least(start + n, F.col("len"))
    return exploded.select(
        "doc_id",
        F.col("i").cast("long").alias("chunk_idx"),
        start.cast("long").alias("start_tok"),
        (upper - start).cast("long").alias("n_tokens"),
        F.md5(
            F.concat_ws(
                " ", F.slice(F.col("t"), start + 1, (upper - start))
            )
        ).alias("chunk_hash"),
    )


QUERIES["corpus_chunk_windows"] = corpus_chunk_windows

ORACLES["corpus_chunk_windows"] = f"""
    WITH {_TOKS_CTE},
    base AS (SELECT doc_id, t, len(t) AS n FROM toks),
    chunks AS (
      SELECT doc_id, i,
             i * {_CHUNK_STRIDE} AS start_tok,
             least(i * {_CHUNK_STRIDE} + {_CHUNK_N}, n) AS upper_tok, t
      FROM base,
      UNNEST(range(0, 1 + (greatest(0, n - {_CHUNK_N}) + {_CHUNK_STRIDE} - 1)
                          // {_CHUNK_STRIDE})) AS r(i)
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           CAST(start_tok AS BIGINT) AS start_tok,
           CAST(upper_tok - start_tok AS BIGINT) AS n_tokens,
           md5(array_to_string(t[start_tok + 1 : upper_tok], ' ')) AS chunk_hash
    FROM chunks
"""


# ---------------------------------------------------------------------------
# B58 deterministic weighted sampling WITHOUT replacement
# (Efraimidis-Spirakis 2006 "A-ES"): every corpus-curation pipeline
# ends with "draw a k-doc sample, long documents proportionally more
# likely" — naive rand() breaks reproducibility and resampling breaks
# without-replacement.  A-ES draws u_i ~ U(0,1] per item and keeps the
# k LARGEST u_i^(1/w_i); ranking by ln(u)/w is the monotone-equivalent
# form that avoids pow().  The uniform comes from the corpus's md5
# hash discipline (first 8 hex digits -> 32-bit integer -> (x+1)/2^32),
# so the sample is a pure function of doc_id: deterministic across
# runs, engines, and partitionings, and the oracle replicates it
# digit-for-digit.  ln is transcendental, so keys are round-6 before
# ranking with a doc_id tiebreak (the B27/B33 libm discipline).
#
# Scale: one linear scan computes every key map-side; the top-k is a
# bounded TakeOrdered reduction (k rows), and the rank window runs
# over those k rows only — no global sort of the corpus.  The sample
# is stable under corpus growth: adding documents never changes the
# relative order of existing keys (the property that makes A-ES the
# streaming/distributed standard).
# ---------------------------------------------------------------------------
_SAMPLE_K = 100
_U32 = 1 << 32


def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_chars, skey, sample_rank): the deterministic A-ES
    size-weighted sample of _SAMPLE_K documents, ranked by round-6
    ln(u)/w descending with doc_id tiebreak."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    x = _hash_bucket(F.col("doc_id"), "wsample:", _U32)
    u = (x + F.lit(1)).cast("double") / F.lit(float(_U32))
    keyed = docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.round(F.log(u) / w, 6).alias("skey"),
    )
    top = keyed.orderBy(F.col("skey").desc(), F.col("doc_id").asc()).limit(
        _SAMPLE_K
    )
    rank_w = Window.orderBy(F.col("skey").desc(), F.col("doc_id").asc())
    return top.withColumn(
        "sample_rank", F.row_number().over(rank_w).cast("long")
    )


QUERIES["corpus_weighted_sample"] = corpus_weighted_sample

ORACLES["corpus_weighted_sample"] = f"""
    WITH s AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
             CAST(greatest(n_chars, 1) AS DOUBLE) AS w,
             {_hash_bucket_sql("doc_id", "wsample:", _U32)} AS x
      FROM documents
    ),
    k AS (
      SELECT doc_id, n_chars,
             round(ln(CAST(x + 1 AS DOUBLE) / {float(_U32)!r}) / w, 6) AS skey
      FROM s
    )
    SELECT doc_id, n_chars, skey,
           CAST(ROW_NUMBER() OVER (ORDER BY skey DESC, doc_id ASC) AS BIGINT)
             AS sample_rank
    FROM k
    ORDER BY skey DESC, doc_id ASC
    LIMIT {_SAMPLE_K}
"""


# ---------------------------------------------------------------------------
# B59 bigram Stupid-Backoff cross-entropy (Brants et al. 2007 "Large
# Language Models in Machine Translation"): the production upgrade of
# B33's unigram filter.  CCNet-style quality ranking really runs on
# n-gram LMs; Stupid Backoff is THE web-scale choice because its
# scores need no discounting normalization — S(w_i|w_{i-1}) =
# c(w_{i-1}w_i)/c(w_{i-1}) when the train split saw the bigram, else
# 0.4 * p_uni(w_i), with B33's add-one unigram as the backoff floor
# (first token of a doc scores p_uni directly).  Every convention is
# shared with B33 (same md5 split, same add-one unigram, same round-6
# ln + DECIMAL(20,6) sum discipline) so the two filters are
# comparable score-for-score.
#
# Plan shape: bigrams come from the token ARRAY map-side (transform
# over positions -> one explode; no window, no O(len^2) row payloads);
# the unigram LM joins broadcast (vocab-sized), the bigram table joins
# on its composite key WITHOUT a broadcast hint — at 100 TB that
# relation is token-stream-sized and the join is a plain shuffle on
# (prev, cur), linear.  n_bigram_hits makes the backoff rate itself a
# hash-checked output.
# ---------------------------------------------------------------------------
_BACKOFF_ALPHA = 0.4


def bigram_backoff_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, split, n_tokens, n_bigram_hits, xent): per-document
    cross-entropy under the train-split Stupid-Backoff bigram LM."""
    docs = load_table(spark, sf_dir, "documents")
    sb = _hash_bucket(F.col("doc_id"), "split:", _SPLIT_MOD)
    split = F.when(sb < 32, "train").when(sb < 36, "val").otherwise("test")
    base = docs.select("doc_id", split.alias("split"), tokens("text").alias("t"))
    pairs = base.select(
        "doc_id",
        "split",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t)), i -> named_struct("
                "'prev', CASE WHEN i = 1 THEN NULL ELSE element_at(t, i - 1) END,"
                "'cur', element_at(t, i)))"
            )
        ).alias("p"),
    ).select("doc_id", "split", F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))

    train = pairs.where(F.col("split") == "train")
    tc = train.groupBy("cur").agg(F.count(F.lit(1)).alias("c"))
    bc = (
        train.where(F.col("prev").isNotNull())
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    totals = tc.agg(
        F.sum("c").alias("n_train"), F.count(F.lit(1)).alias("v_train")
    )

    tcur = tc.select(F.col("cur").alias("cur"), F.col("c").alias("c_cur"))
    tprev = tc.select(F.col("cur").alias("prev"), F.col("c").alias("c_prev"))
    p_uni = (F.coalesce(F.col("c_cur"), F.lit(0)) + 1).cast("double") / (
        F.col("n_train") + F.col("v_train")
    )
    is_bigram = F.col("prev").isNotNull() & F.col("cb").isNotNull()
    lp = F.round(
        F.when(is_bigram, F.log(F.col("cb").cast("double") / F.col("c_prev")))
        .when(F.col("prev").isNull(), F.log(p_uni))
        .otherwise(F.log(F.lit(_BACKOFF_ALPHA) * p_uni)),
        6,
    )
    fits = vocab_dims_fit(sf_dir)
    return (
        pairs.join(bc, ["prev", "cur"], "left")
        .join(dim_join(tprev, fits), "prev", "left")
        .join(dim_join(tcur, fits), "cur", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "split",
            lp.alias("lp"),
            is_bigram.cast("int").alias("hit"),
        )
        .groupBy("doc_id", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("hit").cast("long").alias("n_bigram_hits"),
            # B33 discipline: round-6 per-token ln, exact decimal sum,
            # one IEEE division, NO final round
            (
                -F.sum(F.col("lp").cast("decimal(20,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("xent"),
        )
    )


QUERIES["bigram_backoff_xent"] = bigram_backoff_xent

ORACLES["bigram_backoff_xent"] = f"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN {_hash_bucket_sql("doc_id", "split:", _SPLIT_MOD)} < 32
                  THEN 'train'
                  WHEN {_hash_bucket_sql("doc_id", "split:", _SPLIT_MOD)} < 36
                  THEN 'val' ELSE 'test' END AS split,
             string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    pairs AS (
      SELECT doc_id, split,
             CASE WHEN i = 1 THEN NULL ELSE t[i - 1] END AS prev,
             t[i] AS cur
      FROM d, UNNEST(range(1, len(t) + 1)) AS r(i)
    ),
    tc AS (
      SELECT cur, COUNT(*) AS c FROM pairs WHERE split = 'train' GROUP BY cur
    ),
    bc AS (
      SELECT prev, cur, COUNT(*) AS cb FROM pairs
      WHERE split = 'train' AND prev IS NOT NULL GROUP BY prev, cur
    ),
    tot AS (SELECT SUM(c) AS n_train, COUNT(*) AS v_train FROM tc),
    lp AS (
      SELECT p.doc_id, p.split,
             CASE WHEN p.prev IS NOT NULL AND b.cb IS NOT NULL
                  THEN 1 ELSE 0 END AS hit,
             ROUND(CASE
               WHEN p.prev IS NOT NULL AND b.cb IS NOT NULL
                 THEN ln(CAST(b.cb AS DOUBLE) / tp.c)
               WHEN p.prev IS NULL
                 THEN ln(CAST(COALESCE(tcur.c, 0) + 1 AS DOUBLE)
                         / (tot.n_train + tot.v_train))
               ELSE ln({_BACKOFF_ALPHA}
                       * (CAST(COALESCE(tcur.c, 0) + 1 AS DOUBLE)
                          / (tot.n_train + tot.v_train)))
             END, 6) AS lp
      FROM pairs p
      LEFT JOIN bc b ON p.prev = b.prev AND p.cur = b.cur
      LEFT JOIN tc tp ON p.prev = tp.cur
      LEFT JOIN tc tcur ON p.cur = tcur.cur, tot
    )
    SELECT doc_id, split,
           COUNT(*) AS n_tokens,
           CAST(SUM(hit) AS BIGINT) AS n_bigram_hits,
           -CAST(CAST(SUM(CAST(lp AS DECIMAL(20,6))) AS VARCHAR) AS DOUBLE)
                 / COUNT(*) AS xent
    FROM lp
    GROUP BY doc_id, split
"""


# ---------------------------------------------------------------------------
# B60 Bloom membership screen, RELATIONAL form (Bloom 1970; the Chang
# et al. 2006 Bigtable usage): "have we seen this key before" is THE
# primitive under streaming dedup, incremental ingest, and join
# pre-filtering at 100 TB.  The textbook implementation is a bit array
# in one process's memory; the DISTRIBUTED form used here stores the
# filter as a (word_idx, bits) RELATION — built by one explode +
# bit_or aggregate (map-side combinable, linear), probed by computing
# each probe key's k (word_idx, mask) pairs and hash-joining the
# filter relation on word_idx.  A gigabyte-scale bloom stays a
# perfectly ordinary co-partitioned join this way — no driver-side
# bitset, no UDF, and (because positions derive from the corpus md5
# discipline) the whole filter is deterministic and oracle-replicable
# bit-for-bit.
#
# The registered query makes the sketch's CONTRACT the output (B31/B51
# evaluation-as-data discipline): users seen in even events form the
# filter, odd events probe it, and the exact seen-set rides alongside —
# so n_false_neg (structurally zero: all k bits of a seen key are set)
# and the realized false-positive rate are hash-checked columns, not
# assumptions.  32-bit words keep every mask positive in both engines
# (1<<63 sign traps avoided by construction).
# ---------------------------------------------------------------------------
_BLOOM_BITS = 16384  # m (the registered query's fixed, oracle-replicated size)
_BLOOM_WORD = 32  # bits per word -> word_idx = pos // 32
_BLOOM_K = 4  # hash functions
# Broadcast the (word_idx, bits) relation only while it is genuinely
# dim-sized: 2^22 filter bits = 2^17 word rows (~2 MB hashed) — past
# that the probe stays a plain shuffle equi-join on word_idx, which is
# the whole point of the relational form (a 100 TB corpus needs
# ~10 bits/key, i.e. a GB-scale filter no executor should hold whole).
_BLOOM_BROADCAST_MAX_BITS = 1 << 22


def bloom_m_for_keys(n_keys: int, bits_per_key: int = 10) -> int:
    """Size the filter from the key count at a constant bits/key ratio
    (10 bits/key ~= 1% fp at k=4..7), rounded up to a power of two so
    the modulo keeps its uniformity; floored at the registered query's
    fixed m."""
    m = _BLOOM_BITS
    while m < n_keys * bits_per_key:
        m *= 2
    return m


def build_sized_bloom(
    keys: DataFrame, key: str = "user_id", bits_per_key: int = 10
) -> tuple[DataFrame, int]:
    """(bloom_relation, m_bits): the production build path — count the
    distinct keys (one scalar action, the same bounded stats-scan
    pattern as the z-order compactor), size m from it, and build the
    (word_idx, bits) relation at that size.  The registered B60 query
    keeps the FIXED _BLOOM_BITS so its DuckDB oracle replicates
    positions bit-for-bit; this sized variant is the one a pipeline
    should call."""
    n_keys = keys.select(key).distinct().count()
    m_bits = bloom_m_for_keys(n_keys, bits_per_key)
    return bloom_bits_of(keys, key, m_bits=m_bits), m_bits


def bloom_positions(
    df: DataFrame, key: str = "user_id", m_bits: int = _BLOOM_BITS
) -> DataFrame:
    """Explode each row into its _BLOOM_K (word_idx, mask) pairs.
    MODULE-LEVEL so the streaming maintenance sink (C22) imports the
    identical expressions — stream and batch cannot drift (the C13
    shared-constants lesson)."""
    legs = []
    for j in range(_BLOOM_K):
        pos = _hash_bucket(F.col(key), f"bloom{j}:", m_bits)
        legs.append(
            df.withColumn("__pos", pos)
            .withColumn(
                "word_idx", F.expr(f"CAST(__pos div {_BLOOM_WORD} AS BIGINT)")
            )
            .withColumn(
                "mask",
                F.expr(f"shiftleft(1L, CAST(__pos % {_BLOOM_WORD} AS INT))"),
            )
            .drop("__pos")
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def bloom_bits_of(
    keys: DataFrame, key: str = "user_id", m_bits: int = _BLOOM_BITS
) -> DataFrame:
    """(word_idx, bits): the bloom relation of a key set — one explode
    + one map-combinable bit_or aggregate."""
    return (
        bloom_positions(keys, key, m_bits=m_bits)
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe_members(
    probes: DataFrame,
    bloom: DataFrame,
    id_cols: list[str],
    key: str = "user_id",
    m_bits: int = _BLOOM_BITS,
) -> DataFrame:
    """Per-probe-row membership verdict: id_cols + `member`.

    The join strategy is gated on the filter SIZE: a dim-sized filter
    (m_bits <= _BLOOM_BROADCAST_MAX_BITS) broadcasts; anything larger
    plans as an ordinary co-partitioned shuffle equi-join on word_idx —
    the hint must never force a GB-scale relation onto every executor
    (tests/test_plans.py pins both plans)."""
    blm = (
        F.broadcast(bloom) if m_bits <= _BLOOM_BROADCAST_MAX_BITS else bloom
    )
    return (
        bloom_positions(probes, key, m_bits=m_bits)
        .join(blm, "word_idx", "left")
        .withColumn(
            "hit",
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
                == F.col("mask")
            ),
        )
        .groupBy(*id_cols)
        .agg(F.min("hit").alias("member"))
    )


def bloom_seen_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_probes, n_member, n_true_seen, n_false_pos,
    n_false_neg, fp_rate): odd events probed against the bloom of
    users seen in even events, with the exact answer alongside."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    seen = (
        ev.where(F.col("event_id") % 2 == 0).select("user_id").distinct()
    )
    bloom = bloom_bits_of(seen)

    probes = ev.where(F.col("event_id") % 2 == 1)
    hit = bloom_probe_members(
        probes.select("event_id", "user_id", "event_type"),
        bloom,
        ["event_id", "user_id", "event_type"],
    )
    truth = seen.withColumn("truly_seen", F.lit(True))
    joined = hit.join(truth, "user_id", "left").withColumn(
        "truly_seen", F.coalesce(F.col("truly_seen"), F.lit(False))
    )
    n_probes = F.count(F.lit(1))
    n_true = F.sum(F.col("truly_seen").cast("long"))
    n_fp = F.sum((F.col("member") & ~F.col("truly_seen")).cast("long"))
    return joined.groupBy("event_type").agg(
        n_probes.cast("long").alias("n_probes"),
        F.sum(F.col("member").cast("long")).cast("long").alias("n_member"),
        n_true.cast("long").alias("n_true_seen"),
        n_fp.cast("long").alias("n_false_pos"),
        F.sum((~F.col("member") & F.col("truly_seen")).cast("long"))
        .cast("long")
        .alias("n_false_neg"),
        (
            n_fp.cast("double")
            / F.nullif(n_probes - n_true, F.lit(0)).cast("double")
        ).alias("fp_rate"),
    )


QUERIES["bloom_seen_filter"] = bloom_seen_filter


def _bloom_oracle_sql() -> str:
    # hash positions land as plain columns FIRST (a lambda inside a
    # lateral UNNEST breaks DuckDB's binder), then the struct list
    # references only those columns
    pos_cols = ", ".join(
        f"({_hash_bucket_sql('user_id', f'bloom{j}:', _BLOOM_BITS)}) AS p{j}"
        for j in range(_BLOOM_K)
    )
    pos_structs = ", ".join(
        f"{{'word_idx': p{j} // {_BLOOM_WORD},"
        f" 'mask': (1::BIGINT << CAST(p{j} % {_BLOOM_WORD} AS INTEGER))}}"
        for j in range(_BLOOM_K)
    )
    return f"""
    WITH seen AS (
      SELECT DISTINCT user_id FROM events WHERE event_id % 2 = 0
    ),
    seen_hash AS (SELECT user_id, {pos_cols} FROM seen),
    seen_pos AS (
      SELECT u.wm.word_idx AS word_idx, u.wm.mask AS mask
      FROM seen_hash, UNNEST([{pos_structs}]) AS u(wm)
    ),
    bloom AS (
      SELECT word_idx, bit_or(mask) AS bits FROM seen_pos GROUP BY word_idx
    ),
    probes AS (
      SELECT event_id, user_id, event_type FROM events WHERE event_id % 2 = 1
    ),
    probe_hash AS (
      SELECT event_id, user_id, event_type, {pos_cols} FROM probes
    ),
    probe_pos AS (
      SELECT p.event_id, p.user_id, p.event_type,
             u.wm.word_idx AS word_idx, u.wm.mask AS mask
      FROM probe_hash p, UNNEST([{pos_structs}]) AS u(wm)
    ),
    hits AS (
      SELECT pp.event_id, pp.user_id, pp.event_type,
             bool_and((COALESCE(b.bits, 0) & pp.mask) = pp.mask) AS member
      FROM probe_pos pp LEFT JOIN bloom b ON pp.word_idx = b.word_idx
      GROUP BY pp.event_id, pp.user_id, pp.event_type
    ),
    flagged AS (
      SELECT h.event_type, h.member,
             (s.user_id IS NOT NULL) AS truly_seen
      FROM hits h LEFT JOIN seen s ON h.user_id = s.user_id
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(SUM(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT) AS n_member,
           CAST(SUM(CASE WHEN truly_seen THEN 1 ELSE 0 END) AS BIGINT) AS n_true_seen,
           CAST(SUM(CASE WHEN member AND NOT truly_seen THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
           CAST(SUM(CASE WHEN NOT member AND truly_seen THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg,
           CAST(SUM(CASE WHEN member AND NOT truly_seen THEN 1 ELSE 0 END) AS DOUBLE)
             / NULLIF(COUNT(*) - SUM(CASE WHEN truly_seen THEN 1 ELSE 0 END), 0) AS fp_rate
    FROM flagged
    GROUP BY event_type
"""


ORACLES["bloom_seen_filter"] = _bloom_oracle_sql()


# ---------------------------------------------------------------------------
# B61 DSIR importance weights (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling").  The production
# data-selection primitive: score every raw document by how much more
# likely its hashed n-gram bag is under a TARGET distribution than
# under the RAW distribution, log w(x) = sum_f c_f(x) * ln(p_f / q_f),
# then resample raw data proportional to w.  The paper's own trick
# makes this distributable at any corpus size: features are unigrams +
# word-bigrams HASHED into a fixed bucket space, so both "LMs" are
# fixed-size count vectors (one map-combined aggregate each) and the
# per-bucket log-ratio table is a broadcastable dim no matter how big
# the corpus grows.  Target here is the val split (the stand-in for a
# curated target-domain sample), raw is the train split; both
# estimates are add-one smoothed over the bucket space.
#
# Shape: one explode -> bucket agg (<= _DSIR_BUCKETS rows, broadcast
# back) -> doc agg.  Two shuffles, both linear; zero UDFs.  Per-bucket
# ln(ratio) is round-6 then decimal-summed per doc (B33 libm + order-
# independence discipline); log_w is the exact decimal sum cast to
# double, no final round.
#
# Reference analog: the indexer's arg/event text surface feeding
# downstream relevance ranking; here the LLM-curation counterpart the
# brief lists as first-class.
# ---------------------------------------------------------------------------
_DSIR_BUCKETS = 1024


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, split, n_feats, log_w): hashed unigram+bigram DSIR log
    importance weight of every document (target = val split LM, raw =
    train split LM, add-one smoothing over the hashed bucket space)."""
    docs = load_table(spark, sf_dir, "documents")
    sb = _hash_bucket(F.col("doc_id"), "split:", _SPLIT_MOD)
    split = F.when(sb < 32, "train").when(sb < 36, "val").otherwise("test")
    base = docs.select("doc_id", split.alias("split"), tokens("text").alias("t"))
    # r14: the hashed feature stream feeds BOTH the bucket LM counts
    # and the final per-doc weight join — checkpoint it so the corpus
    # tokenize/explode/md5-bucket pass runs once per query, not twice
    # (the dedup family's posting-list move); bt (1024 rows) likewise
    # feeds totals and the ratio table
    feats = base.select(
        "doc_id",
        "split",
        F.explode(
            F.concat(F.col("t"), word_shingles("t", 2))
        ).alias("g"),
    ).select(
        "doc_id",
        "split",
        _hash_bucket(F.col("g"), "dsir:", _DSIR_BUCKETS).alias("b"),
    ).localCheckpoint(eager=False)
    bt = feats.groupBy("b").agg(
        F.sum(F.when(F.col("split") == "val", 1).otherwise(0)).alias("ct"),
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("cr"),
    ).localCheckpoint(eager=False)
    totals = bt.agg(F.sum("ct").alias("nt"), F.sum("cr").alias("nr"))
    # identical association order as the oracle: (ct+1)/(nt+B) and
    # (cr+1)/(nr+B) each one IEEE division, then one quotient, ln,
    # round-6 (transcendental output -> boundary measure ~0)
    lr = F.round(
        F.log(
            (
                (F.col("ct") + 1).cast("double")
                / (F.col("nt") + F.lit(_DSIR_BUCKETS))
            )
            / (
                (F.col("cr") + 1).cast("double")
                / (F.col("nr") + F.lit(_DSIR_BUCKETS))
            )
        ),
        6,
    )
    lrt = bt.crossJoin(F.broadcast(totals)).select("b", lr.alias("lr"))
    return (
        feats.join(F.broadcast(lrt), "b")
        .groupBy("doc_id", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum(F.col("lr").cast("decimal(20,6)")).cast("double").alias("log_w"),
        )
    )


QUERIES["dsir_importance_weights"] = dsir_importance_weights

ORACLES["dsir_importance_weights"] = f"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN {_hash_bucket_sql("doc_id", "split:", _SPLIT_MOD)} < 32
                  THEN 'train'
                  WHEN {_hash_bucket_sql("doc_id", "split:", _SPLIT_MOD)} < 36
                  THEN 'val' ELSE 'test' END AS split,
             string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id, split, UNNEST(t) AS g FROM d
      UNION ALL
      SELECT doc_id, split, t[i] || ' ' || t[i+1] AS g
      FROM d, UNNEST(range(1, len(t))) AS r(i)
    ),
    feats AS (
      SELECT doc_id, split,
             {_hash_bucket_sql("g", "dsir:", _DSIR_BUCKETS)} AS b
      FROM grams
    ),
    bt AS (
      SELECT b,
             SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS ct,
             SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS cr
      FROM feats GROUP BY b
    ),
    tot AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM bt),
    lrt AS (
      SELECT b,
             ROUND(ln((CAST(ct + 1 AS DOUBLE) / (nt + {_DSIR_BUCKETS}))
                      / (CAST(cr + 1 AS DOUBLE) / (nr + {_DSIR_BUCKETS}))), 6) AS lr
      FROM bt, tot
    )
    SELECT f.doc_id, f.split,
           COUNT(*) AS n_feats,
           CAST(CAST(SUM(CAST(lr AS DECIMAL(20,6))) AS VARCHAR) AS DOUBLE) AS log_w
    FROM feats f JOIN lrt USING (b)
    GROUP BY f.doc_id, f.split
"""


# ---------------------------------------------------------------------------
# B62 interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; Chen &
# Goodman 1999's interpolated form) — the production upgrade of B59's
# Stupid Backoff and the declarative analog of the KenLM perplexity
# filters CCNet-style pipelines run.  KN's insight over count backoff:
# the lower-order distribution should model how DIVERSELY a word
# continues contexts (N1+(.,w): in how many distinct bigram types does
# w appear as the continuation), not how often it occurs — "Francisco"
# is frequent but only ever follows "San", so its continuation
# probability is tiny.  Interpolated form with absolute discount D:
#
#   P(w|prev) = max(c(prev,w) - D, 0) / c(prev.)
#             + (D * N1+(prev,.) / c(prev.)) * Pcont(w)
#   Pcont(w)  = (N1+(.,w) + 1) / (T + V + 1)     [add-one over the
#               continuation space keeps OOV continuations finite]
#
# where c(prev.) is prev's bigram-token marginal, N1+(prev,.) its
# distinct-continuation count, T the number of distinct bigram types
# and V the continuation vocabulary.  First tokens and unseen-starter
# contexts score Pcont(w) directly.  D = 0.75 (the Chen-Goodman
# default; exactly representable in binary so the discount arithmetic
# is bit-stable).
#
# Every input to the probability expression is an exact integer count;
# the expression tree is written with IDENTICAL association in both
# engines, so ln's argument is bit-identical; round-6 ln -> decimal
# sum -> one division (the B33/B59 discipline).  Plan shape == B59:
# map-side pair explode, token-stream-sized bigram table joined
# WITHOUT broadcast, vocab-sized marginal/continuation dims broadcast,
# one doc_id aggregate.
# ---------------------------------------------------------------------------
_KN_D = 0.75


def kneser_ney_bigram_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, split, n_tokens, n_bigram_hits, xent): per-document
    cross-entropy under the train-split interpolated Kneser-Ney bigram
    LM."""
    docs = load_table(spark, sf_dir, "documents")
    sb = _hash_bucket(F.col("doc_id"), "split:", _SPLIT_MOD)
    split = F.when(sb < 32, "train").when(sb < 36, "val").otherwise("test")
    base = docs.select("doc_id", split.alias("split"), tokens("text").alias("t"))
    pairs = base.select(
        "doc_id",
        "split",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t)), i -> named_struct("
                "'prev', CASE WHEN i = 1 THEN NULL ELSE element_at(t, i - 1) END,"
                "'cur', element_at(t, i)))"
            )
        ).alias("p"),
    ).select("doc_id", "split", F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))

    train_bi = (
        pairs.where((F.col("split") == "train") & F.col("prev").isNotNull())
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    # prev marginals over the BIGRAM table: token marginal c(prev.) and
    # distinct-continuation count N1+(prev,.)
    prev_marg = train_bi.groupBy("prev").agg(
        F.sum("cb").alias("cpm"), F.count(F.lit(1)).alias("d1")
    )
    # continuation counts N1+(.,w)
    cont = train_bi.groupBy("cur").agg(F.count(F.lit(1)).alias("nc"))
    totals = train_bi.agg(
        F.count(F.lit(1)).alias("tt"),  # distinct bigram types T
        F.count_distinct(F.col("cur")).alias("vc"),  # continuation vocab V
    )

    pcont = (F.coalesce(F.col("nc"), F.lit(0)) + 1).cast("double") / (
        F.col("tt") + F.col("vc") + 1
    )
    pkn = (
        F.greatest(
            F.coalesce(F.col("cb"), F.lit(0)).cast("double") - F.lit(_KN_D),
            F.lit(0.0),
        )
        / F.col("cpm")
        + ((F.lit(_KN_D) * F.col("d1")) / F.col("cpm")) * pcont
    )
    seen_ctx = F.col("prev").isNotNull() & F.col("cpm").isNotNull()
    lp = F.round(F.log(F.when(seen_ctx, pkn).otherwise(pcont)), 6)
    hit = (F.col("prev").isNotNull() & F.col("cb").isNotNull()).cast("int")
    fits = vocab_dims_fit(sf_dir)
    return (
        pairs.join(train_bi, ["prev", "cur"], "left")
        .join(dim_join(prev_marg, fits), "prev", "left")
        .join(dim_join(cont, fits), "cur", "left")
        .crossJoin(F.broadcast(totals))
        .select("doc_id", "split", lp.alias("lp"), hit.alias("hit"))
        .groupBy("doc_id", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("hit").cast("long").alias("n_bigram_hits"),
            (
                -F.sum(F.col("lp").cast("decimal(20,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("xent"),
        )
    )


QUERIES["kneser_ney_bigram_xent"] = kneser_ney_bigram_xent

ORACLES["kneser_ney_bigram_xent"] = f"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN {_hash_bucket_sql("doc_id", "split:", _SPLIT_MOD)} < 32
                  THEN 'train'
                  WHEN {_hash_bucket_sql("doc_id", "split:", _SPLIT_MOD)} < 36
                  THEN 'val' ELSE 'test' END AS split,
             string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    pairs AS (
      SELECT doc_id, split,
             CASE WHEN i = 1 THEN NULL ELSE t[i - 1] END AS prev,
             t[i] AS cur
      FROM d, UNNEST(range(1, len(t) + 1)) AS r(i)
    ),
    bi AS (
      SELECT prev, cur, COUNT(*) AS cb FROM pairs
      WHERE split = 'train' AND prev IS NOT NULL GROUP BY prev, cur
    ),
    pm AS (
      SELECT prev, SUM(cb) AS cpm, COUNT(*) AS d1 FROM bi GROUP BY prev
    ),
    cont AS (
      SELECT cur, COUNT(*) AS nc FROM bi GROUP BY cur
    ),
    tot AS (
      SELECT COUNT(*) AS tt, COUNT(DISTINCT cur) AS vc FROM bi
    ),
    lp AS (
      SELECT p.doc_id, p.split,
             CASE WHEN p.prev IS NOT NULL AND b.cb IS NOT NULL
                  THEN 1 ELSE 0 END AS hit,
             ROUND(ln(CASE
               WHEN p.prev IS NOT NULL AND pm.cpm IS NOT NULL THEN
                 greatest(CAST(COALESCE(b.cb, 0) AS DOUBLE) - {_KN_D}, 0.0)
                   / pm.cpm
                 + (({_KN_D} * pm.d1) / pm.cpm)
                   * (CAST(COALESCE(cont.nc, 0) + 1 AS DOUBLE)
                      / (tot.tt + tot.vc + 1))
               ELSE
                 CAST(COALESCE(cont.nc, 0) + 1 AS DOUBLE)
                   / (tot.tt + tot.vc + 1)
             END), 6) AS lp
      FROM pairs p
      LEFT JOIN bi b ON p.prev = b.prev AND p.cur = b.cur
      LEFT JOIN pm ON p.prev = pm.prev
      LEFT JOIN cont ON p.cur = cont.cur, tot
    )
    SELECT doc_id, split,
           COUNT(*) AS n_tokens,
           CAST(SUM(hit) AS BIGINT) AS n_bigram_hits,
           -CAST(CAST(SUM(CAST(lp AS DECIMAL(20,6))) AS VARCHAR) AS DOUBLE)
                 / COUNT(*) AS xent
    FROM lp
    GROUP BY doc_id, split
"""


# ---------------------------------------------------------------------------
# B68 quality-budget operating curve — the calibration step between a
# continuous quality score and a FILTER decision.  CCNet (Wenzek 2020)
# ranks documents by LM perplexity and keeps the best slice up to a
# token budget; choosing the cut requires exactly this curve: for each
# candidate cross-entropy threshold, how many documents and how many
# TOKENS survive (training budgets are token-denominated, and long
# docs dominate — doc_frac and token_frac diverge, which is the
# operating decision).  Composes B33's verified unigram_xent scores
# (the B42/B51 composition discipline: the curve's oracle stitches
# B33's oracle text as a subquery, so the composed decision is itself
# hash-checked).  Thresholds explode map-side over the doc-grain score
# relation; one aggregate; corpus totals enter as a broadcast 1-row
# aggregate.  Linear at any scale.
# ---------------------------------------------------------------------------
_QB_THRESHOLDS = [4.0, 4.5, 5.0, 5.5, 6.0, 6.5, 7.0, 7.5, 8.0]


def quality_budget_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(threshold, n_docs_kept, n_tokens_kept, doc_frac, token_frac):
    survivors under "keep docs with unigram cross-entropy <= t" for
    each candidate threshold."""
    scored = unigram_xent(spark, sf_dir)
    totals = scored.agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    ex = scored.select(
        "xent",
        "n_tokens",
        F.explode(
            F.array(*[F.lit(t) for t in _QB_THRESHOLDS])
        ).alias("threshold"),
    )
    return (
        ex.groupBy("threshold")
        .agg(
            F.sum(F.when(F.col("xent") <= F.col("threshold"), 1).otherwise(0))
            .cast("long")
            .alias("n_docs_kept"),
            F.sum(
                F.when(F.col("xent") <= F.col("threshold"), F.col("n_tokens"))
                .otherwise(0)
            )
            .cast("long")
            .alias("n_tokens_kept"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "threshold",
            "n_docs_kept",
            "n_tokens_kept",
            (F.col("n_docs_kept").cast("double") / F.col("total_docs")).alias(
                "doc_frac"
            ),
            (
                F.col("n_tokens_kept").cast("double") / F.col("total_tokens")
            ).alias("token_frac"),
        )
    )


QUERIES["quality_budget_curve"] = quality_budget_curve


def _quality_budget_oracle_sql() -> str:
    tvals = ", ".join(f"({t!r})" for t in _QB_THRESHOLDS)
    return f"""
    WITH scored AS ({ORACLES["unigram_xent"]}),
    th AS (SELECT CAST(threshold AS DOUBLE) AS threshold
           FROM (VALUES {tvals}) v(threshold)),
    tot AS (SELECT COUNT(*) AS total_docs, SUM(n_tokens) AS total_tokens
            FROM scored)
    SELECT th.threshold,
           CAST(SUM(CASE WHEN s.xent <= th.threshold THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_kept,
           CAST(SUM(CASE WHEN s.xent <= th.threshold THEN s.n_tokens ELSE 0 END)
                AS BIGINT) AS n_tokens_kept,
           CAST(SUM(CASE WHEN s.xent <= th.threshold THEN 1 ELSE 0 END)
                AS DOUBLE) / ANY_VALUE(tot.total_docs) AS doc_frac,
           CAST(SUM(CASE WHEN s.xent <= th.threshold THEN s.n_tokens ELSE 0 END)
                AS DOUBLE) / ANY_VALUE(tot.total_tokens) AS token_frac
    FROM scored s CROSS JOIN th CROSS JOIN tot
    GROUP BY th.threshold
"""


ORACLES["quality_budget_curve"] = _quality_budget_oracle_sql()


# ---------------------------------------------------------------------------
# B70 split distribution drift (KL / Jensen-Shannon over unigram LMs) —
# the token-level drift monitor beside B52's embedding-space one: "has
# the val split (or a new ingest cohort) drifted from the train
# distribution?" is the standard gate before reusing a tokenizer,
# sampling temperature, or filter calibration.  Both LMs are add-one
# estimates over the UNION vocabulary, so every term is finite:
#
#   p_t = (c_val+1)/(n_val+V),  q_t = (c_train+1)/(n_train+V)
#   KL(p||q) = sum_t p_t ln(p_t/q_t),  JS = (KL(p||m)+KL(q||m))/2,
#   m = (p+q)/2
#
# Per-token terms are tiny (O(1/V)), so they round at 8 decimals into
# DECIMAL(24,8) sums (the B33 order-independence discipline, scaled to
# the term magnitude).  Plan: one token explode -> one vocab-keyed
# aggregate carrying both splits' counts -> broadcast totals -> one
# 1-row reduce.  Linear, two shuffles, vocab-bounded intermediate.
# ---------------------------------------------------------------------------
def token_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_train, n_val, v_union, kl_val_train, kl_train_val, js): the
    drift of the val split's unigram distribution off the train
    split's."""
    docs = load_table(spark, sf_dir, "documents")
    sb = _hash_bucket(F.col("doc_id"), "split:", _SPLIT_MOD)
    split = F.when(sb < 32, "train").when(sb < 36, "val").otherwise("test")
    tok = docs.select(split.alias("split"), F.explode(tokens("text")).alias("t"))
    counts = (
        tok.where(F.col("split").isin("train", "val"))
        .groupBy("t")
        .agg(
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("ctr"),
            F.sum(F.when(F.col("split") == "val", 1).otherwise(0)).alias("cva"),
        )
    )
    totals = counts.agg(
        F.sum("ctr").alias("n_tr"),
        F.sum("cva").alias("n_va"),
        F.count(F.lit(1)).alias("v"),
    )
    p = (F.col("cva") + 1).cast("double") / (F.col("n_va") + F.col("v"))
    q = (F.col("ctr") + 1).cast("double") / (F.col("n_tr") + F.col("v"))
    m = (p + q) / 2
    d8 = lambda c: F.sum(F.round(c, 8).cast("decimal(24,8)")).cast("double")  # noqa: E731
    return (
        counts.crossJoin(F.broadcast(totals))
        .agg(
            F.max("n_tr").cast("long").alias("n_train"),
            F.max("n_va").cast("long").alias("n_val"),
            F.max("v").cast("long").alias("v_union"),
            d8(p * F.log(p / q)).alias("kl_val_train"),
            d8(q * F.log(q / p)).alias("kl_train_val"),
            ((d8(p * F.log(p / m)) + d8(q * F.log(q / m))) / 2).alias("js"),
        )
    )


QUERIES["token_kl_drift"] = token_kl_drift

ORACLES["token_kl_drift"] = f"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN {_hash_bucket_sql("doc_id", "split:", _SPLIT_MOD)} < 32
                  THEN 'train'
                  WHEN {_hash_bucket_sql("doc_id", "split:", _SPLIT_MOD)} < 36
                  THEN 'val' ELSE 'test' END AS split,
             string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    tok AS (SELECT split, UNNEST(t) AS t FROM d
            WHERE split IN ('train', 'val')),
    counts AS (
      SELECT t,
             SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS ctr,
             SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS cva
      FROM tok GROUP BY t
    ),
    tot AS (SELECT SUM(ctr) AS n_tr, SUM(cva) AS n_va, COUNT(*) AS v
            FROM counts),
    terms AS (
      SELECT CAST(cva + 1 AS DOUBLE) / (n_va + v) AS p,
             CAST(ctr + 1 AS DOUBLE) / (n_tr + v) AS q,
             (CAST(cva + 1 AS DOUBLE) / (n_va + v)
              + CAST(ctr + 1 AS DOUBLE) / (n_tr + v)) / 2 AS m,
             n_tr, n_va, v
      FROM counts, tot
    )
    SELECT CAST(MAX(n_tr) AS BIGINT) AS n_train,
           CAST(MAX(n_va) AS BIGINT) AS n_val,
           CAST(MAX(v) AS BIGINT) AS v_union,
           CAST(CAST(SUM(CAST(ROUND(p * ln(p / q), 8) AS DECIMAL(24,8)))
                AS VARCHAR) AS DOUBLE) AS kl_val_train,
           CAST(CAST(SUM(CAST(ROUND(q * ln(q / p), 8) AS DECIMAL(24,8)))
                AS VARCHAR) AS DOUBLE) AS kl_train_val,
           (CAST(CAST(SUM(CAST(ROUND(p * ln(p / m), 8) AS DECIMAL(24,8)))
                 AS VARCHAR) AS DOUBLE)
            + CAST(CAST(SUM(CAST(ROUND(q * ln(q / m), 8) AS DECIMAL(24,8)))
                   AS VARCHAR) AS DOUBLE)) / 2 AS js
    FROM terms
"""


# ---------------------------------------------------------------------------
# B75 sequence-packing efficiency curve (Krell et al. 2021 "Efficient
# sequence packing"; the GPT-style concat-and-split alternative).  A
# training pipeline must pick a context length L; the costs are padding
# (short docs wasting sequence tails) and document splitting (long docs
# crossing boundaries).  This measures both, per candidate L, from ONE
# token-count scan: the whole L-grid evaluates map-side (pure integer
# arithmetic per doc) into one 3-row aggregate — the B63/B69-style
# operating curve, applied to the packing knob.
# ---------------------------------------------------------------------------
_PACK_LENGTHS = [128, 512, 2048]


def packing_efficiency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(seq_len, n_docs, total_tokens, n_docs_over, n_sequences,
    pad_tokens, efficiency, packed_sequences): per candidate context
    length, the cost of one-doc-per-sequence packing (each doc split
    into ceil(t/L) sequences, last one padded) vs the concat-and-split
    lower bound ceil(total/L).

    Scale notes: one scan computes token counts; the grid is a 3-row
    broadcast explode; the aggregate is map-combinable integer sums.
    ceil-division is (t + L - 1) DIV L — integer both engines."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.size(tokens("text")).cast("long").alias("t")
    )
    grid = F.explode(
        F.array(*[F.lit(x) for x in _PACK_LENGTHS])
    ).alias("seq_len")
    g = docs.select("t", grid)
    nseq = F.expr(f"(t + seq_len - 1) DIV seq_len")
    per = g.groupBy("seq_len").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("t").alias("total_tokens"),
        F.sum((F.col("t") > F.col("seq_len")).cast("long")).alias("n_docs_over"),
        F.sum(nseq).alias("n_sequences"),
        F.sum(nseq * F.col("seq_len") - F.col("t")).alias("pad_tokens"),
    )
    return per.select(
        F.col("seq_len").cast("long").alias("seq_len"),
        "n_docs",
        "total_tokens",
        "n_docs_over",
        "n_sequences",
        "pad_tokens",
        F.round(
            F.col("total_tokens").cast("double")
            / (F.col("n_sequences") * F.col("seq_len")),
            6,
        ).alias("efficiency"),
        F.expr("(total_tokens + seq_len - 1) DIV seq_len").alias(
            "packed_sequences"
        ),
    )


QUERIES["packing_efficiency_curve"] = packing_efficiency_curve

ORACLES["packing_efficiency_curve"] = f"""
    WITH counts AS (
      SELECT len(string_split_regex(lower(trim(text)), '\\s+')) AS t
      FROM documents
    ),
    g AS (
      SELECT t, seq_len
      FROM counts CROSS JOIN (
        SELECT UNNEST([{", ".join(str(x) for x in _PACK_LENGTHS)}]) AS seq_len
      )
    ),
    per AS (
      SELECT seq_len,
             COUNT(*) AS n_docs,
             SUM(t) AS total_tokens,
             SUM(CASE WHEN t > seq_len THEN 1 ELSE 0 END) AS n_docs_over,
             SUM((t + seq_len - 1) // seq_len) AS n_sequences,
             SUM(((t + seq_len - 1) // seq_len) * seq_len - t) AS pad_tokens
      FROM g GROUP BY seq_len
    )
    SELECT CAST(seq_len AS BIGINT) AS seq_len,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(total_tokens AS BIGINT) AS total_tokens,
           CAST(n_docs_over AS BIGINT) AS n_docs_over,
           CAST(n_sequences AS BIGINT) AS n_sequences,
           CAST(pad_tokens AS BIGINT) AS pad_tokens,
           ROUND(CAST(total_tokens AS DOUBLE) / (n_sequences * seq_len), 6)
             AS efficiency,
           CAST((total_tokens + seq_len - 1) // seq_len AS BIGINT)
             AS packed_sequences
    FROM per
"""


# ---------------------------------------------------------------------------
# B76 Heaps'-law type growth (Heaps 1978) — the companion of B49's
# Zipf fit: V(N) ~ k * N^b measured on the corpus, the estimator
# behind "how big does the type/hash space get at 100 TB" (B61's
# bucket count, B26's OOV rate, dedup shingle-table sizing).  Types
# are word 3-GRAMS (the B2/B3 shingle inventory — also the "novel
# n-gram rate" curation metric; unigram vocabularies saturate long
# before shingle tables do, and the shingle table is what actually
# costs memory at scale).  Growth order is four deterministic md5
# QUARTERS of the corpus (randomized-order growth curves are the
# standard way to remove ingestion-order artifacts), so no global
# rank is needed: V at each prefix is the A76 first-occurrence trick
# applied to types (a type counts at its MINIMUM quarter), and the
# whole curve is one type-keyed aggregate plus a 4-row cumulative
# window.  Quarters whose types were all seen earlier still emit
# their curve point (left join + zero fill), so the relation is
# always exactly 4 rows.
# ---------------------------------------------------------------------------
_HEAPS_QUARTERS = 4


def vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(prefix_quarter, n_grams_cum, types_cum, heaps_b, heaps_k):
    the 4-point shingle-type growth curve and its closed-form log-log
    OLS fit (b = growth exponent, k = scale).

    Scale shape: one token explode feeding two map-combinable
    aggregates (tokens per quarter; MIN quarter per term, then first-
    occurrence counts per quarter); everything after runs on a 4-row
    relation.  Engine stability: curve points are exact BIGINTs; the
    fit sums ln() terms via the round-8 decimal discipline so the
    4-term reductions are order-free in both engines."""
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    tok = docs.select(
        _hash_bucket(F.col("doc_id"), "heaps:", _HEAPS_QUARTERS).alias("q"),
        F.explode(word_shingles("t")).alias("term"),
    )
    tokens_per_q = tok.groupBy("q").agg(F.count(F.lit(1)).alias("nt"))
    first_q = tok.groupBy("term").agg(F.min("q").alias("q"))
    firsts_per_q = first_q.groupBy("q").agg(F.count(F.lit(1)).alias("nv"))
    w_cum = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        tokens_per_q.join(firsts_per_q, "q", "left")
        .withColumn("nv", F.coalesce(F.col("nv"), F.lit(0)))
        .select(
            (F.col("q") + 1).cast("long").alias("prefix_quarter"),
            F.sum("nt").over(w_cum).cast("long").alias("n_grams_cum"),
            F.sum("nv").over(w_cum).cast("long").alias("types_cum"),
        )
    )
    x = F.log(F.col("n_grams_cum").cast("double"))
    y = F.log(F.col("types_cum").cast("double"))
    dec = lambda c: F.round(c, 8).cast("decimal(24,8)")  # noqa: E731
    fit = curve.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(x)).alias("sx"),
        F.sum(dec(y)).alias("sy"),
        F.sum(dec(x * y)).alias("sxy"),
        F.sum(dec(x * x)).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    fitted = fit.select(
        F.round(b, 6).alias("heaps_b"),
        F.round(F.exp((sy - b * sx) / n), 6).alias("heaps_k"),
    )
    return curve.crossJoin(F.broadcast(fitted))


QUERIES["vocab_growth_heaps"] = vocab_growth_heaps

ORACLES["vocab_growth_heaps"] = f"""
    WITH {_TOKS_CTE.strip()},
    tok AS (
      SELECT {_hash_bucket_sql("doc_id", "heaps:", _HEAPS_QUARTERS)} AS q,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS term
      FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)
    ),
    tpq AS (SELECT q, COUNT(*) AS nt FROM tok GROUP BY q),
    fq AS (SELECT term, MIN(q) AS q FROM tok GROUP BY term),
    vpq AS (SELECT q, COUNT(*) AS nv FROM fq GROUP BY q),
    curve AS (
      SELECT CAST(tpq.q + 1 AS BIGINT) AS prefix_quarter,
             CAST(SUM(nt) OVER (ORDER BY tpq.q
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS n_grams_cum,
             CAST(SUM(COALESCE(nv, 0)) OVER (ORDER BY tpq.q
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS types_cum
      FROM tpq LEFT JOIN vpq ON tpq.q = vpq.q
    ),
    fit AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(ROUND(ln(CAST(n_grams_cum AS DOUBLE)), 8)
                 AS DECIMAL(24,8))) AS sx,
             SUM(CAST(ROUND(ln(CAST(types_cum AS DOUBLE)), 8)
                 AS DECIMAL(24,8))) AS sy,
             SUM(CAST(ROUND(ln(CAST(n_grams_cum AS DOUBLE))
                 * ln(CAST(types_cum AS DOUBLE)), 8)
                 AS DECIMAL(24,8))) AS sxy,
             SUM(CAST(ROUND(ln(CAST(n_grams_cum AS DOUBLE))
                 * ln(CAST(n_grams_cum AS DOUBLE)), 8)
                 AS DECIMAL(24,8))) AS sxx
      FROM curve
    ),
    fitted AS (
      SELECT ROUND((CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
                    - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
                      * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                      - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
                        * CAST(CAST(sx AS VARCHAR) AS DOUBLE)), 6) AS heaps_b,
             ROUND(exp((CAST(CAST(sy AS VARCHAR) AS DOUBLE)
                        - ((CAST(n AS DOUBLE)
                            * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
                            - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
                              * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
                           / (CAST(n AS DOUBLE)
                              * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                              - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
                                * CAST(CAST(sx AS VARCHAR) AS DOUBLE)))
                          * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
                       / CAST(n AS DOUBLE)), 6) AS heaps_k
      FROM fit
    )
    SELECT c.prefix_quarter, c.n_grams_cum, c.types_cum,
           f.heaps_b, f.heaps_k
    FROM curve c CROSS JOIN fitted f
"""


# ---------------------------------------------------------------------------
# B77 per-document n-gram novelty vs the corpus prefix (the doc-level
# counterpart of B76's growth curve; the "novel n-gram rate" curation
# signal — RefinedWeb/Gopher-style repetition culling scores documents
# by how much NEW content they add to what is already ingested).  A
# gram is attributed to the smallest doc_id containing it (the A76
# first-occurrence decomposition on the shingle inventory); a doc's
# novelty is the share of its distinct grams it introduced.
# ---------------------------------------------------------------------------
_NOVELTY_REDUNDANT = 0.25  # docs introducing <25% new grams are flagged


def doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_grams, n_novel, novelty, is_redundant) for every doc
    with at least one 3-gram: n_novel = distinct grams whose corpus-wide
    first occurrence (min doc_id) is this doc.

    Scale shape: one distinct-shingle explode, one gram-keyed min
    aggregate, one join back on the SAME gram key (shared exchange),
    one doc-keyed count — all linear, the B2 posting-list discipline
    without the pair join.  Novelty is an exact integer ratio."""
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles("t"))).alias("sh"),
    )
    first = sh.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    scored = sh.join(first, "sh").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(
            (F.col("first_doc") == F.col("doc_id")).cast("long")
        ).alias("n_novel"),
    )
    novelty = F.col("n_novel").cast("double") / F.col("n_grams")
    return scored.select(
        "doc_id",
        "n_grams",
        "n_novel",
        F.round(novelty, 6).alias("novelty"),
        (novelty < F.lit(_NOVELTY_REDUNDANT)).alias("is_redundant"),
    )


QUERIES["doc_novelty"] = doc_novelty

ORACLES["doc_novelty"] = f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
      FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i)
    ),
    first AS (SELECT sh, MIN(doc_id) AS first_doc FROM sh GROUP BY sh),
    scored AS (
      SELECT s.doc_id,
             COUNT(*) AS n_grams,
             SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS n_novel
      FROM sh s JOIN first f ON s.sh = f.sh
      GROUP BY s.doc_id
    )
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           CAST(n_novel AS BIGINT) AS n_novel,
           ROUND(CAST(n_novel AS DOUBLE) / n_grams, 6) AS novelty,
           CAST(n_novel AS DOUBLE) / n_grams < {_NOVELTY_REDUNDANT}
             AS is_redundant
    FROM scored
"""


# ---------------------------------------------------------------------------
# B79 cross-split near-dup leakage report.  B16 catches EXACT n-gram
# contamination; the subtler eval-integrity bug is NEAR-duplicate pairs
# straddling the train/val/test boundary (a paraphrase of a training
# doc in the eval split inflates every metric).  This crosses the
# verified MinHash-LSH pairs (B3) with the B18 split assignment and
# reports, per split pair, how many near-dup edges leak and how many
# eval-side documents are compromised — beside the within-split pair
# counts (evaluation-as-data: leakage is only meaningful against the
# base rate).
# ---------------------------------------------------------------------------
_SPLIT_ORDER = {"train": 0, "val": 1, "test": 2}


def split_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(split_1, split_2, n_pairs, n_docs_leaked): verified near-dup
    pairs per canonically-ordered split pair; n_docs_leaked = distinct
    docs on the LATER split's side (the eval docs to quarantine;
    within-split rows report 0 by definition).

    Scale shape: the B3 pair relation (session-frozen — the
    `b3_verified_pairs` artifact shared with B84/B103; the fresh chain
    stays benched and driver-gated under `dedup_minhash_lsh`) joined
    twice to the map-side split projection on doc_id — pairs are the
    small side, splits are a pure expression; one pair-grain
    aggregate."""
    from near_indexer_for_explorer_spark.operators.dedup import (
        dedup_minhash_lsh,
    )
    from near_indexer_for_explorer_spark.operators.frozen import frozen

    (vp,) = frozen(
        "b3_verified_pairs",
        spark,
        sf_dir,
        lambda: (dedup_minhash_lsh(spark, sf_dir),),
    )
    pairs = vp.select("doc_id_1", "doc_id_2")
    sb = _hash_bucket(F.col("doc_id"), "split:", _SPLIT_MOD)
    split = (
        F.when(sb < 32, "train").when(sb < 36, "val").otherwise("test")
    )
    splits = load_table(spark, sf_dir, "documents").select(
        "doc_id", split.alias("split")
    )
    s1 = splits.select(
        F.col("doc_id").alias("doc_id_1"), F.col("split").alias("sp1")
    )
    s2 = splits.select(
        F.col("doc_id").alias("doc_id_2"), F.col("split").alias("sp2")
    )
    order = F.create_map(
        *[F.lit(x) for kv in _SPLIT_ORDER.items() for x in kv]
    )
    tagged = (
        pairs.join(s1, "doc_id_1")
        .join(s2, "doc_id_2")
        .select(
            F.when(order[F.col("sp1")] <= order[F.col("sp2")], F.col("sp1"))
            .otherwise(F.col("sp2"))
            .alias("split_1"),
            F.when(order[F.col("sp1")] <= order[F.col("sp2")], F.col("sp2"))
            .otherwise(F.col("sp1"))
            .alias("split_2"),
            F.when(
                order[F.col("sp1")] <= order[F.col("sp2")], F.col("doc_id_2")
            )
            .otherwise(F.col("doc_id_1"))
            .alias("later_doc"),
        )
    )
    return tagged.groupBy("split_1", "split_2").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct(
            F.when(F.col("split_1") != F.col("split_2"), F.col("later_doc"))
        ).alias("n_docs_leaked"),
    )


QUERIES["split_leakage_report"] = split_leakage_report


def _split_leakage_oracle_sql() -> str:
    from near_indexer_for_explorer_spark.operators.dedup import (
        ORACLES as _DEDUP_ORACLES,
    )

    split_expr = (
        f"CASE WHEN {_hash_bucket_sql('doc_id', 'split:', _SPLIT_MOD)} < 32"
        " THEN 'train' WHEN"
        f" {_hash_bucket_sql('doc_id', 'split:', _SPLIT_MOD)} < 36"
        " THEN 'val' ELSE 'test' END"
    )
    return f"""
    WITH pairs AS ({_DEDUP_ORACLES['dedup_minhash_lsh']}),
    splits AS (SELECT doc_id, {split_expr} AS split FROM documents),
    ranks AS (SELECT * FROM (VALUES ('train', 0), ('val', 1), ('test', 2))
              v(split, rk)),
    tagged AS (
      SELECT CASE WHEN r1.rk <= r2.rk THEN s1.split ELSE s2.split END
               AS split_1,
             CASE WHEN r1.rk <= r2.rk THEN s2.split ELSE s1.split END
               AS split_2,
             CASE WHEN r1.rk <= r2.rk THEN p.doc_id_2 ELSE p.doc_id_1 END
               AS later_doc
      FROM pairs p
      JOIN splits s1 ON p.doc_id_1 = s1.doc_id
      JOIN splits s2 ON p.doc_id_2 = s2.doc_id
      JOIN ranks r1 ON s1.split = r1.split
      JOIN ranks r2 ON s2.split = r2.split
    )
    SELECT split_1, split_2, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT CASE WHEN split_1 <> split_2
                                    THEN later_doc END) AS BIGINT)
             AS n_docs_leaked
    FROM tagged
    GROUP BY split_1, split_2
    """


ORACLES["split_leakage_report"] = _split_leakage_oracle_sql()


# ---------------------------------------------------------------------------
# B83 windowed skip-gram co-occurrence PMI (oracle-checked).  B27
# scores ADJACENT bigrams; word2vec-style pipelines need the +-2
# window co-occurrence table (the input to SGNS/GloVe training and a
# stronger collocation signal).  Pairs are generated MAP-SIDE as a
# per-row array transform (each position pairs with the next two — no
# self-join, no quadratic blowup), symmetrized via least/greatest,
# and PMI uses the B27 formula over exact counts with round-6 ln.
# Scale shape: one explode of O(2 x tokens) pair slots, one pair-key
# aggregate, broadcast unigram-margin joins, one broadcast total
# scalar.
# ---------------------------------------------------------------------------
def skipgram_cooc_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w1, w2, c_pair, marg_w1, marg_w2, pmi) for symmetrized +-2
    window co-occurrence pairs with count >= _PMI_MIN_COUNT.

    PMI = ln((c_ab/N) / ((marg_a/2N) * (marg_b/2N))) where N is the
    total pair count and marg counts pair slots — all exact integers
    until the single round-6 ln."""
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    pair_arr = F.expr(
        """
        flatten(transform(
          sequence(0, size(t) - 2),
          i -> transform(
            sequence(i + 1, least(i + 2, size(t) - 1)),
            j -> struct(least(t[i], t[j]) AS w1,
                        greatest(t[i], t[j]) AS w2))))
        """
    )
    pairs = (
        docs.where(F.size("t") >= 2)
        .select(F.explode(pair_arr).alias("p"))
        .select("p.w1", "p.w2")
    )
    cp = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_pair"))
    slots = pairs.select(F.col("w1").alias("w")).unionAll(
        pairs.select(F.col("w2").alias("w"))
    )
    marg = slots.groupBy("w").agg(F.count(F.lit(1)).alias("m"))
    n = pairs.agg(F.count(F.lit(1)).alias("n_pairs"))
    a = marg.select(F.col("w").alias("w1"), F.col("m").alias("marg_w1"))
    b = marg.select(F.col("w").alias("w2"), F.col("m").alias("marg_w2"))
    pmi = F.round(
        F.log(
            (F.col("c_pair").cast("double") / F.col("n_pairs"))
            / (
                (F.col("marg_w1").cast("double") / (2 * F.col("n_pairs")))
                * (F.col("marg_w2").cast("double") / (2 * F.col("n_pairs")))
            )
        ),
        6,
    )
    fits = vocab_dims_fit(sf_dir)
    return (
        cp.where(F.col("c_pair") >= _PMI_MIN_COUNT)
        .join(dim_join(a, fits), "w1")
        .join(dim_join(b, fits), "w2")
        .crossJoin(F.broadcast(n))
        .select("w1", "w2", "c_pair", "marg_w1", "marg_w2", pmi.alias("pmi"))
    )


QUERIES["skipgram_cooc_pmi"] = skipgram_cooc_pmi

ORACLES["skipgram_cooc_pmi"] = f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    pairs AS (
      SELECT LEAST(t[i], t[j]) AS w1, GREATEST(t[i], t[j]) AS w2
      FROM toks, UNNEST(range(1, len(t))) r(i), UNNEST([i + 1, i + 2]) s(j)
      WHERE j <= len(t)
    ),
    cp AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_pair
      FROM pairs GROUP BY w1, w2
    ),
    slots AS (
      SELECT w1 AS w FROM pairs UNION ALL SELECT w2 AS w FROM pairs
    ),
    marg AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS m FROM slots GROUP BY w),
    n AS (SELECT COUNT(*) AS n_pairs FROM pairs)
    SELECT c.w1, c.w2, c.c_pair,
           a.m AS marg_w1, b.m AS marg_w2,
           ROUND(ln((CAST(c.c_pair AS DOUBLE) / n.n_pairs)
                    / ((CAST(a.m AS DOUBLE) / (2 * n.n_pairs))
                       * (CAST(b.m AS DOUBLE) / (2 * n.n_pairs)))), 6) AS pmi
    FROM cp c
    JOIN marg a ON c.w1 = a.w
    JOIN marg b ON c.w2 = b.w
    CROSS JOIN n
    WHERE c.c_pair >= {_PMI_MIN_COUNT}
"""


# ---------------------------------------------------------------------------
# B90 shard balance report (oracle-checked).  The ops check on B29's
# packing: per shard, docs and token fill vs the budget; per split,
# the max/mean fill skew.  A skewed shard map means stragglers in
# every downstream training epoch — this is the report that catches
# it before a run is launched.  Scale shape: one aggregate of the
# B29 relation to shard grain (bounded: corpus_tokens/budget rows),
# split-level stats as windows over that grain; all ratios divide
# exact integers.
# ---------------------------------------------------------------------------
def shard_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(split, shard_id, n_docs, shard_tokens, fill_ratio,
    split_max_tokens, split_mean_fill): per-shard fill + per-split
    skew over the B29 packing."""
    packed = corpus_shard_pack(spark, sf_dir)
    shards = packed.groupBy("split", "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
    )
    w = Window.partitionBy("split")
    return shards.select(
        "split",
        "shard_id",
        "n_docs",
        "shard_tokens",
        F.round(
            F.col("shard_tokens").cast("double") / F.lit(_PACK_BUDGET), 6
        ).alias("fill_ratio"),
        F.max("shard_tokens").over(w).alias("split_max_tokens"),
        F.round(
            F.sum("shard_tokens").over(w).cast("double")
            / (F.count(F.lit(1)).over(w) * F.lit(_PACK_BUDGET)),
            6,
        ).alias("split_mean_fill"),
    )


QUERIES["shard_skew_report"] = shard_skew_report


def _shard_skew_oracle_sql() -> str:
    return f"""
    WITH packed AS ({ORACLES["corpus_shard_pack"]}),
    shards AS (
      SELECT split, shard_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
      FROM packed GROUP BY split, shard_id
    )
    SELECT split, shard_id, n_docs, shard_tokens,
           ROUND(CAST(shard_tokens AS DOUBLE) / {_PACK_BUDGET}, 6)
             AS fill_ratio,
           MAX(shard_tokens) OVER (PARTITION BY split) AS split_max_tokens,
           ROUND(CAST(SUM(shard_tokens) OVER (PARTITION BY split) AS DOUBLE)
                 / (COUNT(*) OVER (PARTITION BY split) * {_PACK_BUDGET}), 6)
             AS split_mean_fill
    FROM shards
    """


ORACLES["shard_skew_report"] = _shard_skew_oracle_sql()


# ---------------------------------------------------------------------------
# B100 decontamination n-gram-size operating curve — the knob B16
# fixes at 8 measured across the published range (4 = aggressive,
# 8 = common, 13 = GPT-3's decontamination window): per n, the corpus
# leakage summary over the SAME deterministic train/eval split.
# Shorter grams catch paraphrase-adjacent leakage but inflate false
# positives from common phrases; the curve is the evidence a data
# lead picks n from (the B51/B63/B97/B98/B99 tuning-curve
# discipline).
#
# Scale shape: one leg per grid n (gram tables for different n share
# nothing), each leg the proven B16 shape — distinct per-doc grams,
# DISTINCT train gram set, one sh-keyed equi-join bounded by eval
# posting lists — reduced to a 1-row summary; the union is 3 rows.
# ---------------------------------------------------------------------------
_DECON_CURVE_NS = [4, 8, 13]


def contamination_ngram_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ngram_n, n_eval_docs, n_eval_grams, n_overlap, overlap_rate,
    n_contaminated): corpus-level train->eval n-gram leakage per
    candidate decontamination window size."""
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    split = docs.withColumn(
        "is_train", _hash_bucket(F.col("doc_id"), "decon:", _DECON_MOD) < 8
    )
    out = None
    for n in _DECON_CURVE_NS:
        grams = split.select(
            "doc_id",
            "is_train",
            F.explode(F.array_distinct(word_shingles("t", n))).alias("sh"),
        )
        train_grams = grams.where("is_train").select("sh").distinct()
        eval_grams = grams.where(~F.col("is_train")).select("doc_id", "sh")
        hits = (
            eval_grams.join(train_grams, "sh")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_overlap"))
        )
        eval_docs = split.where(~F.col("is_train")).select(
            "doc_id",
            F.size(F.array_distinct(word_shingles("t", n)))
            .cast("long")
            .alias("n_grams"),
        )
        n_overlap = F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long")
        frac = F.when(F.col("n_grams") == 0, F.lit(0.0)).otherwise(
            n_overlap.cast("double") / F.col("n_grams")
        )
        per_doc = eval_docs.join(hits, "doc_id", "left").select(
            "n_grams",
            n_overlap.alias("n_overlap"),
            F.when(F.col("n_grams") == 0, F.lit(False))
            .otherwise(frac >= _DECON_FRAC)
            .alias("contaminated"),
        )
        summary = per_doc.agg(
            F.count(F.lit(1)).cast("long").alias("n_eval_docs"),
            F.sum("n_grams").cast("long").alias("n_eval_grams"),
            F.sum("n_overlap").cast("long").alias("n_overlap"),
            F.sum(F.when(F.col("contaminated"), 1).otherwise(0))
            .cast("long")
            .alias("n_contaminated"),
        ).select(
            F.lit(n).cast("long").alias("ngram_n"),
            "n_eval_docs",
            "n_eval_grams",
            "n_overlap",
            F.when(F.col("n_eval_grams") == 0, F.lit(0.0))
            .otherwise(
                F.col("n_overlap").cast("double") / F.col("n_eval_grams")
            )
            .alias("overlap_rate"),
            "n_contaminated",
        )
        out = summary if out is None else out.unionByName(summary)
    return out


QUERIES["contamination_ngram_curve"] = contamination_ngram_curve


def _decon_curve_leg_sql(n: int) -> str:
    gram_terms = " || ' ' || ".join(
        f"t[i+{k}]" if k else "t[i]" for k in range(n)
    )
    return f"""
    SELECT * FROM (
      WITH {_TOKS_CTE},
      split AS (
        SELECT doc_id, t,
               {_hash_bucket_sql("doc_id", "decon:", _DECON_MOD)} < 8 AS is_train
        FROM toks
      ),
      grams AS (
        SELECT DISTINCT doc_id, sh FROM (
          {_gram_sql(n).replace("FROM toks", "FROM split")}
        )
      ),
      train_grams AS (
        SELECT DISTINCT g.sh FROM grams g JOIN split s ON g.doc_id = s.doc_id
        WHERE s.is_train
      ),
      eval_docs AS (
        SELECT s.doc_id,
               len(list_distinct(
                 CASE WHEN len(t) >= {n}
                   THEN list_transform(range(1, len(t) - {n - 2}),
                          i -> {gram_terms})
                   ELSE [] END)) AS n_grams
        FROM split s WHERE NOT s.is_train
      ),
      hits AS (
        SELECT g.doc_id, COUNT(*) AS n_overlap
        FROM grams g
        JOIN split s ON g.doc_id = s.doc_id AND NOT s.is_train
        JOIN train_grams tg ON g.sh = tg.sh
        GROUP BY g.doc_id
      ),
      per_doc AS (
        SELECT e.n_grams,
               COALESCE(h.n_overlap, 0) AS n_overlap,
               CASE WHEN e.n_grams = 0 THEN FALSE
                    ELSE CAST(COALESCE(h.n_overlap, 0) AS DOUBLE) / e.n_grams
                         >= {_DECON_FRAC}
               END AS contaminated
        FROM eval_docs e LEFT JOIN hits h ON e.doc_id = h.doc_id
      )
      SELECT CAST({n} AS BIGINT) AS ngram_n,
             CAST(COUNT(*) AS BIGINT) AS n_eval_docs,
             CAST(SUM(n_grams) AS BIGINT) AS n_eval_grams,
             CAST(SUM(n_overlap) AS BIGINT) AS n_overlap,
             CASE WHEN SUM(n_grams) = 0 THEN 0.0
                  ELSE CAST(SUM(n_overlap) AS DOUBLE) / SUM(n_grams)
             END AS overlap_rate,
             CAST(SUM(CASE WHEN contaminated THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated
      FROM per_doc
    )"""


ORACLES["contamination_ngram_curve"] = "\n    UNION ALL".join(
    _decon_curve_leg_sql(n) for n in _DECON_CURVE_NS
)


# ---------------------------------------------------------------------------
# B110 line-level boilerplate removal (the CCNet / RefinedWeb "drop
# lines duplicated across documents" stage — navigation chrome, cookie
# banners, license footers repeat VERBATIM across pages while real
# prose does not).  The corpus here is single-line synthetic text, so
# the "line" unit is a fixed-width non-overlapping token segment
# (_BLP_W tokens); on a real corpus the splitter swaps to newline
# segmentation with the SAME df-threshold machinery.
#
# A segment is boilerplate when it appears in >= _BLP_MIN_DF DISTINCT
# documents (absolute threshold, the CCNet shard discipline — at 100 TB
# this runs per shard, where real boilerplate still repeats and the
# segment-df relation stays shard-bounded).
#
# Scale shape: segments derive from the token array with pure
# higher-order functions (NO explode until the pairs aggregate, no
# Python UDF); one (doc, segment) pre-aggregate (the explode's only
# shuffle), a segment-grain df aggregate that REUSES the same
# partitioning, a map-side-combined segment-df aggregate joined back
# on seg (skew-safe by construction -- see the inline note), and the
# doc-grain rollup.  Output is one row per document.
# ---------------------------------------------------------------------------
_BLP_W = 4  # tokens per segment ("line" stand-in for 1-line synthetic docs)
_BLP_MIN_DF = 3  # distinct-doc threshold for boilerplate


def boilerplate_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_segments, n_boiler_segments, n_tokens,
    n_tokens_kept, keep_ratio): per document, how much survives
    cross-document segment dedup."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # tokenize ONCE in its own projection: repeating split() inside
    # the transform is not CSE'd by codegen and measured 3x slower
    toked = docs.select(
        "doc_id",
        F.expr("split(lower(trim(text)), '\\\\s+')").alias("toks"),
    )
    segs = toked.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, CAST(ceil(size(toks) / {_BLP_W}.0) AS INT) - 1), "
                f"i -> array_join(slice(toks, i * {_BLP_W} + 1, {_BLP_W}), ' '))"
            )
        ).alias("seg"),
    )
    pairs = segs.groupBy("doc_id", "seg").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.sum(F.size(F.split(F.col("seg"), " "))).alias("n_tok"),
    )
    # df as an AGGREGATE + join-back, deliberately NOT a
    # seg-partitioned window: real boilerplate is viral (one segment
    # in millions of docs), and a window puts all df rows of a hot
    # segment in ONE partition with no partial aggregation and no AQE
    # skew handling.  The aggregate map-side-combines df per segment,
    # and the join back on seg is AQE-skew-splittable -- two more
    # exchanges bought as skew immunity.
    df_rel = pairs.groupBy("seg").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        pairs.join(df_rel, "seg")
        .withColumn("boiler", F.col("df") >= _BLP_MIN_DF)
        .groupBy("doc_id")
        .agg(
            F.sum("n_occ").cast("long").alias("n_segments"),
            F.sum(F.when(F.col("boiler"), F.col("n_occ")).otherwise(0))
            .cast("long")
            .alias("n_boiler_segments"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.sum(F.when(~F.col("boiler"), F.col("n_tok")).otherwise(0))
            .cast("long")
            .alias("n_tokens_kept"),
        )
    )
    return per_doc.withColumn(
        "keep_ratio",
        F.round(
            F.col("n_tokens_kept").cast("double") / F.col("n_tokens"), 6
        ),
    )


QUERIES["boilerplate_segments"] = boilerplate_segments

ORACLES["boilerplate_segments"] = f"""
    WITH {_TOKS_CTE},
    segarr AS (
      SELECT doc_id,
             list_transform(range(0, CAST(ceil(len(t) / {_BLP_W}.0) AS INT)),
                            i -> array_to_string(t[i * {_BLP_W} + 1 : i * {_BLP_W} + {_BLP_W}], ' '))
               AS segs
      FROM toks
    ),
    segs AS (SELECT doc_id, UNNEST(segs) AS seg FROM segarr),
    pairs AS (
      SELECT doc_id, seg, COUNT(*) AS n_occ,
             SUM(len(string_split(seg, ' '))) AS n_tok
      FROM segs GROUP BY doc_id, seg
    ),
    dfrel AS (SELECT seg, COUNT(*) AS df FROM pairs GROUP BY seg)
    SELECT p.doc_id,
           CAST(SUM(p.n_occ) AS BIGINT) AS n_segments,
           CAST(SUM(CASE WHEN d.df >= {_BLP_MIN_DF} THEN p.n_occ ELSE 0 END)
                AS BIGINT) AS n_boiler_segments,
           CAST(SUM(p.n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN d.df < {_BLP_MIN_DF} THEN p.n_tok ELSE 0 END)
                AS BIGINT) AS n_tokens_kept,
           ROUND(CAST(SUM(CASE WHEN d.df < {_BLP_MIN_DF} THEN p.n_tok ELSE 0 END)
                      AS DOUBLE)
                 / SUM(p.n_tok), 6) AS keep_ratio
    FROM pairs p JOIN dfrel d ON p.seg = d.seg
    GROUP BY p.doc_id
"""


# ---------------------------------------------------------------------------
# B117 mixture epoch plan — the artifact a data-mix recipe actually
# ships: given the B41 temperature-reweighted sampling distribution
# and each source's REAL token supply, how many epochs does every
# source repeat at a given training-token budget?  (The central table
# of data-mixing analyses: up-weighted tail sources repeat; >1 epoch
# is the memorization/diversity trade the recipe owner signs off on.)
# Budgets are a grid of multiples of the corpus's own token count, so
# the plan is scale-free and self-calibrating.
#
# Scale shape: composes B41 (source grain) with the per-source token
# supply (ONE map-combined aggregate); the grid explodes map-side from
# the bounded source grain.  allocated = floor(p * (m * total)) with
# identical parenthesization in both engines; epochs is one
# long/long division, round-6.
# ---------------------------------------------------------------------------
_EPOCH_BUDGET_MULTIPLES = [0.5, 1.0, 2.0, 4.0]


def mixture_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(budget_x, source, source_tokens, p_sampled, budget_tokens,
    allocated_tokens, epochs, repeated): per training-token budget
    (as a multiple of the corpus token count) and source, the token
    allocation under the B41 sampling distribution and the implied
    epoch count over that source's supply."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.size(tokens("text")).cast("long").alias("ws")
    ).groupBy("source").agg(F.sum("ws").cast("long").alias("source_tokens"))
    total = tok.agg(F.sum("source_tokens").cast("long").alias("total_ws"))
    w = corpus_temperature_weights(spark, sf_dir).select(
        "source", "p_sampled"
    )
    grid = F.explode(
        F.array(*[F.lit(m) for m in _EPOCH_BUDGET_MULTIPLES])
    ).alias("budget_x")
    base = (
        tok.join(w, "source")
        .crossJoin(F.broadcast(total))
        .select("source", "source_tokens", "p_sampled", "total_ws", grid)
    )
    budget = (F.col("budget_x") * F.col("total_ws")).alias("budget_tokens")
    alloc = F.floor(F.col("p_sampled") * (F.col("budget_x") * F.col("total_ws")))
    return base.select(
        "budget_x",
        "source",
        "source_tokens",
        "p_sampled",
        F.floor(budget).cast("long").alias("budget_tokens"),
        alloc.cast("long").alias("allocated_tokens"),
        F.round(
            alloc.cast("double") / F.col("source_tokens"), 6
        ).alias("epochs"),
        (alloc > F.col("source_tokens")).alias("repeated"),
    )


QUERIES["mixture_epoch_plan"] = mixture_epoch_plan

ORACLES["mixture_epoch_plan"] = f"""
    WITH b41 AS ({ORACLES["corpus_temperature_weights"]}),
    tok AS (
      SELECT source,
             CAST(SUM(len(string_split_regex(lower(trim(text)), '\\s+')))
               AS BIGINT) AS source_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(source_tokens) AS BIGINT) AS total_ws FROM tok),
    grid AS (SELECT CAST(budget_x AS DOUBLE) AS budget_x
             FROM (VALUES (0.5), (1.0), (2.0), (4.0)) g(budget_x))
    SELECT g.budget_x, t.source, t.source_tokens, b.p_sampled,
           CAST(FLOOR(g.budget_x * tot.total_ws) AS BIGINT) AS budget_tokens,
           CAST(FLOOR(b.p_sampled * (g.budget_x * tot.total_ws)) AS BIGINT)
             AS allocated_tokens,
           ROUND(CAST(FLOOR(b.p_sampled * (g.budget_x * tot.total_ws))
                      AS DOUBLE) / t.source_tokens, 6) AS epochs,
           FLOOR(b.p_sampled * (g.budget_x * tot.total_ws))
             > t.source_tokens AS repeated
    FROM tok t JOIN b41 b ON t.source = b.source
    CROSS JOIN tot CROSS JOIN grid g
"""


# ---------------------------------------------------------------------------
# B142 stratified corpus sampling — the review-set / eval-set builder:
# "give me N documents with controlled per-source representation".
# Proportional allocation preserves the corpus mix (QA sampling);
# equal allocation force-covers the tail sources a proportional draw
# starves (the audit default).  Both allocations are computed in ONE
# pass and both are EXACT deterministic functions of the corpus: the
# per-source rank orders by a salted md5 of the doc id (the B18
# hash-split discipline — no RNG state, replayable anywhere), and the
# per-source takes use integer floor division only.  Scale shape: one
# count aggregate (a few-row broadcast dim) + one per-source window —
# the window key is `source`, the natural partition of a corpus lake,
# so the sort is partition-local at any size.
# ---------------------------------------------------------------------------
_STRAT_BUDGET = 200  # total sample budget N (shared by both policies)


def stratified_skey(doc_id_col: F.Column) -> F.Column:
    """The deterministic per-doc sampling key (B18 hash-split
    discipline — no RNG state, replayable anywhere)."""
    return F.md5(F.concat(F.lit("strat:"), doc_id_col.cast("string")))


def stratified_allocations(counts: DataFrame) -> DataFrame:
    """(source, n_source) -> (source, n_source, n_prop, n_equal):
    integer floor division on BOTH sides (Spark `div` == DuckDB `//`;
    a plain `/` would round-trip through double)."""
    totals = counts.agg(
        F.sum("n_source").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_source",
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"({_STRAT_BUDGET} * n_source) div total"),
        ).alias("n_prop"),
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"{_STRAT_BUDGET} div n_sources"),
        ).alias("n_equal"),
    )


def stratified_cut(ranked: DataFrame, alloc: DataFrame) -> DataFrame:
    """(doc_id, source, stratum_rank) x allocations -> the sample
    rows with both policy flags — the ONE kernel the batch query and
    the C45 streaming read path share."""
    return (
        ranked.join(F.broadcast(alloc), "source")
        .where(
            F.col("stratum_rank")
            <= F.greatest(F.col("n_prop"), F.col("n_equal"))
        )
        .select(
            "doc_id",
            "source",
            "n_source",
            "stratum_rank",
            (F.col("stratum_rank") <= F.col("n_prop")).alias("in_proportional"),
            (F.col("stratum_rank") <= F.col("n_equal")).alias("in_equal"),
        )
    )


def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, n_source, stratum_rank, in_proportional,
    in_equal): the first-ranked docs of each source under both
    allocation policies (rows appearing in at least one sample)."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_source")
    )
    w = W.partitionBy("source").orderBy(
        stratified_skey(F.col("doc_id")).asc(), F.col("doc_id").asc()
    )
    ranked = docs.withColumn("stratum_rank", F.row_number().over(w).cast("long"))
    return stratified_cut(ranked, stratified_allocations(counts))


QUERIES["corpus_stratified_sample"] = corpus_stratified_sample

ORACLES["corpus_stratified_sample"] = f"""
    WITH d AS (SELECT doc_id, source FROM documents),
    counts AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_source FROM d GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(n_source) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS n_sources FROM counts),
    alloc AS (
      SELECT source, n_source,
             greatest(1, ({_STRAT_BUDGET} * n_source) // total) AS n_prop,
             greatest(1, {_STRAT_BUDGET} // n_sources) AS n_equal
      FROM counts CROSS JOIN tot
    ),
    ranked AS (
      SELECT doc_id, source,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY md5('strat:' || CAST(doc_id AS VARCHAR)) ASC,
                        doc_id ASC) AS BIGINT) AS stratum_rank
      FROM d
    )
    SELECT r.doc_id, r.source, a.n_source, r.stratum_rank,
           r.stratum_rank <= a.n_prop AS in_proportional,
           r.stratum_rank <= a.n_equal AS in_equal
    FROM ranked r JOIN alloc a ON r.source = a.source
    WHERE r.stratum_rank <= greatest(a.n_prop, a.n_equal)
"""
