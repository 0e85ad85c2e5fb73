"""Distributed BPE merge training (byte-pair-encoding tokenizer prep).

The canonical tokenizer-training loop (Sennrich et al. 2016) over the
corpus word-frequency table: count adjacent symbol pairs weighted by
word frequency, merge the most frequent pair, re-segment, repeat.
`token_bigram_pmi` (operators/corpus.py) scores candidate merges; this
operator RUNS the training loop itself.

Scale shape (the same one production BPE trainers use): pair
statistics are computed over the DISTINCT-word frequency table, never
the raw token stream — one tokens shuffle builds (word, freq), and
each round is then (a) a pair aggregation over words (map-side
combined, linear in distinct words), (b) a 1-row argmax broadcast,
(c) a map-side re-segmentation.  Rounds are data-dependent
(iterative), so they are UNROLLED a fixed _BPE_ROUNDS deep — the
exact discipline ann_ivf_topk uses for Lloyd iterations — which makes
the whole loop one declarative plan AND lets a DuckDB oracle replicate
it bit-for-bit.

The re-segmentation trick that keeps apply-merge SQL-expressible in
BOTH engines: symbols stay single characters.  Round k's winning pair
(a, b) is applied as `replace(encoded, a || b, sentinel_k)` — both
Spark's and DuckDB's `replace` substitute non-overlapping occurrences
greedily left-to-right, which IS BPE's merge order — and sentinel_k
is an unused control character (chr(1..)) standing for the merged
symbol.  Decoding nests the sentinel expansions back out, so outputs
show real strings.  Reference analog: args/method-name token
dictionaries in database/src/adapters/transactions.rs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from near_indexer_for_explorer_spark.functions.text import tokens
from near_indexer_for_explorer_spark.sources.tables import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

_BPE_ROUNDS = 3
_TOP_PAIRS = 5  # emitted per round (rank 1 is the applied merge)
_SENTINELS = [chr(1 + k) for k in range(_BPE_ROUNDS)]


def _word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    wf = (
        docs.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    # every unrolled round re-derives its pair stats AND its
    # re-encoded word table from this relation; checkpointing the
    # (distinct word, freq) table — tiny by construction — evaluates
    # the corpus scan/tokenize ONCE instead of ~2x per round.  At
    # sf0.1 this is timing-neutral (the small corpus scan is not the
    # bottleneck; per-round pair stats are), but at real corpus sizes
    # the scan dominates and the checkpoint removes 2*rounds-1 passes
    # over it.
    return wf.localCheckpoint(eager=True)


def _pair_stats(words: DataFrame, enc_col: str) -> DataFrame:
    """Adjacent single-char pair counts over the encoded word column,
    weighted by word frequency."""
    pos = F.explode(F.sequence(F.lit(1), F.length(enc_col) - 1)).alias("i")
    pairs = words.where(F.length(enc_col) >= 2).select(
        F.col("freq"), F.col(enc_col).alias("enc"), pos
    )
    return (
        pairs.select(
            F.substring(F.col("enc"), F.col("i").cast("int"), 1).alias("l"),
            F.expr("substring(enc, CAST(i + 1 AS INT), 1)").alias("r"),
            "freq",
        )
        .groupBy("l", "r")
        .agg(F.sum("freq").alias("weight"))
    )


def _merge_rounds(
    words: DataFrame,
) -> list[tuple[DataFrame, DataFrame, DataFrame]]:
    """The shared training loop: per round, (stage, stats, best) where
    stage = (w, freq, enc) entering the round, stats = weighted pair
    counts, best = the applied rank-1 merge as a 1-row frame with
    columns bl{k}/br{k}.  Both the trainer (B39) and the corpus
    encoder (B45) consume THIS chain, so the applied merges cannot
    drift between them."""
    rounds = []
    enc = F.col("w")
    for k in range(_BPE_ROUNDS):
        stage = words.select("w", "freq", enc.alias("enc"))
        stats = _pair_stats(stage, "enc")
        w_rank = Window.orderBy(F.desc("weight"), F.asc("l"), F.asc("r"))
        best = (
            stats.select("l", "r", F.row_number().over(w_rank).alias("rk"))
            .where(F.col("rk") == 1)
            .select(F.col("l").alias(f"bl{k}"), F.col("r").alias(f"br{k}"))
        )
        rounds.append((stage, stats, best))
        words = stage.crossJoin(F.broadcast(best))
        enc = F.replace(
            F.col("enc"),
            F.concat(F.col(f"bl{k}"), F.col(f"br{k}")),
            F.lit(_SENTINELS[k]),
        )
    return rounds


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(round, rank, left_sym, right_sym, merged, weight): the top-5
    weighted symbol pairs per training round, symbols decoded to real
    strings; rank 1 per round is the merge that round applied."""
    words = _word_freq(spark, sf_dir)

    outs = []
    # decode expressions for sentinel chars learned in earlier rounds
    decode_steps: list[tuple[str, F.Column]] = []

    def decoded(col: F.Column) -> F.Column:
        for sent, expansion in decode_steps:
            col = F.replace(col, F.lit(sent), expansion)
        return col

    bests: list[DataFrame] = []
    for stage, stats, best in _merge_rounds(words):
        k = len(bests)
        w_rank = Window.orderBy(F.desc("weight"), F.asc("l"), F.asc("r"))
        ranked = stats.select(
            "l", "r", "weight", F.row_number().over(w_rank).alias("rank")
        ).where(F.col("rank") <= _TOP_PAIRS)
        # the decode expansions reference the bl{j}/br{j} columns of
        # every PRIOR round's 1-row best-pair frame; crossJoin them in
        # (broadcast, 1 row each) so the expressions resolve here too
        for b in bests:
            ranked = ranked.crossJoin(F.broadcast(b))
        top = ranked.select(
            F.lit(k + 1).cast("long").alias("round"),
            F.col("rank").cast("long").alias("rank"),
            decoded(F.col("l")).alias("left_sym"),
            decoded(F.col("r")).alias("right_sym"),
            F.concat(decoded(F.col("l")), decoded(F.col("r"))).alias(
                "merged"
            ),
            F.col("weight").cast("long").alias("weight"),
        )
        outs.append(top)
        bests.append(best)
        sent = _SENTINELS[k]
        bl, br = F.col(f"bl{k}"), F.col(f"br{k}")
        # freeze current decode of the new sentinel: decoded(l)+decoded(r)
        decode_steps = decode_steps + [
            (sent, F.concat(*(
                [bl, br]
                if not decode_steps
                else [_apply_steps(bl, decode_steps), _apply_steps(br, decode_steps)]
            )))
        ]

    out = outs[0]
    for t in outs[1:]:
        out = out.unionByName(t)
    return out


def _apply_steps(col: F.Column, steps) -> F.Column:
    for sent, expansion in steps:
        col = F.replace(col, F.lit(sent), expansion)
    return col


QUERIES["bpe_train_merges"] = bpe_train_merges


def _pair_cte_sql(src: str, name: str) -> str:
    return f"""
    {name} AS (
      SELECT substring(enc, CAST(i AS INTEGER), 1) AS l,
             substring(enc, CAST(i + 1 AS INTEGER), 1) AS r,
             SUM(freq) AS weight
      FROM {src}, UNNEST(range(1, length(enc))) AS t(i)
      WHERE length(enc) >= 2
      GROUP BY 1, 2
    ),
    {name}_rk AS (
      SELECT l, r, weight,
             ROW_NUMBER() OVER (ORDER BY weight DESC, l, r) AS rank
      FROM {name}
    )"""


def _chain_ctes() -> tuple[list[str], list[tuple[str, str]]]:
    """The words0..words{R-1} + per-round ranked-pair CTEs shared by
    BOTH bpe oracles, and the (best_l, best_r) scalar subqueries per
    round.  One generator -> the two oracle texts cannot drift."""
    ctes = [
        r"""toks AS (
      SELECT string_split_regex(lower(trim(text)), '\s+') AS t FROM documents
    ),
    words0 AS (
      SELECT w AS enc, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT UNNEST(t) AS w FROM toks) GROUP BY w
    )"""
    ]
    bests = []
    for k in range(_BPE_ROUNDS):
        name = f"p{k}"
        ctes.append(_pair_cte_sql(f"words{k}", name))
        best_l = f"(SELECT l FROM {name}_rk WHERE rank = 1)"
        best_r = f"(SELECT r FROM {name}_rk WHERE rank = 1)"
        bests.append((best_l, best_r))
        if k + 1 < _BPE_ROUNDS:
            ctes.append(
                f"""
    words{k + 1} AS (
      SELECT replace(enc, {best_l} || {best_r}, chr({1 + k})) AS enc, freq
      FROM words{k}
    )"""
            )
    return ctes, bests


def _bpe_oracle_sql() -> str:
    """Unrolled 3-round replica.  Per round: pair stats from the
    encoded word table, rank by (weight DESC, l, r), re-encode with
    replace(enc, l || r, sentinel)."""
    ctes, bests = _chain_ctes()
    selects = []
    decode = {}

    for k in range(_BPE_ROUNDS):
        def dec(expr: str) -> str:
            for s_k in range(k):
                expansion = decode[s_k]
                expr = f"replace({expr}, chr({1 + s_k}), {expansion})"
            return expr

        best_l, best_r = bests[k]
        decode[k] = f"({dec(best_l)} || {dec(best_r)})"
        selects.append(
            f"""
    SELECT CAST({k + 1} AS BIGINT) AS round,
           CAST(rank AS BIGINT) AS rank,
           {dec("l")} AS left_sym,
           {dec("r")} AS right_sym,
           {dec("l")} || {dec("r")} AS merged,
           CAST(weight AS BIGINT) AS weight
    FROM p{k}_rk WHERE rank <= {_TOP_PAIRS}"""
        )

    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


ORACLES["bpe_train_merges"] = _bpe_oracle_sql()


# ---------------------------------------------------------------------------
# B45 corpus encoding under the learned merges: the APPLY side of B39.
# A tokenizer is only useful once it encodes the corpus, and the two
# numbers a data pipeline actually monitors are fertility (symbols per
# word) and the compression ratio (symbols per character) — both per
# document, so quality filters can drop pathological docs (e.g.
# binary-ish text that refuses to compress).
#
# Scale shape: the merges are applied to the DISTINCT-word dictionary
# (linear in distinct words, 3 chained replace() calls in codegen),
# then one (token -> dictionary) equi-join prices every occurrence —
# the token stream is never re-segmented row by row.  The merge chain
# comes from the SAME _merge_rounds / _chain_ctes generators the
# trainer uses, so trainer and encoder cannot drift.
# ---------------------------------------------------------------------------
def _bpe_encode_oracle_sql() -> str:
    ctes, bests = _chain_ctes()
    dict_ctes = ["""
    dict0 AS (SELECT enc AS w, enc FROM words0)"""]
    for k in range(_BPE_ROUNDS):
        best_l, best_r = bests[k]
        dict_ctes.append(
            f"""
    dict{k + 1} AS (
      SELECT w, replace(enc, {best_l} || {best_r}, chr({1 + k})) AS enc
      FROM dict{k}
    )"""
        )
    return (
        "WITH "
        + ",".join(ctes + dict_ctes)
        + f""",
    dtoks AS (
      SELECT doc_id, UNNEST(t) AS w
      FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
            FROM documents)
    )
    SELECT dt.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(length(dt.w)) AS BIGINT) AS n_chars,
           CAST(SUM(length(d.enc)) AS BIGINT) AS n_symbols,
           CAST(SUM(length(d.enc)) AS DOUBLE) / COUNT(*) AS fertility,
           CAST(SUM(length(d.enc)) AS DOUBLE)
             / NULLIF(SUM(length(dt.w)), 0) AS compression_ratio
    FROM dtoks dt JOIN dict{_BPE_ROUNDS} d ON d.w = dt.w
    GROUP BY dt.doc_id
    """
    )


ORACLES["bpe_encode_corpus"] = _bpe_encode_oracle_sql()


def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_words, n_chars, n_symbols, fertility,
    compression_ratio): every document priced under the 3 trained
    merges via the distinct-word dictionary."""
    words = _word_freq(spark, sf_dir)
    rounds = _merge_rounds(words)
    dict_df = words.select("w", F.col("w").alias("enc"))
    for k, (_stage, _stats, best) in enumerate(rounds):
        dict_df = dict_df.crossJoin(F.broadcast(best)).select(
            "w",
            F.replace(
                F.col("enc"),
                F.concat(F.col(f"bl{k}"), F.col(f"br{k}")),
                F.lit(_SENTINELS[k]),
            ).alias("enc"),
        )
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    dtoks = docs.select("doc_id", F.explode("t").alias("w"))
    n_sym = F.sum(F.length("enc"))
    n_chr = F.sum(F.length("w"))
    return (
        dtoks.join(dict_df, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            n_chr.cast("long").alias("n_chars"),
            n_sym.cast("long").alias("n_symbols"),
            (n_sym.cast("double") / F.count(F.lit(1))).alias("fertility"),
            (
                n_sym.cast("double") / F.nullif(n_chr, F.lit(0))
            ).alias("compression_ratio"),
        )
    )


QUERIES["bpe_encode_corpus"] = bpe_encode_corpus


# ---------------------------------------------------------------------------
# B98 merge-depth operating curve — the BPE family's tuning-curve row
# (B51/B63/B65/B69/B71/B97 discipline): corpus fertility and
# compression at EVERY merge depth 0.._BPE_ROUNDS, not just the final
# one.  Real tokenizer pipelines pick vocabulary size (= merge count)
# from exactly this curve; depth 0 is the character baseline
# (fertility = chars/word), each row shows what the next merge buys.
#
# Scale shape: the dictionary carries all depths as COLUMNS (enc0..
# encR built by the same cumulative replace chain the trainer applies
# — shared _merge_rounds, no drift possible), so the token stream is
# priced by ONE dictionary equi-join and one aggregate; the depth
# grid then explodes map-side from a 1-row frame.
# ---------------------------------------------------------------------------
def bpe_merge_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_merges, n_words, n_chars, n_symbols, fertility,
    compression_ratio): corpus-level encoding cost after each merge
    depth 0..3 under the shared trained chain."""
    words = _word_freq(spark, sf_dir)
    rounds = _merge_rounds(words)
    dict_df = words.select("w", F.col("w").alias("enc0"))
    for k, (_stage, _stats, best) in enumerate(rounds):
        keep = ["w"] + [f"enc{i}" for i in range(k + 1)]
        dict_df = dict_df.crossJoin(F.broadcast(best)).select(
            *keep,
            F.replace(
                F.col(f"enc{k}"),
                F.concat(F.col(f"bl{k}"), F.col(f"br{k}")),
                F.lit(_SENTINELS[k]),
            ).alias(f"enc{k + 1}"),
        )
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens("text"))
    dtoks = docs.select(F.explode("t").alias("w"))
    base = dtoks.join(dict_df, "w").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.length("w")).cast("long").alias("n_chars"),
        *[
            F.sum(F.length(f"enc{k}")).cast("long").alias(f"sym{k}")
            for k in range(_BPE_ROUNDS + 1)
        ],
    )
    ex = base.select(
        "n_words",
        "n_chars",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("long").alias("n_merges"),
                        F.col(f"sym{k}").alias("n_symbols"),
                    )
                    for k in range(_BPE_ROUNDS + 1)
                ]
            )
        ).alias("row"),
    )
    return ex.select(
        F.col("row.n_merges").alias("n_merges"),
        "n_words",
        "n_chars",
        F.col("row.n_symbols").alias("n_symbols"),
        (F.col("row.n_symbols").cast("double") / F.col("n_words")).alias(
            "fertility"
        ),
        (
            F.col("row.n_symbols").cast("double")
            / F.nullif(F.col("n_chars"), F.lit(0))
        ).alias("compression_ratio"),
    )


QUERIES["bpe_merge_curve"] = bpe_merge_curve


def _bpe_curve_oracle_sql() -> str:
    ctes, bests = _chain_ctes()
    dict_ctes = ["""
    dict0 AS (SELECT enc AS w, enc FROM words0)"""]
    for k in range(_BPE_ROUNDS):
        best_l, best_r = bests[k]
        dict_ctes.append(
            f"""
    dict{k + 1} AS (
      SELECT w, replace(enc, {best_l} || {best_r}, chr({1 + k})) AS enc
      FROM dict{k}
    )"""
        )
    dict_joins = " ".join(
        f"JOIN dict{k} d{k} ON d{k}.w = dt.w" for k in range(_BPE_ROUNDS + 1)
    )
    sym_cols = ",\n             ".join(
        f"CAST(SUM(length(d{k}.enc)) AS BIGINT) AS sym{k}"
        for k in range(_BPE_ROUNDS + 1)
    )
    depth_rows = "\n      UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS n_merges, n_words, n_chars,"
        f" sym{k} AS n_symbols FROM base"
        for k in range(_BPE_ROUNDS + 1)
    )
    return (
        "WITH "
        + ",".join(ctes + dict_ctes)
        + f""",
    dtoks AS (SELECT UNNEST(t) AS w FROM toks),
    base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM(length(dt.w)) AS BIGINT) AS n_chars,
             {sym_cols}
      FROM dtoks dt {dict_joins}
    ),
    grid AS (
      {depth_rows}
    )
    SELECT n_merges, n_words, n_chars, n_symbols,
           CAST(n_symbols AS DOUBLE) / n_words AS fertility,
           CAST(n_symbols AS DOUBLE) / NULLIF(n_chars, 0)
             AS compression_ratio
    FROM grid
    """
    )


ORACLES["bpe_merge_curve"] = _bpe_curve_oracle_sql()
