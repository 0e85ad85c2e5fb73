"""Text-analysis column expressions (pure built-in functions — JVM-side,
whole-stage-codegen friendly; no Python UDFs anywhere on this path).

Word lists and regexes are mirrored verbatim in the DuckDB oracles, so
every derived metric is engine-independent (integer counts and exact
double divisions).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"
# BPE-ish lexer: alpha runs, digit runs, single non-alnum glyphs — the
# same class of segmentation a byte-pair pretokenizer applies.
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS_EN = ["the", "a", "of", "to", "and", "is", "in", "that", "it", "on"]
STOPWORDS_DE = ["der", "die", "das", "und", "ist", "ein", "nicht", "mit", "sich", "auf"]
STOPWORDS_FR = ["le", "la", "et", "les", "des", "une", "est", "dans", "pour", "que"]
STOPWORDS_ES = ["el", "los", "de", "y", "en", "un", "una", "por", "con", "para"]


def tokens(text: Column | str = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), TOKEN_SPLIT_RE)


def word_shingles_sql(tok: str, n: int = 3) -> str:
    """Array of word n-grams as SQL text; empty array when fewer than n
    tokens.  `tok` is a SQL fragment (usually a column name).

    Built with transform-over-sequence so it stays inside codegen — the
    reference's analog is byte-level arg parsing, but shingling is the
    LLM-dedup workhorse (MinHash/Jaccard input).  SQL text rather than
    a Python-lambda transform: the lambda costs ~56-70 ms of py4j
    round-trips per call at plan-construction time (r15, guide
    section 5); the parsed text is the identical expression.
    """
    gram = ", ".join(f"element_at({tok}, i + {k})" for k in range(n))
    return (
        f"CASE WHEN size({tok}) >= {n} THEN "
        f"transform(sequence(1, size({tok}) - {n - 1}), "
        f"i -> concat_ws(' ', {gram})) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )


def word_shingles(tok: str, n: int = 3) -> Column:
    return F.expr(word_shingles_sql(tok, n))


def stopword_hits(tok: str, words: list[str]) -> Column:
    """Count of tokens found in a fixed word list (order of the list is
    irrelevant; counts are exact integers)."""
    lst = ", ".join("'" + w + "'" for w in words)
    return F.expr(f"size(filter({tok}, x -> x IN ({lst})))")
