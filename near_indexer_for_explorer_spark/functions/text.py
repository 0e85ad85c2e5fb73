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


def word_shingles(tok: Column, n: int = 3) -> Column:
    """Array of word n-grams; empty array when fewer than n tokens.

    Built with transform-over-sequence so it stays inside codegen — the
    reference's analog is byte-level arg parsing, but shingling is the
    LLM-dedup workhorse (MinHash/Jaccard input).
    """
    idx = F.sequence(F.lit(1), F.size(tok) - (n - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(tok, i + k) for k in range(n)]
    )
    return F.when(F.size(tok) >= n, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


def stopword_hits(tok: Column, words: list[str]) -> Column:
    """Count of tokens found in a fixed word list (order of the list is
    irrelevant; counts are exact integers)."""
    return F.size(F.filter(tok, lambda x: x.isin(*words)))
