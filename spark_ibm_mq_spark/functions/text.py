"""Text-analysis column expressions (north-star EXT operators, SURVEY.md §2.2).

All built-ins — split/filter/size/regexp — so the hot path stays JVM-side.
Regex patterns are chosen to mean the same thing in Java regex (Spark) and
RE2 (DuckDB) so every operator built on these is oracle-checkable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# tiny function-word list: enough signal for quality ratios and the lang-id
# heuristic, small enough to inline as a literal array in both engines
STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"]

# BPE-ish lexer: word pieces | numbers | any single non-space symbol.
# Identical semantics in Java regex and RE2.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of trimmed text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), "\\s+")


def bpe_ish_tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)


def stopword_count(toks: Column) -> Column:
    stop = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    return F.size(F.filter(toks, lambda t: F.array_contains(stop, F.lower(t))))


def quality_score(text: Column | str) -> Column:
    """Heuristic doc-quality score in [0,1]: favors moderate length, real
    word lengths, and natural stopword density (the classic cheap pre-filter
    in LLM data pipelines)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    n = F.size(toks)
    avg_word = F.length(c) / F.greatest(n, F.lit(1))
    stop_ratio = stopword_count(toks) / F.greatest(n, F.lit(1))
    length_ok = F.when((n >= 10) & (n <= 5000), F.lit(1.0)).otherwise(F.lit(0.0))
    word_ok = F.when((avg_word >= 3) & (avg_word <= 12), F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ok = F.when(stop_ratio.between(0.01, 0.6), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round((length_ok + word_ok + stop_ok) / 3.0, 4)
