"""Lexicon sentiment scoring — pure column expressions.

Semantics reproduced from analyzer.py:180-209: count whitespace tokens
of lower(text) hitting 6-word positive / negative lexicons; label =
argmax, score = max/total, neutral+0.0 on tie or no hits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pdf_knowledge_extractor_spark.lexicons import NEGATIVE_WORDS, POSITIVE_WORDS


def hit_count_words(words_lower: Column, lexicon: tuple[str, ...]) -> Column:
    """Count of array elements present in the lexicon (words already
    lowered; precompute the array once when performance matters)."""
    lex = F.array(*[F.lit(w) for w in lexicon])
    return F.size(F.filter(words_lower, lambda w: F.array_contains(lex, w)))


def _hit_count(text: Column, lexicon: tuple[str, ...]) -> Column:
    return hit_count_words(F.split(F.lower(F.trim(text)), r"\s+"), lexicon)


def sentiment_struct(text: Column) -> Column:
    """struct<sentiment:string, score:double, positive_indicators:int,
    negative_indicators:int>."""
    pos = _hit_count(text, POSITIVE_WORDS)
    neg = _hit_count(text, NEGATIVE_WORDS)
    total = pos + neg
    label = (
        F.when(total == 0, "neutral")
        .when(pos > neg, "positive")
        .when(neg > pos, "negative")
        .otherwise("neutral")
    )
    score = (
        F.when(total == 0, F.lit(0.0))
        .when(pos > neg, pos / total)
        .when(neg > pos, neg / total)
        .otherwise(F.lit(0.0))
    )
    return F.struct(
        label.alias("sentiment"),
        score.cast("double").alias("score"),
        pos.alias("positive_indicators"),
        neg.alias("negative_indicators"),
    )
